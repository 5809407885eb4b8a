#!/usr/bin/env python
"""OPQ trainer (Ge et al. 2013, 'Optimized Product Quantization',
non-parametric alternating minimization) — regeneration recipe for
pca_oracle_literals.PINNED_OPQ_ROTATION / PINNED_OPQ_CODEBOOKS.

Run: python tools/train_opq.py  (prints the literal block to paste).

Deterministic by construction: R0 = QR of a seed-0 gaussian (sign-fixed
so the factorization is unique), k-means init = first k rotated rows in
vec_id order (mirroring operators/pq.pq_train), Lloyd updates keep the
previous centroid for empty cells. The printed quantization errors
(plain PQ with PINNED_PQ_CODEBOOKS vs OPQ) back the
error-improves property test in tests/test_opq.py.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

M, K, DIM, SUB = 8, 16, 64, 8
OUTER, LLOYD = 10, 4


def load_x(sf_dir: str = "/root/testdata/sf0.001") -> np.ndarray:
    import duckdb

    rows = duckdb.sql(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def encode(xr: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    codes = np.empty((xr.shape[0], M), dtype=np.int64)
    for s in range(M):
        sub = xr[:, s * SUB : (s + 1) * SUB]
        d = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = d.argmin(axis=1)
    return codes


def reconstruct(codes: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    return np.concatenate([books[s][codes[:, s]] for s in range(M)], axis=1)


def kmeans(xr: np.ndarray, books: list[np.ndarray], iters: int) -> list[np.ndarray]:
    for _ in range(iters):
        codes = encode(xr, books)
        for s in range(M):
            sub = xr[:, s * SUB : (s + 1) * SUB]
            for c in range(K):
                mask = codes[:, s] == c
                if mask.any():
                    books[s][c] = sub[mask].mean(axis=0)
    return books


def main() -> None:
    x = load_x()
    # ---- plain-PQ baseline error with the SHIPPED pinned codebooks
    from vector_database_app_spark.pca_oracle_literals import PINNED_PQ_CODEBOOKS

    plain_books = [
        np.array([c for _, c in sorted(PINNED_PQ_CODEBOOKS[s])]) for s in range(M)
    ]
    plain_err = ((x - reconstruct(encode(x, plain_books), plain_books)) ** 2).sum(
        axis=1
    ).mean()

    # ---- OPQ: R0 = sign-fixed QR of seed-0 gaussian, then alternate
    rng = np.random.default_rng(0)
    q, r = np.linalg.qr(rng.standard_normal((DIM, DIM)))
    rot = q * np.sign(np.diag(r))  # unique orthogonal factor

    xr = x @ rot
    books = [xr[:K, s * SUB : (s + 1) * SUB].copy() for s in range(M)]
    for it in range(OUTER):
        books = kmeans(xr, books, LLOYD)
        y = reconstruct(encode(xr, books), books)
        u, _, vt = np.linalg.svd(x.T @ y)
        rot = u @ vt
        xr = x @ rot
        err = ((xr - reconstruct(encode(xr, books), books)) ** 2).sum(axis=1).mean()
        print(f"iter {it}: opq_err {err:.6f}", file=sys.stderr)

    opq_err = ((xr - reconstruct(encode(xr, books), books)) ** 2).sum(axis=1).mean()
    print(f"plain_err {plain_err:.6f}  opq_err {opq_err:.6f}", file=sys.stderr)
    assert opq_err < plain_err, "OPQ did not improve on plain PQ"

    print("PINNED_OPQ_ROTATION = [")
    for i in range(DIM):
        print("    [" + ", ".join(repr(float(v)) for v in rot[:, i]) + "],")
    print("]")
    print()
    print("PINNED_OPQ_CODEBOOKS = {")
    for s in range(M):
        print(f"    {s}: [")
        for c in range(K):
            print(
                f"        ({c}, ["
                + ", ".join(repr(float(v)) for v in books[s][c])
                + "]),"
            )
        print("    ],")
    print("}")
    print()
    print(f"# plain_err {plain_err!r} opq_err {opq_err!r}")


if __name__ == "__main__":
    main()
