"""OPQ (rotated PQ) pinned-artifact properties — the claims the value
oracle (tests/test_oracle.py::ann_opq_search_pinned) cannot express:
the rotation is genuinely orthogonal (so ADC still estimates the
original-space similarity) and it genuinely improves quantization
error over the plain pinned PQ codebooks (else OPQ is decoration).
Regeneration recipe: tools/train_opq.py.
"""

from __future__ import annotations

import numpy as np

from vector_database_app_spark.pca_oracle_literals import (
    PINNED_OPQ_CODEBOOKS,
    PINNED_OPQ_ROTATION,
    PINNED_PQ_CODEBOOKS,
)

M, K, SUB, DIM = 8, 16, 8, 64


def _load_x():
    import duckdb

    rows = duckdb.sql(
        "SELECT embedding FROM '/root/testdata/sf0.001/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _books(pinned):
    return [np.array([c for _, c in sorted(pinned[s])]) for s in range(M)]


def _sq_err(x, books):
    err = np.zeros(x.shape[0])
    for s in range(M):
        sub = x[:, s * SUB : (s + 1) * SUB]
        d = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        err += d.min(axis=1)
    return err.mean()


def test_rotation_is_orthogonal():
    # axis i is a column of R: R[j][i] = PINNED_OPQ_ROTATION[i][j]
    r = np.array(PINNED_OPQ_ROTATION).T
    assert np.abs(r.T @ r - np.eye(DIM)).max() < 1e-12


def test_rotation_shapes():
    assert len(PINNED_OPQ_ROTATION) == DIM
    assert all(len(a) == DIM for a in PINNED_OPQ_ROTATION)
    assert sorted(PINNED_OPQ_CODEBOOKS) == list(range(M))
    for s in range(M):
        assert [c for c, _ in PINNED_OPQ_CODEBOOKS[s]] == list(range(K))
        assert all(len(v) == SUB for _, v in PINNED_OPQ_CODEBOOKS[s])


def test_opq_error_beats_plain_pq():
    x = _load_x()
    plain = _sq_err(x, _books(PINNED_PQ_CODEBOOKS))
    rot = np.array(PINNED_OPQ_ROTATION).T
    opq = _sq_err(x @ rot, _books(PINNED_OPQ_CODEBOOKS))
    # trained values: plain 0.5749, opq 0.4583 — pin a margin so a
    # legitimate literal re-train can't flake the suite
    assert opq < plain * 0.95, (opq, plain)


def test_rotation_preserves_dot_products():
    x = _load_x()[:20]
    rot = np.array(PINNED_OPQ_ROTATION).T
    xr = x @ rot
    assert np.abs(x @ x.T - xr @ xr.T).max() < 1e-10
