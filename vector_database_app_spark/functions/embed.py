"""Deterministic text embedder: token-hash signed random projection.

The reference's embedders (F1-F6, `rag_search/vector_db.py:451-545`) call
OpenAI / sentence-transformers / CLIP one string at a time. In this engine
embedding is BATCH INFERENCE: an Arrow-vectorized pandas UDF whose body is
pure numpy — the exact slot where a real model (BGE/CLIP/OpenAI batch)
plugs in without touching any operator. The correctness path uses this
deterministic, dependency-free implementation: text → L2-normalized
fixed-dim vector, identical for identical text on every run and cluster
size (fixed ``PERMS`` constants, md5 token hashes, no RNG anywhere) —
mirroring the reference's normalize-in-every-embedder invariant
(`rag_search/vector_db.py:460,488,506,525,543`).

Why a UDF and not Catalyst expressions: per-token × per-dimension folds are
higher-order functions, which execute interpreted (measured ~7µs/element);
the numpy form is one (tokens × dim) matrix op per Arrow batch — two orders
of magnitude faster, and the query side reuses the SAME python function
driver-side so stored vectors and query vectors can never drift.

Semantically this is a signed random projection of the token multiset, so
cosine under it tracks token-overlap similarity — what the dedup /
similarity pipelines need from a stand-in embedder.
"""

from __future__ import annotations

import base64
import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import MINHASH_PRIME, PERMS

# ---------------------------------------------------------------------------
# Space tags
# ---------------------------------------------------------------------------


def embedding_space_tag(dim: int = 64) -> str:
    """The space id stamped next to vectors produced by the text embedder —
    operators refuse to dot vectors across differing tags (SURVEY §7.3)."""
    return f"hash-{dim}"


#: The cross-modal space: text tower and image tower embed into the SAME
#: 32-d space (distinct from the hash-64 text space), mirroring CLIP's
#: paired encoders. Cross-modal search (reference V3/V5,
#: vector_db.py:716-730) only works because the towers share a space.
CLIP_STUB_DIM = 32
CLIP_STUB_SPACE = f"clipstub-{CLIP_STUB_DIM}"


# ---------------------------------------------------------------------------
# Pure-python core (shared by the executor UDF and the driver-side query
# embedder — one implementation, zero drift)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1 << 20)
def _token_hash(tok: str) -> int:
    """Deterministic 63-bit token hash < P via md5 (no JVM dependency)."""
    return (
        int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "little")
        % MINHASH_PRIME
    )


def _coeffs(dim: int, perm_offset: int) -> tuple[np.ndarray, np.ndarray]:
    perms = PERMS[perm_offset : perm_offset + dim]
    return (
        np.array([a for a, _ in perms], dtype=np.int64),
        np.array([b for _, b in perms], dtype=np.int64),
    )


def py_embed_texts(
    texts, dim: int = 64, *, perm_offset: int = 0
) -> np.ndarray:
    """(N, dim) float32, rows L2-normalized (zero vector for empty text).
    Tokenization matches the engine's word convention: lowercase, split on
    space runs, empties dropped."""
    A, B = _coeffs(dim, perm_offset)
    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = [w for w in (t or "").lower().split(" ") if w]
        if not toks:
            continue
        hs = np.fromiter(
            (_token_hash(w) for w in toks), dtype=np.int64, count=len(toks)
        )
        # (tokens, dim) affine permutations scaled to [-0.5, 0.5)
        contrib = ((hs[:, None] * A[None, :] + B[None, :]) % MINHASH_PRIME) / float(
            MINHASH_PRIME
        ) - 0.5
        v = contrib.sum(axis=0)
        n = np.linalg.norm(v)
        out[i] = v / n if n > 0 else v
    return out.astype(np.float32)


def _payload_to_text(b: bytes | None) -> str:
    """STUB image 'decode': utf-8 content when valid (test fixtures carry
    textual payloads), else the base64 form (deterministic,
    content-addressed). A real deployment replaces this + the embed with a
    vision model in the same UDF slot."""
    if b is None:
        return ""
    try:
        return bytes(b).decode("utf-8")
    except UnicodeDecodeError:
        return base64.b64encode(bytes(b)).decode("ascii")


# ---------------------------------------------------------------------------
# Driver-side query embedding (python string → literal vector column)
# ---------------------------------------------------------------------------


def embed_query_text(text: str, dim: int = 64, *, perm_offset: int = 0) -> Column:
    """Embed ONE query string driver-side and return it as a literal
    array<float> column — the query plan ships 64 floats, no UDF, and the
    vector is bit-identical to what the ingest UDF stored for that text."""
    vec = [float(x) for x in py_embed_texts([text], dim, perm_offset=perm_offset)[0]]
    return F.lit(vec).cast("array<float>")


def clip_stub_query_text(text: str) -> Column:
    """'CLIP text tower' on a driver-side query string (clipstub space)."""
    return embed_query_text(text, CLIP_STUB_DIM, perm_offset=CLIP_STUB_DIM)


# ---------------------------------------------------------------------------
# Executor-side batch embedding UDFs
# ---------------------------------------------------------------------------


def make_text_embed_udf(dim: int = 64, *, perm_offset: int = 0):
    """Arrow-batched text embedder (reference F1/F2 slot)."""

    @F.pandas_udf("array<float>")
    def embed(s: pd.Series) -> pd.Series:
        arr = py_embed_texts(s.tolist(), dim, perm_offset=perm_offset)
        return pd.Series(list(arr))

    return embed


def make_image_embed_udf():
    """Arrow-batched 'CLIP image tower' over binary payloads (reference
    F3/F5 slot): payload → stub decode → clipstub-space vector."""

    @F.pandas_udf("array<float>")
    def embed(s: pd.Series) -> pd.Series:
        texts = [_payload_to_text(b) for b in s]
        arr = py_embed_texts(texts, CLIP_STUB_DIM, perm_offset=CLIP_STUB_DIM)
        return pd.Series(list(arr))

    return embed


# Backwards-compatible names used by operators:
def hash_embed_udf(col: Column | str, dim: int = 64) -> Column:
    """Text-space embedding of a string column (UDF call)."""
    c = F.col(col) if isinstance(col, str) else col
    return make_text_embed_udf(dim)(c)


def clip_stub_image_embed(col: Column | str) -> Column:
    """Clipstub-space embedding of a binary payload column (UDF call)."""
    c = F.col(col) if isinstance(col, str) else col
    return make_image_embed_udf()(c)


def clip_stub_text_embed(col: Column | str) -> Column:
    """Clipstub-space embedding of a STRING column — the batch form of the
    'CLIP text tower' (reference F4/F6, vector_db.py:492-508,529-545; the
    reference reloaded the model per call — here one UDF instance embeds
    Arrow batches). Pairs with clip_stub_image_embed for image↔text
    retrieval in the shared clipstub space."""
    c = F.col(col) if isinstance(col, str) else col
    return make_text_embed_udf(CLIP_STUB_DIM, perm_offset=CLIP_STUB_DIM)(c)
