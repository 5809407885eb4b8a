"""Deterministic text embedder: token-hash signed random projection.

The reference's embedders (F1-F6, `rag_search/vector_db.py:451-545`) call
OpenAI / sentence-transformers / CLIP one string at a time. In this engine
live models are pluggable batch-inference UDF backends behind the same
contract; the CORRECTNESS path uses this deterministic, dependency-free
embedder: text → L2-normalized fixed-dim vector, identical for identical
text on every run and cluster size (fixed ``PERMS`` constants, no RNG at
plan-build time — mirroring the reference's normalize-in-every-embedder
invariant, `rag_search/vector_db.py:460,488,506,525,543`).

Shape: one ``xxhash64`` per token, then per output dimension a cheap affine
mix of the token hash, summed over tokens — ``dim·|tokens|`` multiply-adds,
all Catalyst expressions inside the scan stage (no Python, no shuffle).
Semantically this is a signed random projection of the token multiset, so
cosine under it tracks token-overlap similarity — exactly what the
dedup/similarity pipelines need from a stand-in embedder.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import MINHASH_PRIME, PERMS
from .vector import l2_normalize


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_embed(text: Column | str, dim: int = 64) -> Column:
    """array<float> unit vector for a text column. Empty/whitespace-only
    text embeds to the zero vector (normalize passes it through)."""
    toks = F.array_remove(F.split(F.lower(_c(text)), " +"), "")
    th = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(MINHASH_PRIME)))

    def comp(a: int, b: int):
        # closure, not lambda default args (PySpark counts those as params)
        return lambda acc, h: acc + (
            F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_PRIME))
            / F.lit(float(MINHASH_PRIME))
            - F.lit(0.5)
        )

    comps = [
        F.aggregate(th, F.lit(0.0), comp(a, b)) for a, b in PERMS[:dim]
    ]
    return l2_normalize(F.array(*comps)).cast("array<float>")


def embedding_space_tag(dim: int = 64) -> str:
    """The space id stamped next to vectors produced by `hash_embed` —
    operators refuse to dot vectors across differing tags (SURVEY §7.3)."""
    return f"hash-{dim}"
