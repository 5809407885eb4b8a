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


def hash_embed(text: Column | str, dim: int = 64, *, perm_offset: int = 0) -> Column:
    """array<float> unit vector for a text column. Empty/whitespace-only
    text embeds to the zero vector (normalize passes it through).
    `perm_offset` selects a disjoint slice of the PERMS constants, yielding
    an INDEPENDENT embedding space (used by the CLIP-stub dual tower).

    Expression shape: the permutation coefficients are two literal arrays
    and the whole embedding is ONE aggregate folding tokens into a
    dim-width accumulator array — constant plan size regardless of `dim`
    (the naive one-aggregate-per-dimension form re-embedded the token
    subtree 64× and spent seconds per query just CONSTRUCTING the plan
    through py4j). Component values are bit-identical to that form: each
    component sums the same per-token terms in the same token order."""
    toks = F.array_remove(F.split(F.lower(_c(text)), " +"), "")
    th = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(MINHASH_PRIME)))
    perms = PERMS[perm_offset : perm_offset + dim]
    coef_a = F.array(*[F.lit(a) for a, _ in perms])
    coef_b = F.array(*[F.lit(b) for _, b in perms])
    zero = F.array_repeat(F.lit(0.0), dim)
    summed = F.aggregate(
        th,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(
                coef_a,
                coef_b,
                lambda a, b: F.pmod(a * h + b, F.lit(MINHASH_PRIME))
                / F.lit(float(MINHASH_PRIME))
                - F.lit(0.5),
            ),
            lambda x, y: x + y,
        ),
    )
    return l2_normalize(summed).cast("array<float>")


def embedding_space_tag(dim: int = 64) -> str:
    """The space id stamped next to vectors produced by `hash_embed` —
    operators refuse to dot vectors across differing tags (SURVEY §7.3)."""
    return f"hash-{dim}"


# ---------------------------------------------------------------------------
# CLIP-stub dual tower (deterministic stand-in for reference F3-F6,
# rag_search/vector_db.py:473-545)
# ---------------------------------------------------------------------------

#: The cross-modal space: text tower and image tower embed into the SAME
#: 32-d space (distinct from the hash-64 text space), mirroring CLIP's
#: paired encoders. Cross-modal search (reference V3/V5,
#: vector_db.py:716-730) only works because the towers share a space.
CLIP_STUB_DIM = 32
CLIP_STUB_SPACE = f"clipstub-{CLIP_STUB_DIM}"


def clip_stub_text_embed(text: Column | str) -> Column:
    """'CLIP text tower': hash embedding from a PERMS slice disjoint from
    hash_embed's, so clipstub-32 vectors are uncorrelated with hash-64
    vectors — dotting across spaces is meaningless, and operators enforce
    that via the space tag."""
    return hash_embed(text, CLIP_STUB_DIM, perm_offset=CLIP_STUB_DIM)


def clip_stub_image_embed(payload: Column | str) -> Column:
    """'CLIP image tower': embeds the *content* of an image payload into the
    same clipstub space as the text tower. STUB semantics: payloads are
    decoded as utf-8 text (the test fixtures store textual payloads); a real
    deployment swaps this for a batch-inference UDF with the same signature
    and keeps every downstream operator unchanged."""
    p = F.col(payload) if isinstance(payload, str) else payload
    # ANSI decode raises MALFORMED_CHARACTER_CODING on real binary (e.g.
    # JPEG) payloads — guard with is_valid_utf8 and fall back to the
    # payload's base64 form (deterministic, content-addressed)
    content = F.when(F.is_valid_utf8(p), F.decode(p, "UTF-8")).otherwise(
        F.base64(p)
    )
    return clip_stub_text_embed(content)
