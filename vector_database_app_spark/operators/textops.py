"""Text-analysis operators over a documents table.

No reference equivalent (the reference strips whitespace and nothing else,
`rag_search/vector_db.py:269,323,355`) — this is the LLM-training-data
pipeline surface: language ID, quality scoring, token counting, document
fingerprinting. All pure column expressions from ``functions.text``: one
scan, whole-stage codegen, no Python, no shuffle (per-doc metrics are
row-local; only explicit aggregations shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add heuristic `lang_pred` next to the labeled `lang` (if present)."""
    return df.withColumn("lang_pred", TX.lang_id(text_col))


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality signals: length, word stats, punctuation/stopword
    ratios. These are the standard pre-training corpus filters (C4-style
    heuristics) expressed as one projection."""
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("len_chars"),
        TX.n_words(text_col).cast("bigint").alias("len_words"),
        TX.avg_word_len(text_col).alias("avg_word_len"),
        TX.punct_ratio(text_col).alias("punct_ratio"),
        TX.stopword_ratio(text_col).alias("stopword_ratio"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts (budgeting/billing for corpus
    construction)."""
    return df.select(
        F.col(id_col),
        TX.n_words(text_col).cast("bigint").alias("n_ws_tokens"),
        TX.n_bpe_tokens(text_col).cast("bigint").alias("n_bpe_tokens"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", *, shingle_n: int = 3
) -> DataFrame:
    """Single-permutation shingle fingerprint per doc (see
    ``functions.text.fingerprint``)."""
    return df.select(
        F.col(id_col), TX.fingerprint(text_col, shingle_n).alias("fingerprint")
    )
