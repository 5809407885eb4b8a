"""Distributed BPE tokenizer training and encoding.

No reference equivalent (the reference never tokenizes;
`rag_search/vector_db.py:269` embeds raw strings) — this is the
tokenizer-training stage of an LLM data pipeline: learn a byte-pair
merge table from corpus statistics (Sennrich et al. 2016,
arXiv:1508.07909) and measure the fertility of the learned tokenizer
over the corpus.

Scale design. BPE training is corpus-weighted WORD-VOCABULARY work:
after the one corpus scan that counts words, every iteration touches
only the distinct-word frame (|vocab| rows, millions at 100 TB — never
corpus rows). Each merge step is (a) one hash aggregation over exploded
adjacent symbol pairs (map-side partial, weighted by word count), (b) a
1-row TakeOrderedAndProject argmax collected to the driver (the merge
decision IS a driver artifact, like a k-means centroid), and (c) a pure
column-expression rewrite of the symbol arrays (``F.aggregate``
left-to-right scan — greedy leftmost-first merge exactly like the
published algorithm). ``localCheckpoint`` flattens the lineage each
iteration, the sanctioned use inside iterative trainers.

Encoding reuses the same shape: merges are applied to the DISTINCT word
frame once (vocab-sized work), and per-document token counts come from
joining the token stream back on the word key — AQE broadcasts the
vocab side when it fits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX

#: Merge-table row: (rank, left_sym, right_sym, merged, pair_count).
MERGE_SCHEMA = (
    "rank int, left_sym string, right_sym string, "
    "merged string, pair_count bigint"
)


def word_counts(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """One corpus scan → (word, ct): the only corpus-sized job in BPE
    training; everything after runs on the vocabulary."""
    return (
        df.select(
            F.explode(
                F.filter(TX.words(text_col), lambda w: w != F.lit(""))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )


def merge_step_expr(sym_col: Column, left: str, right: str) -> Column:
    """Rewrite a symbol array applying ONE merge (left,right)→left+right,
    greedy leftmost-first — a sequential ``F.aggregate`` scan: append the
    next symbol, or fuse it into the accumulator tail when the tail is
    `left` and the symbol is `right`. Pure column expression: per-row,
    JVM-side, no Python. ``try_element_at`` keeps the empty-accumulator
    probe ANSI-safe (CASE WHEN does not short-circuit subexpressions)."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def apply_merges_expr(sym_col: Column, merges: list[dict]) -> Column:
    """Chain the learned merge table (in rank order) over a symbol array
    — the ENCODE path. Expression depth is |merges|; encoding runs on
    the distinct-word frame, so the cost is vocab-sized."""
    out = sym_col
    for m in merges:
        out = merge_step_expr(out, m["left_sym"], m["right_sym"])
    return out


def bpe_train(
    df: DataFrame,
    *,
    n_merges: int = 12,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> list[dict]:
    """Learn `n_merges` BPE merges from corpus word statistics. Returns
    the merge table as a driver-side list of dicts (rank, left_sym,
    right_sym, merged, pair_count) — n_merges rows, the bounded artifact
    a tokenizer IS (kmeans_train's k·dim contract). Ties break on the
    (left, right) pair string so training is deterministic; merging
    stops early when the best pair's corpus count falls below
    `min_pair_count` (no degenerate single-occurrence merges)."""
    vocab = word_counts(df, text_col=text_col).select(
        F.split("w", "").alias("syms"), "ct"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[dict] = []
    try:
        for rank in range(n_merges):
            pairs = vocab.filter(F.size("syms") >= 2).select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "ct",
            )
            best = (
                pairs.groupBy("p.l", "p.r")
                .agg(F.sum("ct").alias("n"))
                .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["n"] < min_pair_count:
                break
            left, right, n = best[0]["l"], best[0]["r"], int(best[0]["n"])
            merges.append(
                {
                    "rank": rank,
                    "left_sym": left,
                    "right_sym": right,
                    "merged": left + right,
                    "pair_count": n,
                }
            )
            nxt = vocab.select(
                merge_step_expr(F.col("syms"), left, right).alias("syms"),
                "ct",
            ).localCheckpoint(eager=True)
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def bpe_encode_counts(
    df: DataFrame,
    merges: list[dict],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document fertility of the learned tokenizer: word count,
    character count, BPE token count after applying the merge table, and
    the chars-per-token compression ratio (one rounded division).

    Scale shape: merges apply to the DISTINCT word frame (vocab-sized
    expression work), then the token stream joins back on the word key
    (AQE broadcast when the vocab fits) and re-aggregates per doc —
    corpus rows are touched exactly twice (explode + join), never by the
    merge expressions."""
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(TX.words(text_col), lambda w: w != F.lit(""))
        ).alias("w"),
    )
    vocab_tok = (
        toks.select("w")
        .distinct()
        .select(
            "w",
            F.size(
                apply_merges_expr(F.split("w", ""), merges)
            ).cast("bigint").alias("w_tokens"),
            F.length("w").cast("bigint").alias("w_chars"),
        )
    )
    return (
        toks.join(vocab_tok, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("w_chars").cast("bigint").alias("n_chars"),
            F.sum("w_tokens").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            id_col,
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.round(
                F.col("n_chars") / F.col("n_bpe_tokens"), 6
            ).alias("chars_per_token"),
        )
    )
