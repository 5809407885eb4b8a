"""RAG tail: metadata prefilter, result fusion, context assembly, source
list, deterministic summary stand-in.

Reference lifecycle (`run_search`, `rag_search/vector_db.py:615-671`):
filter (P1 `get_search_range` :673-682) → brute-force top-k (V1 :684-696) →
concat text+image hits (V6 :666,733) → LLM summary (R2 :668) → source list
(R3 :903-916).

The LLM call itself is a pluggable batch-inference UDF out of the
correctness path; the deterministic stand-in is `concat_ws` over the
retrieved texts in similarity order — an aggregate over retrieved rows, the
same dataflow shape as the real summarizer (`collect + prompt-build + one
call per query`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def search_range_filter(
    df: DataFrame, search_location: str | None, path_col: str = "doc_name"
) -> DataFrame:
    """Reference `get_search_range` (`rag_search/vector_db.py:673-682`):
    None → whole table; directory → case-insensitive *literal* substring
    match (the reference regex-escapes, `:677`); exact file → equality.
    On storage partitioned by doc prefix the equality branch becomes
    partition pruning."""
    if search_location is None:
        return df
    c = F.col(path_col)
    if search_location.endswith("/"):
        return df.filter(F.lower(c).contains(search_location.lower()))
    return df.filter(c == F.lit(search_location))


def fuse_results(text_hits: DataFrame, image_hits: DataFrame) -> DataFrame:
    """Reference V6 fusion = plain concat of the two top-k lists
    (`rag_search/vector_db.py:666`) → unionByName. No score renormalization
    (documented quirk; scores from different spaces are not comparable)."""
    return text_hits.unionByName(image_hits, allowMissingColumns=True)


def source_list(hits: DataFrame) -> DataFrame:
    """Reference `generate_source_list` (`rag_search/vector_db.py:903-916`):
    project the 5 metadata columns; doc_name already a string here."""
    return hits.select("doc_name", "page_num", "content_type", "content_id", "content_raw")


def summarize_hits(
    hits: DataFrame,
    *,
    query_id_col: str = "query_id",
    text_col: str = "text",
    sim_col: str = "sim",
    id_col: str = "doc_id",
    sep: str = " | ",
) -> DataFrame:
    """Deterministic summary: texts joined in (sim DESC, id ASC) order.

    collect_list is order-nondeterministic across partitions, so ordering is
    imposed AFTER collection: sort_array over (neg-sim, id, text) structs,
    then project the text — reproducible on any partitioning/cluster size.
    A real LLM summarizer swaps the array_join for a batch-inference pandas
    UDF over the same collected array (reference R2, vector_db.py:838-901).
    """
    keyed = hits.select(
        F.col(query_id_col),
        F.struct(
            (-F.col(sim_col)).alias("neg_sim"),
            F.col(id_col).alias("id"),
            F.col(text_col).alias("text"),
        ).alias("kv"),
    )
    return keyed.groupBy(query_id_col).agg(
        F.array_join(
            F.transform(F.sort_array(F.collect_list("kv")), lambda s: s["text"]), sep
        ).alias("summary"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
