"""Physical layout strategies: bucketing for co-located (shuffle-free)
joins, partitioned writes for pruning.

No reference equivalent (two pickles, whole-table in memory). At 100 TB
the dominant repeated cost is shuffling fact tables for every join on the
same key; bucketing pays that shuffle ONCE at write time:

- `write_bucketed` both sides of a hot join by the join key → Spark's
  native bucketing records the layout in the table catalog, and a
  subsequent equi-join on the bucket key plans with NO Exchange on either
  side (verified in tests/test_layout.py by asserting the plan).
- `write_partitioned` directories by a low-cardinality column → equality /
  IN predicates become partition pruning (the scan never opens excluded
  directories) — this is what makes the reference's `doc_name` filter
  (P1) free on a partitioned chunk store.

Bucket count rule of thumb at scale: total_size / bucket_count ≈ healthy
task input (128-512 MB); both join sides must use the SAME count for
co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    *,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Write as a bucketed (optionally sorted) external table; returns the
    catalog-backed DataFrame whose scans carry the bucket layout. Sorting
    within buckets additionally removes the Sort from sort-merge joins."""
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
    return df.sparkSession.table(table_name)


def write_partitioned(
    df: DataFrame, path: str, *, partition_cols: list[str], mode: str = "overwrite"
) -> DataFrame:
    """Directory-partitioned parquet; predicates on the partition columns
    prune at the file-listing level."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    return df.sparkSession.read.parquet(path)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
