"""SparkSession factory with scale-oriented defaults.

The reference engine is a single-process pandas singleton
(`rag_search/vector_db.py:27`, loaded pickles at `:147-148`). Here the session
is the only process-wide object, and every default below is chosen for a large
cluster first, then validated on local[32]:

- AQE on: runtime shuffle-partition coalescing + skew-join splitting replaces
  hand-tuned partition counts at 100 TB.
- ``spark.sql.shuffle.partitions`` is only an initial value under AQE; on a
  real cluster set it near 2-3x total cores — here 32 for local[32].
- Arrow enabled: every Python boundary (mapInPandas ingest, embedding UDFs)
  moves columnar batches, not pickled rows.
- Session timezone pinned to UTC so timestamp semantics are stable across the
  DuckDB oracle, parquet writers, and any cluster's local zone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "vector_database_app_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or all cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    return builder.getOrCreate()
