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
import tempfile

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
        # Keep Spark's managed-table warehouse out of the repo root
        # (default is ./spark-warehouse in cwd — repo litter).
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "vector_database_app_spark-warehouse"),
        )
    )
    return builder.getOrCreate()


def cluster_conf(
    *,
    total_cores: int = 1000 * 4,
    executor_mem_gb: int = 32,
) -> dict[str, str]:
    """The 100 TB cluster profile — what changes (and what deliberately
    does NOT) when this engine leaves local[32] for ~1000 executors.
    Returned as a dict so deployments feed it to spark-submit --conf /
    SparkSession.builder without importing anything else.

    Rationale per key:

    - shuffle.partitions ≈ 2-3x total cores: the INITIAL partitioning only
      — AQE coalesces small post-shuffle partitions at runtime, so
      over-partitioning is cheap and under-partitioning (spill) is the
      failure mode being priced out.
    - files.maxPartitionBytes 256m: at 100 TB this yields ~400k scan
      tasks; larger splits amortize task overhead, and columnar pruning
      keeps per-task memory bounded by the projected columns, not the
      split size.
    - adaptive.* on: runtime re-plan (coalescing, skew-join splitting,
      broadcast demotion) replaces every hand-tuned partition count in
      this codebase — the operators were written assuming it.
    - autoBroadcastJoinThreshold 64m: dimension tables, centroid/probe
      lists, and query batches are the broadcast sides everywhere here;
      64m covers them while 100 TB fact sides can never be mistaken for
      broadcastable.
    - shuffle.service / dynamicAllocation: elasticity on a shared cluster;
      harmless locally, required at fleet scale.
    - kryo: shuffle/broadcast bytes, not semantics.
    - runtime.bloomFilter on: runtime row-level filtering for selective
      joins whose small side is too big to broadcast (the gram join in
      decontaminate with a large benchmark, similarity candidate joins) —
      the shuffle-side complement of DPP; creationSideThreshold raised so
      the 100 TB fact side still qualifies as the application side.

    NOT set: executor count/sizing flags beyond memory (cluster-manager
    territory), and nothing that alters query semantics — the same plans
    that pass the sf0.01 oracle gate run unchanged."""
    return {
        "spark.sql.shuffle.partitions": str(total_cores * 2),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.memory.fraction": "0.7",
        "spark.shuffle.service.enabled": "true",
        "spark.dynamicAllocation.enabled": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": str(
            256 * 1024 * 1024
        ),
    }
