"""AQE skew-join handling: prove the runtime splits a pathological hot key.

At 100 TB a single hot join key (null-ish ids, default enum values) turns
one reducer into the job's critical path. Two engine answers, both
covered: AQE's runtime skew split (this test) for organic skew, and
`relational.salted_join` (oracle-checked `join_salted`) for the
single-key-bigger-than-an-executor case AQE cannot split pre-aggregation.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",   # force sort-merge join
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_confs(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_hot_key(spark, skew_confs):
    # one hot key (50k rows) among 100 uniform keys (100 rows each)
    left = spark.range(60_000).select(
        F.when(F.col("id") < 50_000, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(100)))
        .alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
    )
    right = spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("dim-"), F.col("id")).alias("dim"),
    )
    joined = left.join(right, "k")
    # execute THIS dataframe's plan (count() would run a different
    # QueryExecution and leave joined's adaptive plan unfinalized)
    assert len(joined.collect()) == 60_000
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan
    # AQE marks the split skew partitions on the SMJ node
    assert "skew=true" in final_plan, final_plan[:2000]
