"""plans/artifacts.py: load-or-train lifecycle — identity of trained vs
loaded results, in-process memo behavior, and fingerprint invalidation."""

from __future__ import annotations

import os
import shutil

from vector_database_app_spark.plans import artifacts as ART

SF = "/root/testdata/sf0.001"


def _counting_train(spark, calls):
    def train():
        calls.append(1)
        return spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
            "centroid_id int, centroid array<double>",
        )

    return train


def test_load_or_train_trains_once_then_loads(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(ART, "artifacts_root", lambda: str(tmp_path))
    calls: list = []
    schema = "centroid_id int, centroid array<double>"
    p = {"k": 2}
    first = ART.load_or_train(
        spark, SF, "t1", p, _counting_train(spark, calls), schema
    ).collect()
    assert len(calls) == 1
    second = ART.load_or_train(
        spark, SF, "t1", p, _counting_train(spark, calls), schema
    ).collect()
    assert len(calls) == 1, "second build must load, not retrain"
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_params_and_fingerprint_key_the_artifact(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(ART, "artifacts_root", lambda: str(tmp_path))
    calls: list = []
    schema = "centroid_id int, centroid array<double>"
    ART.load_or_train(
        spark, SF, "t2", {"k": 2}, _counting_train(spark, calls), schema
    ).collect()
    ART.load_or_train(
        spark, SF, "t2", {"k": 3}, _counting_train(spark, calls), schema
    ).collect()
    assert len(calls) == 2, "different params -> different artifact"
    # a different source fingerprint (other sf dir) also invalidates
    ART.load_or_train(
        spark,
        "/root/testdata/sf0.01",
        "t2",
        {"k": 2},
        _counting_train(spark, calls),
        schema,
    ).collect()
    assert len(calls) == 3


def test_rows_memo_is_zero_job_on_repeat(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(ART, "artifacts_root", lambda: str(tmp_path))
    calls: list = []
    schema = "centroid_id int, centroid array<double>"
    p = {"k": 9}
    rows1 = ART.load_or_train_rows(
        spark, SF, "t3", p, _counting_train(spark, calls), schema
    )
    before = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    rows2 = ART.load_or_train_rows(
        spark, SF, "t3", p, _counting_train(spark, calls), schema
    )
    after = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    assert rows1 == rows2 and len(calls) == 1
    assert after == before, "memo hit must not touch the cluster"


def test_torn_write_retrains(spark, tmp_path, monkeypatch):
    """A crashed write (directory without _SUCCESS) must not be served."""
    monkeypatch.setattr(ART, "artifacts_root", lambda: str(tmp_path))
    calls: list = []
    schema = "centroid_id int, centroid array<double>"
    p = {"k": 4}
    ART.load_or_train(
        spark, SF, "t4", p, _counting_train(spark, calls), schema
    ).collect()
    key = ART.artifact_key(SF, "t4", p, source="embeddings.parquet")
    os.remove(os.path.join(str(tmp_path), key, "_SUCCESS"))
    ART.load_or_train(
        spark, SF, "t4", p, _counting_train(spark, calls), schema
    ).collect()
    assert len(calls) == 2
    shutil.rmtree(os.path.join(str(tmp_path), key))
