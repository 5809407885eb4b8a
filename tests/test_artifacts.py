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


def test_commit_is_atomic_rename_no_partial_target(spark, tmp_path, monkeypatch):
    """The trained table must land at the keyed path via temp-dir +
    rename: while train_fn runs, the TARGET path must not exist (a
    concurrent reader can never observe a mid-overwrite directory), and
    a leftover tmp dir from a lost race must not survive."""
    monkeypatch.setattr(ART, "artifacts_root", lambda: str(tmp_path))
    schema = "centroid_id int, centroid array<double>"
    p = {"k": 5}
    key = ART.artifact_key(SF, "t5", p, source="embeddings.parquet")
    target = os.path.join(str(tmp_path), key)

    seen: list = []

    def train():
        seen.append(os.path.exists(target))  # target untouched mid-train
        return spark.createDataFrame([(0, [0.0])], schema)

    ART.load_or_train(spark, SF, "t5", p, train, schema).collect()
    assert seen == [False]
    assert os.path.exists(os.path.join(target, "_SUCCESS"))
    assert not [d for d in os.listdir(str(tmp_path)) if ".tmp-" in d]
    shutil.rmtree(target)


def test_lost_commit_race_keeps_winner(spark, tmp_path, monkeypatch):
    """If another process commits the same key while we train, our rename
    fails — we must keep the winner's artifact and drop our temp dir."""
    monkeypatch.setattr(ART, "artifacts_root", lambda: str(tmp_path))
    schema = "centroid_id int, centroid array<double>"
    p = {"k": 6}
    key = ART.artifact_key(SF, "t6", p, source="embeddings.parquet")
    target = os.path.join(str(tmp_path), key)

    def winner_commits_then_train():
        # simulate the concurrent winner landing while we train
        spark.createDataFrame([(99, [9.0])], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(target)
        return spark.createDataFrame([(1, [1.0])], schema)

    rows = ART.load_or_train(
        spark, SF, "t6", p, winner_commits_then_train, schema
    ).collect()
    assert [r.centroid_id for r in rows] == [99]  # winner's data served
    assert not [d for d in os.listdir(str(tmp_path)) if ".tmp-" in d]
    shutil.rmtree(target)


def test_json_artifact_tmp_is_pid_qualified(tmp_path, monkeypatch):
    """Two concurrent load_or_build_object writers must never share one
    tmp file (interleaved writes → truncated JSON installed for every
    later load — advisor r4 finding). The tmp path is pid-qualified."""
    monkeypatch.setattr(ART, "artifacts_root", lambda: str(tmp_path))
    seen: list[str] = []
    real_replace = os.replace

    def spying_replace(src, dst):
        seen.append(src)
        real_replace(src, dst)

    monkeypatch.setattr(os, "replace", spying_replace)
    ART._MEMO.clear()
    obj = ART.load_or_build_object(SF, "j1", {"v": 1}, lambda: {"a": 1})
    assert obj == {"a": 1}
    assert seen and seen[0].endswith(f".tmp-{os.getpid()}")


def test_json_artifact_lost_replace_race_reads_winner(
    tmp_path, monkeypatch
):
    """When os.replace loses the race (winner already installed the
    file), the loser must fall back to reading the winner's JSON, not
    propagate the OSError (advisor r4 finding)."""
    monkeypatch.setattr(ART, "artifacts_root", lambda: str(tmp_path))
    ART._MEMO.clear()
    key = ART.artifact_key(SF, "j2", {"v": 2}, source="documents.parquet")
    path = os.path.join(str(tmp_path), key + ".json")

    def losing_replace(src, dst):
        # simulate the winner landing first, then our replace failing
        with open(path, "w") as f:
            f.write('{"winner": true}')
        raise OSError("lost the race")

    monkeypatch.setattr(os, "replace", losing_replace)
    obj = ART.load_or_build_object(
        SF, "j2", {"v": 2}, lambda: {"loser": True}
    )
    assert obj == {"winner": True}
    assert not [d for d in os.listdir(str(tmp_path)) if ".tmp-" in d]


def test_pin_release_unpersists_build_time_caches(spark):
    """quality_calibration persists its scored table at build time; the
    pinned handle must let the caller release the cached blocks after the
    action (advisor r3 leak finding)."""
    from vector_database_app_spark import caching
    from vector_database_app_spark.operators.textops import quality_calibration
    from vector_database_app_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents")
    out = quality_calibration(docs)
    deps = getattr(out, "_vdas_pinned_deps", ())
    assert deps, "result should carry its persisted dependency"
    out.collect()
    assert any(d.storageLevel.useMemory for d in deps)
    caching.release(out)
    assert all(not d.storageLevel.useMemory for d in deps)
    caching.release(out)  # idempotent
