"""Custom Python data sources (sources/pyds): batch generator determinism,
streaming replay offset semantics, exactly-once availableNow replay."""

from __future__ import annotations

import tempfile

import pyarrow.parquet as pq
import pytest

from vector_database_app_spark.sources import pyds

SF_SMOKE = "/root/testdata/sf0.001"
EVENTS = f"{SF_SMOKE}/events.parquet"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyds.register_python_sources(spark)


def _synth(spark, rows=200, partitions=4):
    return (
        spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", partitions)
        .load()
    )


def test_synthetic_docs_count_and_parallelism(spark):
    df = _synth(spark, rows=200, partitions=4)
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4


def test_synthetic_docs_deterministic_and_matches_local(spark):
    df = _synth(spark, rows=50)
    rows = {r.doc_id: tuple(r) for r in df.collect()}
    assert rows == {r.doc_id: tuple(r) for r in df.collect()}
    for doc_id in (0, 7, 49):
        assert rows[doc_id] == pyds.synth_row(doc_id)


def test_synthetic_docs_text_is_n_words_long(spark):
    for r in _synth(spark, rows=50).collect():
        assert len(r.text.split(" ")) == r.n_words
        assert 3 <= r.n_words <= 10


def test_replay_reader_offsets_are_deterministic():
    r1 = pyds._ReplayStreamReader({"path": EVENTS, "rate": 100, "chunk": 40})
    r2 = pyds._ReplayStreamReader({"path": EVENTS, "rate": 100, "chunk": 40})
    assert r1.initialOffset() == {"idx": 0}
    end = r1.latestOffset()
    assert end == {"idx": 100}
    parts = r1.partitions(r1.initialOffset(), end)
    assert [(p.start, p.end) for p in parts] == [(0, 40), (40, 80), (80, 100)]
    batch1 = [row for p in parts for row in r1.read(p)]
    batch2 = [row for p in r2.partitions({"idx": 0}, {"idx": 100}) for row in r2.read(p)]
    assert batch1 == batch2  # recovery replays identically
    ts = [row[3] for row in batch1]
    assert ts == sorted(ts)  # replay is in event-time order


def test_replay_stream_available_now_is_exactly_once(spark):
    expected = pq.read_table(EVENTS).num_rows
    out = (
        spark.readStream.format("events_replay")
        .option("path", EVENTS)
        .option("chunk", 300)
        .load()
    )
    q = (
        out.writeStream.format("memory")
        .queryName("pyds_replay")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select count(*) c, count(distinct event_id) d from pyds_replay"
    ).collect()[0]
    assert got.c == expected  # no loss
    assert got.d == expected  # no duplication


def test_replay_source_composes_with_windowed_agg(spark):
    """events_replay → event-time tumbling counts (streaming) equals the
    same aggregation over the parquet table (batch): the custom source
    slots into the normal Structured Streaming surface."""
    from pyspark.sql import functions as F

    from vector_database_app_spark.sources.catalog import load_table

    stream = (
        spark.readStream.format("events_replay")
        .option("path", EVENTS)
        .load()
        .select(
            F.timestamp_micros(F.col("ts_us")).alias("ts"), "event_type"
        )
        .withWatermark("ts", "10 minutes")
    )
    agg = stream.groupBy(
        F.window("ts", "1 hour").alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    q = (
        agg.select(F.col("win.start").cast("string").alias("ws"), "event_type", "n")
        .writeStream.format("memory")
        .queryName("pyds_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.table("pyds_win").collect()}
    want = {
        tuple(r)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("win.start").cast("string").alias("ws"), "event_type", "n")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_jsonl_commit_sink_end_to_end_exactly_once(spark, tmp_path):
    """events_replay → jsonl_commit: a pure Python-DataSource pipeline.
    All rows land exactly once in committed files; temp files are gone."""
    import json
    import os

    out = str(tmp_path / "sink")
    q = (
        spark.readStream.format("events_replay")
        .option("path", EVENTS)
        .load()
        .writeStream.format("jsonl_commit")
        .option("path", out)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = []
    for name in os.listdir(out):
        if name.startswith("batch-"):
            with open(os.path.join(out, name)) as f:
                rows += [json.loads(line) for line in f]
    expected = pq.read_table(EVENTS).num_rows
    assert len(rows) == expected
    assert len({r["event_id"] for r in rows}) == expected
    assert not [n for n in os.listdir(out) if n.startswith("_tmp-")]
    assert os.listdir(os.path.join(out, "_commits"))


def test_jsonl_commit_replayed_batch_is_dropped(tmp_path):
    """commit() with an already-present batch marker discards the rewritten
    temp files — the exactly-once guarantee under batch replay."""
    import os

    out = str(tmp_path / "sink2")
    w = pyds._JsonlCommitWriter({"path": out})
    os.makedirs(out)

    def fake_file(content: str) -> pyds._FileCommit:
        p = os.path.join(out, f"_tmp-{content}.jsonl")
        with open(p, "w") as f:
            f.write('{"x": 1}\n')
        return pyds._FileCommit(p, 1)

    w.commit([fake_file("a")], batchId=7)
    committed = [n for n in os.listdir(out) if n.startswith("batch-")]
    assert len(committed) == 1
    # replay of batch 7: marker exists -> temp dropped, nothing new renamed
    w.commit([fake_file("b")], batchId=7)
    assert [n for n in os.listdir(out) if n.startswith("batch-")] == committed
    assert not [n for n in os.listdir(out) if n.startswith("_tmp-")]
