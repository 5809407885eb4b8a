"""WARC (Web ARChive) ingestion — the entry format of web-crawl corpora
(Common Crawl ships WARC/WET), i.e. the canonical first mile of a 100 TB
LLM training-data pipeline. The reference ingests only PDF/PPTX
(`rag_search/vector_db.py:195-223`); this extends the same
binaryFile-scan → Arrow-parse pattern (sources/ingest.py) to crawl data.

Stdlib-only parser (no warcio in this container): WARC/1.0 records are
`version line + CRLF headers + CRLF CRLF + Content-Length payload +
CRLF CRLF`. Gzipped WARCs are per-record gzip MEMBERS concatenated —
stdlib `gzip.decompress` handles multi-member streams, so `.warc.gz`
needs no special casing beyond one decompress call.

Scale shape: one WARC file = one scan row = one parse task (files are
the natural ~1 GB parallelism unit of crawl dumps; 100 TB ≈ 100k files
spread across executors). The parser is a generator over byte offsets —
no per-record re-scan, no regex over the whole archive. HTTP response
headers are split off the payload so downstream text extraction sees the
body only.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream, SALVAGING the
    complete members before any torn/corrupt one — a partially-uploaded
    .warc.gz must degrade to its intact prefix, not abort the job."""
    import zlib

    out, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            # one unbounded decompress() consumes the whole member
            # (unconsumed_tail only populates under max_length-bounded
            # calls, so no drain loop is needed)
            out.append(d.decompress(data[pos:]))
        except zlib.error:
            break  # torn member: keep what decompressed so far
        if not d.eof:
            break  # stream ended mid-member
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record. Tolerant of trailing garbage and
    truncated tails (a torn record OR torn gzip member ends the file, it
    does not raise — crawl dumps contain both; quarantine-by-skip
    mirrors ingest.py)."""
    if data[:2] == b"\x1f\x8b":  # gzip (possibly multi-member)
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        hdr = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdr[k.strip().lower()] = v.strip()
        try:
            length = int(hdr.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            # negative Content-Length would move the cursor BACKWARDS
            # (pos = head_end + 4 + length) and re-parse the same record
            # forever — treat like any other malformed record: stop here
            return
        payload = data[head_end + 4 : head_end + 4 + length]
        if len(payload) < length:  # torn tail
            return
        pos = head_end + 4 + length
        http_status = None
        if payload[:5] == b"HTTP/":  # response record: strip HTTP headers
            http_end = payload.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line = payload[:http_end].split(b"\r\n", 1)[0]
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    http_status = int(parts[1])
                payload = payload[http_end + 4 :]
        yield {
            "record_id": hdr.get("warc-record-id", ""),
            "warc_type": hdr.get("warc-type", ""),
            "target_uri": hdr.get("warc-target-uri"),
            "warc_date": hdr.get("warc-date"),
            "content_type": hdr.get("content-type"),
            "http_status": http_status,
            "payload": payload,
        }


def read_warc(
    spark: SparkSession, path: str, *, record_types: tuple = ("response",)
) -> DataFrame:
    """binaryFile scan over WARC(.gz) files → one row per record of the
    requested types. Same quarantine philosophy as sources/ingest.py:
    malformed records are skipped by the tolerant parser, never fatal."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
        .load(path)
    )
    return _parse_files_to_records(files, record_types)


def warc_text(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Crude HTML→text for WET-style extraction: drop script/style blocks,
    strip tags, collapse whitespace — pure JVM expressions (codegen), no
    Python in the hot path. Real pipelines swap in trafilatura/justext as
    an Arrow UDF slot; this keeps the correctness path deterministic."""
    html = F.col(payload_col).cast("string")
    no_blocks = F.regexp_replace(
        html, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    no_tags = F.regexp_replace(no_blocks, r"<[^>]+>", " ")
    return df.withColumn(
        "text", F.trim(F.regexp_replace(no_tags, r"\s+", " "))
    )


def _parse_files_to_records(files_df: DataFrame, record_types: tuple) -> DataFrame:
    """The shared binaryFile → WARC-record stage (batch and streaming
    input frames both accept the same mapInPandas)."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(content)):
                    if rec["warc_type"] in record_types:
                        rec["warc_file"] = path_
                        rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files_df.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def warc_stream(
    spark: SparkSession,
    folder: str,
    store_path: str,
    checkpoint_path: str,
    *,
    record_types: tuple = ("response",),
    max_files_per_trigger: int | None = None,
) -> None:
    """Continuous crawl ingestion: the streaming twin of `read_warc` —
    WARC files ARRIVING in `folder` parse incrementally (file-source
    checkpoint remembers processed archives; `max_files_per_trigger` is
    the backpressure valve) and records append to the parquet store with
    the extracted text column. Same parse stage as batch (one code path,
    two execution modes — the engine-wide streaming rule). Replayed
    micro-batches re-append the same records; dedup downstream on
    record_id (content identity), as with ingest_stream."""
    # streaming sources require an explicit schema: binaryFile's is fixed
    binary_file_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(folder)
    records = warc_text(_parse_files_to_records(files, record_types))
    q = (
        records.writeStream.format("parquet")
        .option("path", store_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
