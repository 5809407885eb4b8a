"""WARC ingestion (sources/warc.py): synthetic archives round-trip through
the binaryFile → Arrow-parse path, gzipped and plain, with HTTP header
stripping, record-type filtering, torn-tail tolerance, and the
HTML→text extraction stage."""

from __future__ import annotations

import gzip

from vector_database_app_spark.sources import warc as W


def _record(rtype: str, uri: str, payload: bytes, rid: str) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n".encode()
        + body
    )


HTML_A = b"<html><head><style>p{color:red}</style></head><body><h1>Fast Spark</h1><p>join merge sort</p><script>var x=1;</script></body></html>"
HTML_B = b"<html><body>window batch <b>stream</b></body></html>"


def _archive() -> bytes:
    return (
        _record("warcinfo", "", b"software: synthetic\r\n", "info-1")
        + _record("response", "http://a.example/x", _http(HTML_A), "a-1")
        + _record("response", "http://b.example/y", _http(HTML_B, 301), "b-1")
        + _record("request", "http://a.example/x", b"GET /x HTTP/1.1\r\n", "req-1")
    )


def test_parse_warc_records_plain_and_gzip():
    recs = list(W.parse_warc_records(_archive()))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "response", "request",
    ]
    assert recs[1]["target_uri"] == "http://a.example/x"
    assert recs[1]["http_status"] == 200
    assert recs[2]["http_status"] == 301
    assert recs[1]["payload"] == HTML_A  # HTTP headers stripped
    # multi-member gzip (per-record members, the Common Crawl layout)
    gz = b"".join(
        gzip.compress(_record("response", f"http://m{i}.example", _http(HTML_B), f"m-{i}"))
        for i in range(3)
    )
    assert len(list(W.parse_warc_records(gz))) == 3


def test_parse_tolerates_torn_tail():
    data = _archive() + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\ntruncated"
    recs = list(W.parse_warc_records(data))
    assert len(recs) == 4  # torn record dropped, earlier ones kept


def test_read_warc_end_to_end(spark, tmp_path):
    (tmp_path / "crawl").mkdir()
    (tmp_path / "crawl" / "part-0.warc").write_bytes(_archive())
    (tmp_path / "crawl" / "part-1.warc.gz").write_bytes(
        gzip.compress(_record("response", "http://c.example/z", _http(HTML_A), "c-1"))
    )
    df = W.read_warc(spark, str(tmp_path / "crawl"))
    pdf = W.warc_text(df).toPandas()
    assert len(pdf) == 3  # responses only; warcinfo/request filtered
    assert set(pdf["target_uri"]) == {
        "http://a.example/x", "http://b.example/y", "http://c.example/z",
    }
    a = pdf[pdf["target_uri"] == "http://a.example/x"].iloc[0]
    assert a["text"] == "Fast Spark join merge sort"  # style+script dropped
    b = pdf[pdf["target_uri"] == "http://b.example/y"].iloc[0]
    assert b["text"] == "window batch stream"
    assert (pdf["http_status"].isin([200, 301])).all()


def test_warc_to_corpus_pipeline_composes(spark, tmp_path):
    """Crawl → text → language-ID composes directly: warc_text output
    plugs into the textops surface with a doc_id stamped from the record
    id — the first mile of the corpus admission DAG runs off a WARC
    directory unchanged."""
    import gzip as _gz

    from pyspark.sql import functions as F

    from vector_database_app_spark.operators import textops

    (tmp_path / "crawl").mkdir()
    body = b"<html><body>the fast join and the sort of the merge</body></html>"
    (tmp_path / "crawl" / "p.warc.gz").write_bytes(
        _gz.compress(_record("response", "http://en.example/", _http(body), "en-1"))
    )
    docs = (
        W.warc_text(W.read_warc(spark, str(tmp_path / "crawl")))
        .select(
            F.xxhash64("record_id").alias("doc_id"),
            "text",
        )
    )
    out = textops.language_id(docs).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["lang_pred"] == "en"


def test_warc_stream_incremental(spark, tmp_path):
    """Streaming twin: archives arriving over two triggers land in the
    parquet store incrementally; a re-run with the same checkpoint adds
    nothing (file-source exactly-once over unchanged inputs)."""
    import gzip as _gz

    src = tmp_path / "arrivals"; src.mkdir()
    store = str(tmp_path / "store"); ckpt = str(tmp_path / "ckpt")
    (src / "a.warc").write_bytes(
        _record("response", "http://a.example/", _http(HTML_A), "a-1")
    )
    W.warc_stream(spark, str(src), store, ckpt)
    assert spark.read.parquet(store).count() == 1
    (src / "b.warc.gz").write_bytes(
        _gz.compress(_record("response", "http://b.example/", _http(HTML_B), "b-1"))
    )
    W.warc_stream(spark, str(src), store, ckpt)
    pdf = spark.read.parquet(store).toPandas()
    assert sorted(pdf["target_uri"]) == ["http://a.example/", "http://b.example/"]
    assert "text" in pdf.columns
    # unchanged inputs -> third run is a no-op
    W.warc_stream(spark, str(src), store, ckpt)
    assert spark.read.parquet(store).count() == 2


def test_parse_salvages_torn_gzip_member():
    """A partially-uploaded .warc.gz degrades to its intact gzip members
    instead of aborting (EOFError/BadGzipFile would fail the whole
    ingest task)."""
    import gzip as _gz

    good = _gz.compress(_record("response", "http://ok.example/", _http(HTML_B), "ok-1"))
    torn = _gz.compress(_record("response", "http://torn.example/", _http(HTML_A), "t-1"))[:40]
    recs = list(W.parse_warc_records(good + torn))
    assert [r["target_uri"] for r in recs] == ["http://ok.example/"]


def test_parse_rejects_negative_content_length():
    """A negative Content-Length must END parsing (torn/adversarial
    record), not move the cursor backwards: length == -(header+4) makes
    `pos = head_end + 4 + length` land back on the record start, and the
    generator would re-yield the same record forever (advisor repro)."""
    good = _record("response", "http://a.example/x", _http(HTML_A), "a-1")
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:neg-1>\r\n"
    )
    # craft length so head_end + 4 + length == record start (infinite loop
    # pre-fix); any negative value must stop the parse
    base = len(head) + len(b"Content-Length: -12345") + 4  # header + CRLFCRLF
    evil = head + (b"Content-Length: -%05d\r\n\r\n" % base)
    recs = list(W.parse_warc_records(good + evil))
    # parse terminates, keeping the intact record before the malformed one
    assert [r["record_id"] for r in recs] == ["<urn:uuid:a-1>"]
