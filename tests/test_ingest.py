"""End-to-end ingest pipeline tests: scan → parse → dedup → embed → store.

Mirrors the reference's ingestion smoke flow (notebooks cell 3:
vectorize_folder over a sample dir) with a tmp corpus: real .txt/.md
parsing, quarantine rows for formats whose parser libs are absent, and
idempotent re-ingest via the file-hash anti-join.
"""

from __future__ import annotations

import math

import pytest

from vector_database_app_spark.sources import ingest


@pytest.fixture()
def corpus(tmp_path):
    # the store must live OUTSIDE the scanned folder, or the recursive
    # binaryFile scan would re-ingest the store's own parquet files
    root = tmp_path / "corpus"
    root.mkdir()
    words = " ".join(f"w{i}" for i in range(150))
    (root / "a.txt").write_text(words)
    (root / "sub").mkdir()
    (root / "sub" / "b.md").write_text("short note about spark ingest")
    # duplicate content under a different name -> dedup_within_batch drops it
    (root / "copy_of_a.txt").write_text(words)
    # parser-library-gated format -> quarantine row
    (root / "deck.pdf").write_bytes(b"%PDF-1.4 fake body")
    # no parser registered -> quarantine row
    (root / "blob.xyz").write_bytes(b"\x00\x01\x02")
    return root


def test_ingest_folder_end_to_end(spark, corpus, tmp_path):
    store = str(tmp_path / "chunks_store")
    out = ingest.ingest_folder(spark, str(corpus), store)
    rows = out.collect()

    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.content_type, []).append(r)

    # a.txt = 150 words -> 3 chunks of 64/64/22; b.md -> 1 chunk; the copy
    # deduped within the batch (same sha256)
    assert len(by_type["text_chunk"]) == 4
    # pdf (lib missing) + xyz (no parser) quarantined as rows, not lost
    errors = {r.doc_name.rsplit("/", 1)[-1]: r.error for r in by_type["error"]}
    assert set(errors) == {"deck.pdf", "blob.xyz"}
    assert "pymupdf" in errors["deck.pdf"]
    assert "no parser" in errors["blob.xyz"]

    # chunking matches the expression twin exactly
    texts = sorted(
        r.content_raw for r in by_type["text_chunk"] if "a.txt" in r.doc_name
    )
    expected = sorted(
        c.strip() for c in ingest._chunk_words(" ".join(f"w{i}" for i in range(150)))
    )
    assert texts == expected

    # embeddings: unit-norm, tagged with the space id
    for r in by_type["text_chunk"]:
        assert r.embedding_space == "hash-64"
        n = math.sqrt(sum(x * x for x in r.embedding))
        assert abs(n - 1.0) < 1e-5
    for r in by_type["error"]:
        assert r.embedding is None

    # file provenance columns present and sane
    assert all(len(r.file_hash) == 64 for r in rows)
    assert all(r.timestamp is not None for r in rows)

    # idempotency: re-running the same folder appends nothing
    before = spark.read.parquet(store).count()
    again = ingest.ingest_folder(spark, str(corpus), store)
    assert again.count() == 0
    assert spark.read.parquet(store).count() == before

    # a new file (and only it) lands on the next run
    (corpus / "c.txt").write_text("fresh new content never seen")
    third = ingest.ingest_folder(spark, str(corpus), store)
    assert [r.doc_name.rsplit("/", 1)[-1] for r in third.collect()] == ["c.txt"]
    assert spark.read.parquet(store).count() == before + 1


def test_chunk_words_python_expr_parity(spark):
    from pyspark.sql import functions as F

    samples = [
        "",
        "one",
        " ".join(f"t{i}" for i in range(64)),
        " ".join(f"t{i}" for i in range(65)),
        "a  b   c",  # runs of spaces -> empty tokens kept by both paths
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [
        r.chunks
        for r in df.select(
            ingest.chunk_words_expr("text", 64, 0).alias("chunks")
        ).collect()
    ]
    want = [ingest._chunk_words(s, 64, 0) for s in samples]
    assert got == want
