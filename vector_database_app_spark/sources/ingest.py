"""Ingest pipeline: binaryFile scan → parse/chunk → dedup → embed → parquet.

Re-expression of the reference's ingestion entry points (SURVEY §3.2):

- ``vectorize_folder`` (`rag_search/vector_db.py:163-178`) — serial rglob +
  per-file loop, exceptions printed and swallowed → here a distributed
  ``binaryFile`` scan; per-file failures become quarantine ROWS (content_type
  'error'), never prints, never lost.
- ``vectorize_file`` dispatch (`:180-229`) — extension routing with a dedup
  probe first (`:188-190`) → here a parser table keyed by extension inside
  one Arrow-batched ``mapInPandas`` stage, with set-based anti-join dedup on
  the file hash BEFORE the expensive parse+embed work, same ordering as the
  reference.
- ``embed_pdf`` / ``embed_pptx`` (`:247-342`, `:344-418`) — PyMuPDF /
  python-pptx extraction when installed; otherwise stdlib fallback
  extractors (``fallback_parsers.py``: zlib'd content streams for PDF,
  zip+XML for PPTX) keep real rows flowing — the reference's shipped
  sample corpus parses end-to-end in this container. Unparseable files
  become quarantine rows. Plain-text formats (.txt/.md) parse natively.
- ``_save_vector_db`` pickles (`:231-238`) → schema-enforced parquet
  partitioned by ``doc_type``.

Scale notes: the scan is embarrassingly parallel (one task per file split;
`spark.sql.files.maxPartitionBytes` bounds task input). Parsing and
embedding are shuffle-free map stages. The only shuffle is the anti-join on
``file_hash`` — uniform by construction, broadcastable when the incoming
batch is small. Writes append; idempotency comes from the hash dedup, so a
re-run of the same folder adds zero rows.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.embed import (
    CLIP_STUB_SPACE,
    clip_stub_image_embed,
    embedding_space_tag,
    hash_embed_udf,
)

#: words per chunk / overlap for the fixed word-window chunker. 64-word
#: chunks ≈ the reference's per-block granularity (PDF text blocks).
CHUNK_WORDS = 64
CHUNK_OVERLAP = 0

#: Output of the parse stage: the CHUNKS schema minus embedding columns,
#: plus a quarantine column. (`schemas.CHUNKS` adds embedding/space.)
PARSED_SCHEMA = T.StructType(
    [
        T.StructField("doc_name", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("page_num", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_id", T.StringType()),
        T.StructField("content_raw", T.StringType()),
        T.StructField("content_bytes", T.BinaryType()),
        T.StructField("bbox", T.ArrayType(T.DoubleType())),
        T.StructField("file_hash", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("error", T.StringType()),
    ]
)


class ParserUnavailable(RuntimeError):
    """A format's parser library is not installed on the executors."""


def scan_binary_files(spark: SparkSession, folder: str) -> DataFrame:
    """Recursive binary scan (reference `Path.rglob`, vector_db.py:164-165).
    Columns: path, modificationTime, length, content."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(folder)
    )


def with_file_meta(files: DataFrame) -> DataFrame:
    """Stamp doc_name (POSIX string — the reference kept pathlib.Path
    objects, unreadable cross-OS), extension, sha256 file hash (F10,
    vector_db.py:420-429) and mtime timestamp (F11, `:436-442`, free from
    the binaryFile source)."""
    return files.select(
        F.col("path").alias("doc_name"),
        F.lower(F.regexp_extract("path", r"\.([A-Za-z0-9]+)$", 1)).alias("ext"),
        F.sha2("content", 256).alias("file_hash"),
        F.col("modificationTime").alias("timestamp"),
        F.col("content"),
    )


# ---------------------------------------------------------------------------
# Per-format parsers (run inside the mapInPandas stage, one file per row)
# ---------------------------------------------------------------------------


def _chunk_words(
    text: str, n_words: int = CHUNK_WORDS, overlap: int = CHUNK_OVERLAP
) -> list[str]:
    """Fixed word-window chunking — EXACT python mirror of
    `chunk_words_expr` below (split on single spaces keeping empties, 1-based
    windows of n stepping n-overlap) so the UDF path and the expression path
    produce identical chunks."""
    w = text.split(" ")
    step = n_words - overlap
    return [
        " ".join(w[s : s + n_words]) for s in range(0, max(len(w) - overlap, 1), step)
    ]


def _parse_text(doc_name: str, data: bytes) -> Iterator[dict]:
    """.txt/.md: utf-8 decode, word-window chunks, single page 0. The real
    production analogue of the reference's text path (strip per chunk,
    vector_db.py:269)."""
    text = data.decode("utf-8", errors="replace")
    for i, chunk in enumerate(_chunk_words(text)):
        yield {
            "page_num": 0,
            "content_type": "text_chunk",
            "content_id": str(i),
            "content_raw": chunk.strip(),
            "content_bytes": None,
            "bbox": None,
        }


def _parse_pdf(doc_name: str, data: bytes) -> Iterator[dict]:
    """PDF via PyMuPDF when installed (reference `embed_pdf`,
    vector_db.py:247-342: per-page text blocks with bbox + images with
    bbox). Without the lib, the stdlib fallback extractor recovers the
    same pages' text (word-window chunk granularity, no bbox/images —
    see fallback_parsers.py); files neither can read become quarantine
    rows."""
    try:
        import fitz  # type: ignore[import-not-found]
    except ImportError:
        # Degraded stdlib path (see fallback_parsers module docstring):
        # same pages and words, word-window chunk granularity instead of
        # PyMuPDF layout blocks, no image extraction, bbox unavailable.
        from . import fallback_parsers

        for page_num, page_text in enumerate(fallback_parsers.pdf_pages_text(data)):
            for i, chunk in enumerate(_chunk_words(page_text)):
                if chunk.strip():
                    yield {
                        "page_num": page_num,
                        "content_type": "text_chunk",
                        "content_id": f"fb-{i}",
                        "content_raw": chunk.strip(),
                        "content_bytes": None,
                        "bbox": None,
                    }
        return
    doc = fitz.open(stream=data, filetype="pdf")
    for page_num, page in enumerate(doc):
        for block in page.get_text("blocks"):
            x0, y0, x1, y1, text, block_no = block[:6]
            if text.strip():
                yield {
                    "page_num": page_num,
                    "content_type": "text_chunk",
                    "content_id": str(block_no),
                    "content_raw": text.strip(),
                    "content_bytes": None,
                    "bbox": [float(x0), float(y0), float(x1), float(y1)],
                }
        for img in page.get_images(full=True):
            xref = img[0]
            pix = doc.extract_image(xref)
            bbox = page.get_image_bbox(img)
            yield {
                "page_num": page_num,
                "content_type": "image",
                "content_id": str(xref),
                "content_raw": None,
                "content_bytes": pix["image"],
                "bbox": [bbox.x0, bbox.y0, bbox.x1, bbox.y1],
            }


def _parse_pptx(doc_name: str, data: bytes) -> Iterator[dict]:
    """PPTX via python-pptx when installed (reference `embed_pptx`,
    vector_db.py:344-418: per-slide text shapes + picture shapes, bbox in
    EMU → normalized to double here). Without the lib, the stdlib
    zip+XML fallback extracts the same shapes (near-parity — see
    fallback_parsers.py)."""
    try:
        import io

        from pptx import Presentation  # type: ignore[import-not-found]
        from pptx.enum.shapes import MSO_SHAPE_TYPE  # type: ignore[import-not-found]
    except ImportError:
        # Degraded stdlib path: zip+XML extraction, near-parity with
        # python-pptx for the shapes the reference emits (text frames +
        # pictures with EMU bbox) — see fallback_parsers module docstring.
        from . import fallback_parsers

        yield from fallback_parsers.pptx_shapes(data)
        return
    prs = Presentation(io.BytesIO(data))
    for slide_num, slide in enumerate(prs.slides):
        for shape in slide.shapes:
            bbox = [
                float(shape.left or 0),
                float(shape.top or 0),
                float((shape.left or 0) + (shape.width or 0)),
                float((shape.top or 0) + (shape.height or 0)),
            ]
            if shape.has_text_frame and shape.text.strip():
                yield {
                    "page_num": slide_num,
                    "content_type": "text_chunk",
                    "content_id": str(shape.shape_id),
                    "content_raw": shape.text.strip(),
                    "content_bytes": None,
                    "bbox": bbox,
                }
            elif shape.shape_type == MSO_SHAPE_TYPE.PICTURE:
                yield {
                    "page_num": slide_num,
                    "content_type": "image",
                    "content_id": str(shape.shape_id),
                    "content_raw": None,
                    "content_bytes": shape.image.blob,
                    "bbox": bbox,
                }


#: Extension → parser (reference dispatch at vector_db.py:195-223).
PARSERS: dict[str, Callable[[str, bytes], Iterator[dict]]] = {
    "txt": _parse_text,
    "md": _parse_text,
    "pdf": _parse_pdf,
    "pptx": _parse_pptx,
}


def parse_chunks(files: DataFrame) -> DataFrame:
    """Arrow-batched parse stage: one input row per file (from
    `with_file_meta`), output rows per chunk in PARSED_SCHEMA. Unknown
    extensions and parser failures emit one quarantine row each
    (content_type='error', `error` says why) — the reference printed and
    swallowed these (`:171-173`, `:222-223`; quirk §2.9.6)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.itertuples(index=False):
                base = {
                    "doc_name": row.doc_name,
                    "doc_type": row.ext,
                    "file_hash": row.file_hash,
                    "timestamp": row.timestamp,
                }
                parser = PARSERS.get(row.ext)
                try:
                    if parser is None:
                        raise ParserUnavailable(
                            f"no parser for extension {row.ext!r}"
                        )
                    chunks = list(parser(row.doc_name, bytes(row.content)))
                    if not chunks:
                        raise ValueError("file produced no content")
                    for c in chunks:
                        out.append({**base, "error": None, **c})
                except Exception as e:  # noqa: BLE001 - quarantine, don't fail the job
                    out.append(
                        {
                            **base,
                            "page_num": -1,
                            "content_type": "error",
                            "content_id": "",
                            "content_raw": None,
                            "content_bytes": None,
                            "bbox": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in PARSED_SCHEMA.fields]
            )

    return files.mapInPandas(run, PARSED_SCHEMA)


# ---------------------------------------------------------------------------
# Expression-side chunker (oracle-checkable twin of _chunk_words)
# ---------------------------------------------------------------------------


def chunk_words_expr(
    text: Column | str,
    n_words: int = CHUNK_WORDS,
    overlap: int = CHUNK_OVERLAP,
) -> Column:
    """array<string> of fixed word-window chunks, as pure expressions (for
    chunking text already in a table — no Python round-trip). 1-based
    `sequence` starts stepping (n-overlap); `slice` truncates the tail
    window. Exact twin of `_chunk_words` and of the DuckDB
    `generate_series + list_slice` formulation used by the oracle."""
    c = F.col(text) if isinstance(text, str) else text
    w = F.split(c, " ")
    step = n_words - overlap
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(w) - F.lit(overlap), F.lit(1)), F.lit(step)
    )
    return F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(w, s, n_words))
    )


# ---------------------------------------------------------------------------
# Dedup / embed / sink stages
# ---------------------------------------------------------------------------


def dedup_within_batch(files: DataFrame) -> DataFrame:
    """Keep one file per content hash inside the incoming batch (first by
    path — deterministic). The reference gets this implicitly because it
    ingests serially and probes after each file (vector_db.py:188-190)."""
    w = Window.partitionBy("file_hash").orderBy("doc_name")
    return (
        files.withColumn("_rk", F.row_number().over(w))
        .filter("_rk = 1")
        .drop("_rk")
    )


def dedup_against_store(files: DataFrame, existing: DataFrame) -> DataFrame:
    """Anti-join incoming files against the store's file hashes BEFORE
    parse/embed (same ordering as the reference's probe-then-embed,
    vector_db.py:188-190). Runs on file metadata, so the expensive stages
    never see already-ingested bytes."""
    return files.join(
        existing.select("file_hash").distinct(), "file_hash", "left_anti"
    )


def embed_chunks(
    chunks: DataFrame, dim: int = 64, text_backend=None
) -> DataFrame:
    """Attach embeddings at write time (normalized — the engine's
    cosine==dot invariant): text rows via the selected text backend
    (default: the deterministic hash embedder, space `hash-<dim>` — the
    only backend on the correctness path), image rows via the CLIP-stub
    image tower (space `clipstub-32`, shared with the stub text tower so
    cross-modal search works, mirroring the reference's paired CLIP
    encoders, vector_db.py:716-722). Quarantine rows keep NULL embeddings.
    Output matches `schemas.CHUNKS` + the quarantine column.

    `text_backend` selects a real-model slot from functions.backends
    (reference F1/F2 — 'openai-text-embedding-3-small', 'local-bge-base'):
    a registry name (str) or a ready `TextEmbedBackend` instance (e.g. a
    corpus-trained Word2Vec backend): same plan shape, same schema,
    different vectors + space tag."""
    is_text = F.col("content_type") == "text_chunk"
    is_image = F.col("content_type") == "image"
    if text_backend is None or text_backend == "hash":
        text_embed = hash_embed_udf(F.col("content_raw"), dim)
        text_space = embedding_space_tag(dim)
    else:
        from ..functions.backends import (
            TextEmbedBackend,
            resolve_text_backend,
        )

        backend = (
            text_backend
            if isinstance(text_backend, TextEmbedBackend)
            else resolve_text_backend(text_backend)
        )
        text_embed = backend(F.col("content_raw"))
        text_space = backend.space
    return chunks.select(
        "doc_name",
        "doc_type",
        "page_num",
        "content_type",
        "content_id",
        "content_raw",
        "content_bytes",
        F.when(is_text, text_embed)
        .when(is_image, clip_stub_image_embed(F.col("content_bytes")))
        .otherwise(F.lit(None))
        .alias("embedding"),
        F.when(is_text, F.lit(text_space))
        .when(is_image, F.lit(CLIP_STUB_SPACE))
        .otherwise(F.lit(None))
        .alias("embedding_space"),
        "file_hash",
        "timestamp",
        "bbox",
        "error",
    )


def write_chunks(chunks: DataFrame, store_path: str, mode: str = "append") -> None:
    """Parquet sink partitioned by doc_type (replaces the two pickles,
    vector_db.py:231-238; text/image separation becomes partition pruning)."""
    chunks.write.mode(mode).partitionBy("doc_type").parquet(store_path)


def load_chunks(spark: SparkSession, store_path: str) -> DataFrame | None:
    """Open the chunk store; None when absent (the reference degrades to an
    EMPTY ZERO-COLUMN frame there, vector_db.py:160-161 — a schema-drift
    trap we don't replicate)."""
    if not os.path.isdir(store_path):
        return None
    return spark.read.parquet(store_path)


def ingest_folder(
    spark: SparkSession,
    folder: str,
    store_path: str | None = None,
    *,
    dim: int = 64,
    text_backend=None,
) -> DataFrame:
    """End-to-end ingest (reference `vectorize_folder`, vector_db.py:163-178):
    scan → meta/hash → batch dedup → anti-join vs store → parse → embed
    [→ append to store]. Returns the NEW chunk rows. Idempotent: a second
    run over the same folder appends nothing.

    `text_backend` is forwarded to `embed_chunks` (name or instance); a
    CALLABLE that is not itself a backend is treated as a factory
    ``parsed_chunks -> TextEmbedBackend`` — the hook corpus-trained models
    (Word2Vec) need: the factory sees the parsed text rows, trains/loads,
    and the returned backend embeds those same rows. With a store_path
    the parsed rows are persisted around the train+embed double scan
    (released after the write); WITHOUT a store_path the caller owns
    materialization, so the embed pass re-reads the source files —
    training and embedding see the same data only while the files don't
    change between this call and the caller's action (the caveat every
    lazy plan over mutable files carries)."""
    files = dedup_within_batch(with_file_meta(scan_binary_files(spark, folder)))
    existing = load_chunks(spark, store_path) if store_path else None
    if existing is not None:
        files = dedup_against_store(files, existing)
    parsed = parse_chunks(files)
    from ..functions.backends import TextEmbedBackend

    factory_given = callable(text_backend) and not isinstance(
        text_backend, TextEmbedBackend
    )
    # Persist ONLY when a factory will train AND the pipeline
    # materializes inside this function (store branch): training reads
    # the text rows and the write reads them again, so the cache pays
    # for itself and is released in the finally below. In the
    # no-store branch the caller owns materialization — persisting here
    # would leak cached blocks for the session (advisor r3 finding);
    # the factory's training pass just re-parses (two scans, no leak).
    pinned = factory_given and store_path is not None
    if pinned:
        parsed = parsed.persist()
    if factory_given:
        text_backend = text_backend(parsed)
    if store_path is not None:
        try:
            # pin THIS batch's hash list before writing: the readback
            # semi-join below must not re-run the scan/parse pipeline
            # (and a file changing on disk between two scans would
            # otherwise make the returned rows disagree with what was
            # written)
            batch_hashes = files.select("file_hash").localCheckpoint(
                eager=True
            )
            chunks = embed_chunks(parsed, dim, text_backend)
            write_chunks(chunks, store_path)
        finally:
            if pinned:
                parsed.unpersist()
        return spark.read.parquet(store_path).join(
            batch_hashes, "file_hash", "left_semi"
        )
    return embed_chunks(parsed, dim, text_backend)


def ingest_stream(
    spark: SparkSession,
    folder: str,
    store_path: str,
    checkpoint_path: str,
    *,
    dim: int = 64,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Continuous ingestion: the Structured Streaming twin of
    ``ingest_folder`` — S1 as a file-ARRIVAL stream instead of a rescan.
    The reference has no incremental story at all: `vectorize_folder`
    re-walks the whole tree and re-probes every file's hash per run
    (vector_db.py:163-190); here the file-source checkpoint remembers
    processed files, so each trigger touches only NEW arrivals.

    Shape: ``readStream.format("binaryFile")`` (same options as the batch
    scan) → ``foreachBatch`` running the UNCHANGED batch stages —
    meta/hash → within-batch dedup (window — legal on the micro-batch,
    not on an unbounded stream) → anti-join vs store → parse → embed →
    append. One code path, two execution modes, like every other
    streaming operator in this engine (streaming/windows.py).

    Delivery semantics: the checkpoint gives at-least-once batch replay
    after a crash mid-write; the content-hash anti-join inside the batch
    turns replays into no-ops (REPLACED files under a same name re-ingest
    — content identity, not path identity, is the dedup key). That is
    exactly-once EFFECT without a transactional sink.

    Scale notes: file listing per trigger is the known cost of file
    streams at 100 TB — bound it with ``max_files_per_trigger`` (a
    backpressure knob, splits a backlog into pipelined micro-batches)
    and compact the store separately. The parse/embed stages are the
    same shuffle-free map stages as the batch path.

    Returns the started StreamingQuery (caller awaits/stops it).
    """
    # streaming file sources require an explicit schema; binaryFile's is
    # fixed by the format
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(folder)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        b = dedup_within_batch(with_file_meta(batch_df))
        existing = load_chunks(batch_df.sparkSession, store_path)
        if existing is not None:
            b = dedup_against_store(b, existing)
        write_chunks(embed_chunks(parse_chunks(b), dim), store_path)

    writer = (
        files.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
