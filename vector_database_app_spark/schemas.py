"""Explicit schemas for every table the engine touches.

The reference has *no* schema declarations — its 10-column row dict is retyped
inline at six insertion sites (`rag_search/vector_db.py:261-275, 289-303,
316-330, 357-368, 378-390, 397-409`) and an absent pickle degrades to a
zero-column frame (`:160-161`). Here schemas are declared once and enforced:
schema drift fails at write time, not at query time.

``CHUNKS`` is the unified replacement for the reference's `text_data` +
`image_data` pair (SURVEY §1.1): one table, a `modality` discriminator, and an
`embedding_space` tag so vectors from different spaces can never be compared
(the reference encodes that invariant only by keeping two separate tables,
`rag_search/vector_db.py:716-722`).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference data model (normalized; SURVEY §1.1 table)
# ---------------------------------------------------------------------------

#: Unified text/image chunk store. Replaces text_data.pkl / image_data.pkl.
CHUNKS = T.StructType(
    [
        # reference `doc_name` was a pathlib.Path (WindowsPath in the shipped
        # pickles) — normalized to a POSIX string.
        T.StructField("doc_name", T.StringType(), nullable=False),
        T.StructField("doc_type", T.StringType(), nullable=False),  # pdf|pptx|txt
        T.StructField("page_num", T.IntegerType(), nullable=False),
        # text_chunk | image | image_caption  (vector_db.py:263/291/318)
        T.StructField("content_type", T.StringType(), nullable=False),
        T.StructField("content_id", T.StringType(), nullable=False),
        # raw text, caption text, or base64 image payload (vector_db.py:265)
        T.StructField("content_raw", T.StringType(), nullable=True),
        # binary payload for true multimodal columns (images/audio/video);
        # NULL for text rows. The reference kept base64 strings only.
        T.StructField("content_bytes", T.BinaryType(), nullable=True),
        # L2-normalized at write (reference normalizes inside every embedder,
        # vector_db.py:460,488,506,525,543) so cosine == dot at query time.
        T.StructField("embedding", T.ArrayType(T.FloatType()), nullable=True),
        # which vector space the embedding lives in — e.g. "text-64",
        # "clip-512". Dotting across spaces is refused at operator entry.
        T.StructField("embedding_space", T.StringType(), nullable=True),
        T.StructField("file_hash", T.StringType(), nullable=False),  # sha256 hex
        T.StructField("timestamp", T.TimestampType(), nullable=True),
        T.StructField("bbox", T.ArrayType(T.DoubleType()), nullable=True),
    ]
)

#: Search requests as data (reference held query state as mutable singleton
#: fields, vector_db.py:625-648 — here a query is a row).
QUERIES = T.StructType(
    [
        T.StructField("query_id", T.LongType(), nullable=False),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("image_b64", T.ArrayType(T.StringType()), nullable=True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), nullable=True),
        T.StructField("embedding_space", T.StringType(), nullable=True),
        T.StructField("search_location", T.StringType(), nullable=True),
        T.StructField("top_n", T.IntegerType(), nullable=False),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided synthetic tables (TESTDATA.md / FIXTURES.md §B)
# ---------------------------------------------------------------------------

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), False),  # JSON string
    ]
)

#: All driver tables, for catalog iteration.
DRIVER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
