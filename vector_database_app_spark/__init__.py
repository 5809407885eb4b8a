"""vector_database_app_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the reference `totogot/vector_database_app`
(a pandas-backed multimodal RAG vector database), rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession factory with scale-tuned defaults.
- ``schemas``    : explicit StructTypes for every table (reference SURVEY §1.1
                   had implicit dict schemas; we declare once, enforce on write).
- ``sources``    : parquet catalog + binaryFile ingestion pipeline (reference
                   `rag_search/vector_db.py:163-229` folder/file vectorizers).
- ``functions``  : column-expression libraries (vector math, text, hashing,
                   json) — the reference's per-row Python functions
                   (`rag_search/vector_db.py:420-606`) as JVM-side expressions.
- ``operators``  : DataFrame -> DataFrame operators (search, dedup, relational,
                   text analysis, multimodal, RAG tail).
- ``plans``      : plan-introspection helpers (assert pushdown/broadcast).
- ``streaming``  : Structured Streaming surface over the events table.

Design stance (SURVEY §7.0): tables + pure functions over DataFrames; no
mutable singleton; embeddings normalized at write so cosine == dot; every
operator written for a 1000-executor / 100 TB deployment and tested on
local[32].
"""

__version__ = "0.1.0"
