"""Drop-in user facade: the reference's `VectorDatabase` class surface
(`rag_search/vector_db.py:27-671` — constructor, `vectorize_file`,
`vectorize_folder`, `run_search`) re-expressed over the Spark engine, so a
user of the reference can run their existing notebook script
(`Execute Vector_DB - Local.ipynb` cells 2-8: initialize → vectorize a
folder → scoped text searches → text+image search) against this repo
unchanged in shape.

Differences by design (SURVEY §1.4 / §2.9 normalizations):

- State is a PARQUET chunk store under ``save_dir`` (one unified table with
  a ``content_type`` discriminator), not two pickles; re-opening is a scan,
  and every query is a lazy DataFrame plan until `run_search` collects the
  (tiny) response dict.
- Per-file failures quarantine into rows with ``content_type='error'``
  instead of being printed and swallowed (quirk §2.9.6).
- Ingest is idempotent by file hash (anti-join against the store BEFORE the
  embed stage — same probe-then-embed ordering as the reference's
  `file_already_processed`, vector_db.py:431-434).
- Model slots: the deterministic hash/clipstub embedders and the stub
  generator are the defaults (the correctness path); the reference's model
  names route to the same backend registry the engine uses everywhere
  (`functions.backends`, `functions.llm_backends`).

`run_search` returns the reference's exact response shape:
``{"response": str, "sources": [ {doc_name, page_num, content_type,
content_id, content_raw}, ... ]}`` (vector_db.py:671, :903-916).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.llm_backends import GEN_BACKENDS
from .operators import rag
from .sources import ingest

#: reference model names (vector_db.py:40-57 whitelists) accepted by the
#: facade, routed to this engine's backend slots. 'local-hash-64' and
#: 'stub' are the deterministic defaults with no external dependency.
TEXT_EMBED_MODELS = {
    "local-hash-64": None,  # deterministic default (embed_chunks)
    "openai-text-embedding-3-small": "openai-text-embedding-3-small",
    "local-bge-base": "local-bge-base",
}


class VectorDatabase:
    """Spark-backed mirror of the reference's single engine class."""

    def __init__(
        self,
        spark: SparkSession,
        save_dir: str,
        *,
        text_embedding_model: str = "local-hash-64",
        response_model: str = "stub",
        dim: int = 64,
    ) -> None:
        if text_embedding_model not in TEXT_EMBED_MODELS:
            raise ValueError(
                f"unknown text embedding model {text_embedding_model!r}; "
                f"known: {sorted(TEXT_EMBED_MODELS)}"
            )
        if response_model not in GEN_BACKENDS:
            raise ValueError(
                f"unknown response model {response_model!r}; "
                f"known: {sorted(GEN_BACKENDS)}"
            )
        self.spark = spark
        self.save_dir = save_dir
        self.store_path = os.path.join(save_dir, "chunks")
        self.text_embedding_model = text_embedding_model
        self.response_model = response_model
        self.dim = dim
        os.makedirs(save_dir, exist_ok=True)

    # -- ingestion (reference vectorize_file / vectorize_folder) ----------

    def vectorize_file(self, file_path: str) -> int:
        """Reference `vectorize_file` (vector_db.py:180-229): hash → dedup
        probe → parse → embed → append. Returns the number of NEW chunk
        rows (0 when the file hash is already in the store)."""
        return self.vectorize_folder(file_path)

    def vectorize_folder(self, folder_path: str) -> int:
        """Reference `vectorize_folder` (vector_db.py:163-178): recursive
        scan, per-file quarantine instead of swallowed exceptions, ONE
        batched Spark pipeline instead of a serial per-file loop."""
        new_rows = ingest.ingest_folder(
            self.spark, str(folder_path), self.store_path, dim=self.dim
        )
        return new_rows.count()

    # -- state access ------------------------------------------------------

    def chunks(self) -> DataFrame | None:
        """The persisted chunk store as a DataFrame (lazy), or None before
        the first ingest."""
        return ingest.load_chunks(self.spark, self.store_path)

    # -- search (reference run_search) ------------------------------------

    def run_search(
        self,
        search_content: dict,
        search_location: str | None = None,
        top_n: int = 5,
    ) -> dict:
        """Reference `run_search` (vector_db.py:615-671). `search_content`
        is the reference's query dict: ``{"text": str}`` and/or
        ``{"image": [base64, ...]}``. Returns
        ``{"response": str, "sources": [dict, ...]}``."""
        query_text = search_content.get("text")
        images = search_content.get("image") or []
        if query_text is None and not images:
            raise ValueError(
                "search_content needs 'text' and/or 'image' entries"
            )
        chunks = self.chunks()
        if chunks is None:
            # reference: emptiness check at :651-654
            raise RuntimeError("vector database is empty — ingest first")

        query_images = None
        if images:
            query_images = self.spark.createDataFrame(
                [(i, b64) for i, b64 in enumerate(images)],
                "query_id int, b64 string",
            ).select("query_id", F.unbase64("b64").alias("payload"))

        hits = rag.run_search(
            chunks,
            query_text=query_text,
            query_images=query_images,
            top_n=top_n,
            search_location=search_location,
        )
        # the reference produces ONE summary over the fused text+image hits
        # (:666-668) — collapse all modalities into a single prompt
        one_query = hits.withColumn("query_id", F.lit(0))
        prompts = rag.assemble_prompts(one_query)
        answered = rag.answer_prompts(prompts, backend=self.response_model)
        resp_rows = answered.collect()
        response = resp_rows[0].response if resp_rows else ""
        sources = [r.asDict() for r in rag.source_list(hits).collect()]
        return {"response": response, "sources": sources}
