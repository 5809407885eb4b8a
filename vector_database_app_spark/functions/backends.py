"""Pluggable embedding backends — the reference's real-model surface
(F1-F6, `rag_search/vector_db.py:451-545`) behind the engine's batch
embedder slot.

Every backend exposes the SAME contract as `functions.embed`: a factory
returning an Arrow-batched pandas UDF `string column -> array<float>`
(L2-normalized — the engine's cosine==dot write invariant), plus the
embedding-space tag its vectors carry so operators keep refusing
cross-space dot products regardless of backend.

The real-model backends construct the model (or API client) ONCE PER
WORKER and reuse it across Arrow batches — a worker-global cache under the
scalar pandas-UDF form, which Spark reuses across tasks
(spark.python.worker.reuse) — the exact fix for the reference's two worst
embedding bugs: one model/API call per string (`:269,297,324`) and the
CLIP text tower re-downloaded on every call (`:496-497,533-534`). Scalar
(not iterator) form deliberately: scalar pandas UDFs sharing an eval type
fuse into ONE ArrowEvalPython stage with the neighboring image embedder,
so every backend produces the identical physical plan. Model libraries
are not installed in this container, so the real backends raise
NotImplementedError inside the task at the precise line the model call
plugs in; the plan/schema around them is real and tested
(tests/test_backends.py swaps backends and proves identical plans and
schemas).

Only the `hash` backend is on the correctness path (deterministic, no
dependencies); selection is explicit or via the Spark conf key
``spark.vector_database_app_spark.embed.backend``.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# the eval type from runtime type hints, and stringified hints break that
# inference (see bench.py warm-up note).

from dataclasses import dataclass
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from .embed import make_text_embed_udf

#: Spark conf key consulted by `from_conf`.
BACKEND_CONF_KEY = "spark.vector_database_app_spark.embed.backend"


@dataclass(frozen=True)
class TextEmbedBackend:
    """One embedding backend: its config name, the space tag its vectors
    live in (operators refuse cross-space dot products), output dimension,
    and the UDF factory."""

    name: str
    space: str
    dim: int
    udf_factory: Callable[[], Callable[..., Column]]
    #: Optional cleanup for executor-side state the backend pinned at
    #: construction (e.g. the Word2Vec vocabulary broadcast) — callers
    #: that REPLACE a backend must call this on the superseded one, or
    #: one broadcast of the full model leaks per version swap.
    release: Callable[[], None] | None = None

    def __call__(self, col) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return self.udf_factory()(c)


def _l2_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (mat / norms).astype(np.float32)


#: Worker-global model/client cache: populated lazily inside the UDF, it
#: lives for the python worker's lifetime — one model load per worker
#: process, shared across Arrow batches AND tasks (worker reuse).
_WORKER_MODELS: dict = {}


def _make_sentence_transformers_udf(model_name: str, dim: int):
    """Reference F2 `bge_text_embedder` (`rag_search/vector_db.py:464-471`)
    as load-once batch inference."""

    @F.pandas_udf("array<float>")
    def embed(s: pd.Series) -> pd.Series:
        model = _WORKER_MODELS.get(model_name)
        if model is None:
            try:
                from sentence_transformers import (  # noqa: PLC0415
                    SentenceTransformer,
                )
            except ImportError as e:  # pragma: no cover - lib absent here
                raise NotImplementedError(
                    f"backend requires sentence-transformers (model "
                    f"{model_name!r}); not installed in this environment"
                ) from e
            model = SentenceTransformer(model_name)  # pragma: no cover
            _WORKER_MODELS[model_name] = model  # pragma: no cover
        vecs = model.encode(  # pragma: no cover
            s.fillna("").tolist(), normalize_embeddings=True
        )
        return pd.Series(  # pragma: no cover
            list(np.asarray(vecs, dtype=np.float32))
        )

    return embed


def _make_openai_udf(model_name: str, dim: int, api_batch: int = 256):
    """Reference F1 `openai_text_embedder` (`rag_search/vector_db.py:
    451-462`) as a BATCHED API call (the reference sent one string per
    request) with the same normalize-after-embed step (`:460`)."""

    @F.pandas_udf("array<float>")
    def embed(s: pd.Series) -> pd.Series:
        client = _WORKER_MODELS.get("openai")
        if client is None:
            try:
                from openai import OpenAI  # noqa: PLC0415
            except ImportError as e:  # pragma: no cover - lib absent here
                raise NotImplementedError(
                    f"backend requires the openai client (model "
                    f"{model_name!r}); not installed in this environment"
                ) from e
            client = OpenAI()  # pragma: no cover - reads OPENAI_API_KEY
            _WORKER_MODELS["openai"] = client  # pragma: no cover
        texts = s.fillna("").tolist()  # pragma: no cover
        rows: list[np.ndarray] = []  # pragma: no cover
        for i in range(0, len(texts), api_batch):  # pragma: no cover
            resp = client.embeddings.create(
                model=model_name, input=texts[i : i + api_batch]
            )
            rows.extend(np.asarray(d.embedding) for d in resp.data)
        return pd.Series(list(_l2_normalize(np.vstack(rows))))  # pragma: no cover

    return embed


#: name -> backend. Names follow the reference's model routing keys
#: (`rag_search/vector_db.py:73-77,113-116`).
TEXT_BACKENDS: dict[str, TextEmbedBackend] = {
    "hash": TextEmbedBackend(
        "hash", "hash-64", 64, lambda: make_text_embed_udf(64)
    ),
    "local-bge-base": TextEmbedBackend(
        "local-bge-base",
        "bge-768",
        768,
        lambda: _make_sentence_transformers_udf("BAAI/bge-base-en", 768),
    ),
    "openai-text-embedding-3-small": TextEmbedBackend(
        "openai-text-embedding-3-small",
        "openai-1536",
        1536,
        lambda: _make_openai_udf("text-embedding-3-small", 1536),
    ),
}


def resolve_text_backend(name: str) -> TextEmbedBackend:
    try:
        return TEXT_BACKENDS[name]
    except KeyError:
        raise ValueError(
            f"unknown text embed backend {name!r}; "
            f"known: {sorted(TEXT_BACKENDS)}"
        ) from None


def from_conf(spark: SparkSession) -> TextEmbedBackend:
    """Config-selected backend (default: the deterministic hash embedder —
    the only backend on the correctness path)."""
    return resolve_text_backend(spark.conf.get(BACKEND_CONF_KEY, "hash"))


def train_word2vec_vectors(
    spark: SparkSession,
    corpus,
    *,
    text_col: str = "text",
    dim: int = 32,
    min_count: int = 2,
    seed: int = 7,
) -> dict:
    """Fit MLlib Word2Vec on `corpus[text_col]` and export the fitted word
    vectors as a plain ``{word: np.ndarray}`` dict (vocab × dim — small by
    construction, bounded via min_count). The training job is eager (one
    iterative MLlib fit); the exported dict is what
    `word2vec_backend_from_vectors` broadcasts into the Arrow UDF, and
    what `save_word2vec_vectors` persists so a re-opened store embeds
    queries in the SAME space without retraining."""
    from pyspark.ml.feature import Tokenizer, Word2Vec

    tok = Tokenizer(inputCol=text_col, outputCol="_words")
    words = tok.transform(corpus.select(text_col))
    w2v = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        seed=seed,
        inputCol="_words",
        outputCol="_vec",
        numPartitions=1,
    )
    try:
        model = w2v.fit(words)
    except Exception as e:
        # MLlib raises an opaque IllegalArgumentException when nothing in
        # the corpus met min_count; surface the actionable cause.
        if "vocabulary size" in str(e).lower():
            raise ValueError(
                f"Word2Vec vocabulary is empty: no token appeared >= "
                f"min_count ({min_count}) times in the corpus — lower "
                "min_count or check the text column"
            ) from e
        raise
    return {
        r["word"]: np.asarray(r["vector"].toArray(), dtype=np.float64)
        for r in model.getVectors().collect()
    }


def save_word2vec_vectors(vecs: dict, path: str) -> None:
    """Persist trained word vectors as JSON (vocab × dim floats — tiny by
    construction; the facade's model file under save_dir). Written
    atomically (temp file + rename) so a crashed save never leaves a
    torn model that silently changes the embedding space."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({w: [float(x) for x in v] for w, v in vecs.items()}, f)
    os.replace(tmp, path)


def load_word2vec_vectors(path: str) -> dict:
    """Inverse of `save_word2vec_vectors`."""
    import json

    with open(path) as f:
        raw = json.load(f)
    return {w: np.asarray(v, dtype=np.float64) for w, v in raw.items()}


def word2vec_backend_from_vectors(
    spark: SparkSession, vecs: dict, dim: int
) -> TextEmbedBackend:
    """Build the Word2Vec `TextEmbedBackend` from an exported word-vector
    dict (trained now via `train_word2vec_vectors` or loaded from a saved
    model via `load_word2vec_vectors`) — the broadcast-weights-into-a-
    batch-UDF pattern shared with the heavyweight backends. Documents
    embed as the L2-normalized mean of their word vectors; OOV-only
    documents embed to the zero vector (the zero-safe convention of
    functions.vector). Space tag `w2v-<dim>` keeps the cross-space guard
    effective regardless of how the vectors were obtained."""
    bc = spark.sparkContext.broadcast(vecs)

    def factory():
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<float>")
        def embed(s: pd.Series) -> pd.Series:
            table = bc.value
            out = []
            for text in s:
                toks = [w for w in (text or "").lower().split() if w]
                hit = [table[w] for w in toks if w in table]
                if hit:
                    v = np.mean(hit, axis=0)
                    n = np.linalg.norm(v)
                    v = (v / n if n > 0 else v).astype(np.float32)
                else:
                    # dim from the argument, NOT from the vector table —
                    # an empty vocabulary (nothing met min_count) must
                    # embed everything to zeros, not StopIteration
                    v = np.zeros(dim, np.float32)
                out.append(v)
            return pd.Series(out)

        return embed

    def release():
        # unpersist (NOT destroy): frees the executor-side copies of the
        # superseded vocabulary, but keeps the driver copy so any lazy
        # DataFrame built against the old backend's UDF still executes
        # (executors re-fetch from the driver) instead of failing with a
        # destroyed-broadcast error mid-plan (advisor r4 finding). The
        # driver-side dict is bounded by vocab size and is reclaimed
        # when the last plan referencing it is GC'd.
        bc.unpersist(blocking=False)

    return TextEmbedBackend(
        f"word2vec-{dim}", f"w2v-{dim}", dim, factory, release
    )


def make_word2vec_backend(
    spark: SparkSession,
    corpus,
    *,
    text_col: str = "text",
    dim: int = 32,
    min_count: int = 2,
    seed: int = 7,
) -> TextEmbedBackend:
    """A REAL trainable local model behind the same slot — MLlib Word2Vec
    fit on the given corpus, no external libraries. Unlike the
    sentence-transformers/OpenAI backends (whose libs are absent here and
    which raise at the plug-in line), this one runs end-to-end
    in-container: reference F1/F2 parity with an actually-executable
    model.

    Shape: training is ONE batch MLlib job (eager by design, like
    kmeans_train); the fitted word vectors are EXPORTED (vocab × dim —
    small by construction, bounded via min_count; cap vocab for web-scale
    corpora) and broadcast into the standard Arrow pandas UDF, which
    embeds a document as the L2-normalized mean of its word vectors —
    the classic bag-of-vectors document embedding, and exactly the
    "broadcast weights into a batch UDF" pattern the heavyweight
    backends use with torch weights. OOV-only documents embed to the
    zero vector (passed through un-normalized, the zero-safe convention
    of functions.vector).

    The returned backend carries its own space tag (`w2v-<dim>`), so the
    engine's cross-space guard keeps Word2Vec vectors from being dotted
    against hash-64 or CLIP-space vectors."""
    vecs = train_word2vec_vectors(
        spark,
        corpus,
        text_col=text_col,
        dim=dim,
        min_count=min_count,
        seed=seed,
    )
    return word2vec_backend_from_vectors(spark, vecs, dim)
