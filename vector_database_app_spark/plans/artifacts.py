"""Trained-artifact store: load-or-compute for iterative builders.

The engine's iterative algorithms (spherical k-means centroids, PQ
codebooks, Word2Vec vectors, connected-components labels) are the only
operations that must run Spark actions while a registry query is being
CONSTRUCTED — Lloyd's collects k·dim centroid floats per round, label
propagation loops to convergence. Re-training on every query build is
wrong twice over: a 100×-scale benchmark charges minutes of training to
"query construction", and the driver-compat laziness gate
(tests/test_driver_compat.py) can't hold the zero-jobs-at-build
invariant for them.

This module gives trainers the same lifecycle a real index has
(reference parallel: the reference persists its whole store as pickles,
`rag_search/vector_db.py:231-238` — here only the TRAINED METADATA
persists; the data stays in the lake):

- first build: run the training function, persist the result under a
  content-addressed key (op name + params + source-file fingerprint);
- every later build: load lazily (explicit schema ⇒ no inference job;
  in-process memo for literal-consuming forms ⇒ zero jobs).

Artifacts live under ``<repo>/.artifacts/ann_artifacts`` (hidden,
gitignored). The key fingerprints the source parquet's size+mtime, so a
regenerated dataset invalidates stale artifacts instead of silently
serving old centroids.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

#: op key -> collected rows / python object, for consumers that need
#: plan-time literals (PQ codebooks, Word2Vec vector dicts). Lives for
#: the driver process — the second construction of the same query does
#: not touch the cluster at all.
_MEMO: dict[str, object] = {}


def artifacts_root() -> str:
    """Repo-anchored artifact directory (independent of cwd)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), ".artifacts", "ann_artifacts")


#: Bump when a trainer's ALGORITHM changes in a value-affecting way —
#: the key has no code-content component, so without a version bump a
#: fixed trainer would keep serving pre-fix cached artifacts. A change
#: scoped to ONE trainer can instead add a version entry to that
#: trainer's `params` (e.g. ``{"_v": 2}``) — it hashes into the key
#: without invalidating every other op's artifacts.
FORMAT_VERSION = 1


def _fingerprint(sf_dir: str, source: str) -> list | None:
    """Source parquet fingerprint (size + NANOSECOND mtime — regenerating
    the dataset invalidates artifacts even inside one second), or None
    when the source cannot be stat'ed — the caller must then BYPASS the
    store entirely (no read, no write): serving a cached artifact for an
    unverifiable source risks staleness, and persisting under a made-up
    key would orbit orphan artifacts nobody can ever address again."""
    try:
        st = os.stat(os.path.join(sf_dir, source))
        return [st.st_size, st.st_mtime_ns]
    except OSError:
        return None


def artifact_key(sf_dir: str, op: str, params: dict, *, source: str) -> str:
    """Content-addressed key: format version + op + params + source
    fingerprint. Raises FileNotFoundError when the source cannot be
    stat'ed (see _fingerprint — key construction requires a verifiable
    source; the load-or-train entry points handle that case by training
    without touching the store)."""
    fp = _fingerprint(sf_dir, source)
    if fp is None:
        raise FileNotFoundError(
            f"cannot fingerprint {source!r} under {sf_dir!r}"
        )
    raw = json.dumps(
        [FORMAT_VERSION, os.path.abspath(sf_dir), op, sorted(params.items()), fp]
    )
    return f"{op}-{hashlib.sha256(raw.encode()).hexdigest()[:16]}"


def load_or_train(
    spark: SparkSession,
    sf_dir: str,
    op: str,
    params: dict,
    train_fn: Callable[[], DataFrame],
    schema: str,
    *,
    source: str = "embeddings.parquet",
) -> DataFrame:
    """Return the trained table as a LAZY DataFrame. On first miss,
    ``train_fn()`` runs (actions fire — the one-time index build) and the
    result persists; afterwards the read carries an explicit schema, so
    construction fires zero jobs."""
    if _fingerprint(sf_dir, source) is None:
        # unverifiable source: bypass the store entirely (train fresh,
        # persist nothing) — see _fingerprint
        return train_fn()
    key = artifact_key(sf_dir, op, params, source=source)
    path = os.path.join(artifacts_root(), key)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # Commit via temp-dir + atomic rename (mirroring
        # save_word2vec_vectors): a concurrent bench sweep and pytest
        # session sharing the store must never read a directory
        # mid-overwrite, and a double-train race resolves to whichever
        # writer renames first — both artifacts are equivalent by key
        # construction (advisor r3 finding).
        import shutil

        if os.path.isdir(path):
            # wreckage from a writer that died mid-write: remove so the
            # rename below can land
            shutil.rmtree(path, ignore_errors=True)
        tmp = f"{path}.tmp-{os.getpid()}"
        trained = train_fn()
        trained.coalesce(1).write.mode("overwrite").parquet(tmp)
        # trainers that persist intermediates pin them onto the result
        # (caching.pin); the artifact write IS their one action, so
        # release here — a no-op for un-pinned frames
        from .. import caching  # noqa: PLC0415

        caching.release(trained)
        try:
            os.rename(tmp, path)
        except OSError:
            # lost the race: another process committed this key while we
            # trained — keep theirs, drop ours
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                raise
    return spark.read.schema(schema).parquet(path)


def load_or_train_rows(
    spark: SparkSession,
    sf_dir: str,
    op: str,
    params: dict,
    train_fn: Callable[[], DataFrame],
    schema: str,
    *,
    source: str = "embeddings.parquet",
) -> list:
    """Same lifecycle, but returns the COLLECTED rows (for plan-time
    literal consumers like PQ codebooks — m·k·(d/m) doubles by
    construction), memoized in-process so repeat constructions are
    zero-job."""
    if _fingerprint(sf_dir, source) is None:
        return train_fn().collect()  # bypass: no store, no memo
    key = artifact_key(sf_dir, op, params, source=source)
    if key in _MEMO:
        return _MEMO[key]  # type: ignore[return-value]
    rows = load_or_train(
        spark, sf_dir, op, params, train_fn, schema, source=source
    ).collect()
    _MEMO[key] = rows
    return rows


def load_or_build_object(
    sf_dir: str,
    op: str,
    params: dict,
    build_fn: Callable[[], object],
    *,
    source: str = "documents.parquet",
) -> object:
    """Driver-side JSON artifact for non-tabular trained state (Word2Vec
    word-vector dicts). ``build_fn()`` must return something
    json-serializable; memoized in-process, persisted atomically."""
    if _fingerprint(sf_dir, source) is None:
        return build_fn()  # bypass: no store, no memo
    key = artifact_key(sf_dir, op, params, source=source)
    if key in _MEMO:
        return _MEMO[key]
    path = os.path.join(artifacts_root(), key + ".json")
    if os.path.exists(path):
        with open(path) as f:
            obj = json.load(f)
    else:
        obj = build_fn()
        os.makedirs(artifacts_root(), exist_ok=True)
        # pid-qualified tmp + rename, mirroring load_or_train: two
        # concurrent builders must never interleave into one tmp file
        # (truncated JSON poisons every later load); losing the replace
        # race falls back to the winner's file — equivalent by key
        # construction (advisor r4 finding).
        tmp = f"{path}.tmp-{os.getpid()}"
        try:
            with open(tmp, "w") as f:
                json.dump(obj, f)
            os.replace(tmp, path)
        except OSError:
            try:
                os.remove(tmp)
            except OSError:
                pass
            if os.path.exists(path):
                with open(path) as f:
                    obj = json.load(f)
            else:
                raise
    _MEMO[key] = obj
    return obj
