"""Persist-lifecycle helpers for LAZY query constructors.

Several registry queries persist() an intermediate frame at BUILD time
(a lazy storage-level mark — zero jobs, so the driver-compat laziness
gate holds) because the result consumes it more than once. The caller —
not the constructor — runs the action, so the constructor cannot
unpersist in a try/finally the way eager paths do
(ingest.ingest_folder, streaming.run_stream_dedup_probe). Without a
release path, every execution leaves cached blocks behind for the
session (advisor r3 finding).

The contract here: the constructor tags its returned frame with the
persisted dependencies via `pin`; whoever runs the action calls
`release` afterwards. bench.py does this per timed query; one-shot
scripts can skip it (the session teardown reclaims everything), but
long-lived sessions looping over queries must not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_vdas_pinned_deps"


def pin(out: DataFrame, *deps: DataFrame) -> DataFrame:
    """Tag `out` with persisted frames it depends on and return it."""
    existing = getattr(out, _ATTR, ())
    setattr(out, _ATTR, tuple(existing) + deps)
    return out


def deps(df: DataFrame) -> tuple[DataFrame, ...]:
    """The dependencies `pin`ned onto `df` (empty tuple if none) — for
    wrappers that derive a NEW frame from a pinned one (orderBy/limit/
    select return fresh DataFrame objects, losing the pin attribute)
    and must carry the release handles forward:
    ``caching.pin(wrapped, *caching.deps(inner))``."""
    return tuple(getattr(df, _ATTR, ()))


def release(df: DataFrame) -> None:
    """Unpersist every dependency `pin`ned onto `df` (idempotent)."""
    for dep in getattr(df, _ATTR, ()):
        dep.unpersist()
    setattr(df, _ATTR, ())
