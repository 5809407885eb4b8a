"""Cost-based ANN strategy selection — SURVEY §7.2 phase 8's "Catalyst
sugar rule" (rewrite top-k-by-similarity to an index-probe path),
expressed where a pure-PySpark engine can express it.

A true Catalyst injection (`spark.sql.extensions`) requires compiled JVM
classes, which this engine deliberately avoids; instead the rule lives one
layer up, over the engine's own logical search node, and mirrors how
Catalyst's own size-based rules decide (`JoinSelection` picks broadcast
hash join when the plan's `stats().sizeInBytes` clears
`autoBroadcastJoinThreshold` — we read the identical statistic through the
query execution).

Reference parity: the reference has no planner at all — `return_similar`
(`rag_search/vector_db.py:684-696`) is always a full in-memory argsort.
The rule formalizes the choice the reference's user makes by hand
("corpus fits → brute force, else build an index"):

- corpus optimized-plan size ≤ threshold → exact brute force
  (scan → project(sim) → window top-k; one corpus pass, no corpus
  shuffle). Below the threshold the index probe's extra join + the index
  build/maintenance cost can't pay for themselves.
- above threshold + an index is registered → probe path (`ivf_search` /
  `srp_search`): candidate generation via equi-join on cell/bucket id,
  exact re-rank inside candidates only. At 100 TB with the corpus stored
  partitioned by cell id this is a partition-pruned scan of ~n_probe/√N
  of the data versus a full scan per brute-force batch.
- above threshold, no index → brute force, with the reason recorded so
  callers can see the missing-index warning in `explain()`.

Every rewrite is observable: `PlannedSearch.reason` says which branch
fired and on what statistic, the same way Catalyst's `RuleExecutor`
logging names the rule that transformed the plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

from pyspark.sql import DataFrame

from ..operators import search

#: Default rewrite threshold, in bytes of optimized-plan corpus size.
#: Deliberately far above autoBroadcastJoinThreshold (10 MiB): brute force
#: is a single corpus scan, so it stays competitive until scan time itself
#: dominates, not until the corpus stops fitting in one executor.
DEFAULT_BRUTE_FORCE_MAX_BYTES = 256 << 20


@dataclass(frozen=True)
class IvfIndex:
    """A registered IVF index: centroid table + (optionally pre-computed)
    cell-assigned corpus, as produced by `search.kmeans_train` +
    `search.ivf_assign`."""

    centroids: DataFrame
    assigned: DataFrame | None = None
    n_probe: int = 2


@dataclass(frozen=True)
class SrpIndex:
    """A registered sign-random-projection LSH index (bucket function
    parameters; buckets are derived columns, so there is nothing to
    materialize beyond the corpus itself)."""

    n_bits: int = 8
    dim: int = 64
    hamming_probe: int = 1


@dataclass(frozen=True)
class MatryoshkaFallback:
    """Index-free approximate fallback: coarse prefix-cosine shortlist +
    exact full-dim re-rank (`search.matryoshka_search`). Unlike IVF/SRP
    there is NOTHING to build or materialize — the right middle ground
    when the corpus outgrew brute force but no index exists yet. Opt-in
    only: the planner never silently trades exactness for speed."""

    prefix_dims: int = 16
    shortlist: int = 25


@dataclass(frozen=True)
class PlannedSearch:
    """The rule's output: the chosen physical strategy, why, and the
    resulting DataFrame."""

    strategy: Literal["brute_force", "ivf", "srp", "matryoshka"]
    reason: str
    corpus_bytes: int | None
    df: DataFrame = field(repr=False)

    def explain(self, mode: str = "simple") -> str:
        """Rule decision line + the Spark physical plan underneath it."""
        from .explain import explain_str

        header = (
            f"ANNStrategyRule: corpus_bytes={self.corpus_bytes} "
            f"-> strategy={self.strategy} ({self.reason})"
        )
        return header + "\n" + explain_str(self.df, mode)


def plan_size_bytes(df: DataFrame) -> int | None:
    """The optimizer's size estimate for `df` — the same
    `optimizedPlan.stats.sizeInBytes` statistic Catalyst's JoinSelection
    reads for broadcast decisions. For a parquet scan this is file size
    (after partition pruning); filters scale it by estimated selectivity.
    Returns None where the py4j internals are unavailable (e.g. Connect)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()  # noqa: SLF001
        )
    except Exception:  # noqa: BLE001 — stats are advisory, never fatal
        return None


def choose_n_probe(
    sweep: DataFrame, *, target_recall: float, default: int = 2
) -> tuple[int, float]:
    """Pick the IVF operating point FROM MEASUREMENT: the smallest
    n_probe in an `operators.search.ivf_probe_sweep` result whose
    measured recall meets `target_recall` — the planner-side consumer of
    the recall harness (measure, don't guess: the sweep's cost column
    shows each extra probe's price; this picks the cheapest point that
    meets the SLO). Returns (n_probe, achieved_recall).

    Falls back to the LARGEST swept n_probe when nothing meets the
    target (callers see the achieved recall and can widen the sweep or
    lower the target), and to (`default`, 0.0) on an empty sweep. The
    collect is the sweep's own output — a handful of rows."""
    rows = sorted(
        (int(r["n_probe"]), float(r["recall"]))
        for r in sweep.select("n_probe", "recall").collect()
    )
    if not rows:
        return default, 0.0
    for n, r in rows:
        if r >= target_recall:
            return n, r
    return rows[-1]


def plan_topk_similarity(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    index: IvfIndex | SrpIndex | None = None,
    approx_fallback: MatryoshkaFallback | None = None,
    brute_force_max_bytes: int = DEFAULT_BRUTE_FORCE_MAX_BYTES,
    vec_col: str = "embedding",
    query_vec_col: str = "query_embedding",
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    sim_scale: int = 6,
) -> PlannedSearch:
    """Rewrite the logical "top-k by cosine per query" node to its cheapest
    physical form (see module docstring for the rule).

    The brute branch is exact; the index branches are exact *within probed
    cells/buckets* (recall is governed by the index's n_probe /
    hamming_probe). All branches produce (query_id, ..., sim, rk) rows with
    identical ranking semantics (rounded cosine, id tie-break)."""
    size = plan_size_bytes(corpus)
    common = dict(
        k=k,
        vec_col=vec_col,
        query_vec_col=query_vec_col,
        query_id_col=query_id_col,
        id_col=id_col,
        sim_scale=sim_scale,
    )

    if size is not None and size <= brute_force_max_bytes:
        reason = f"size {size} <= brute_force_max_bytes {brute_force_max_bytes}"
        if index is not None:
            reason += "; registered index skipped below threshold"
        df = search.knn_batch_twophase(corpus, queries, **common)
        return PlannedSearch("brute_force", reason, size, df)

    if isinstance(index, IvfIndex):
        assigned = index.assigned
        reason = f"size {size} > threshold; IVF index (n_probe={index.n_probe})"
        if assigned is None:
            # An index without a materialized assignment is a scan-the-
            # corpus-per-query plan: ivf_assign is a full corpus × centroid
            # argmax, and Catalyst does no sub-DAG CSE, so the build
            # re-executes for EVERY query batch. Tolerated (correct, and
            # exercised in tests) but loudly recorded — production callers
            # register IvfIndex(assigned=<written/checkpointed table>).
            reason += (
                "; WARNING index.assigned missing — building the cell "
                "assignment inline (full corpus assign re-runs per query "
                "batch; pass a materialized `assigned` table)"
            )
            assigned = search.ivf_assign(
                corpus, index.centroids, vec_col=vec_col, id_col=id_col
            )
        df = search.ivf_search(
            assigned, index.centroids, queries, n_probe=index.n_probe, **common
        )
        return PlannedSearch("ivf", reason, size, df)

    if isinstance(index, SrpIndex):
        indexed = search.srp_index(
            corpus, vec_col=vec_col, n_bits=index.n_bits, dim=index.dim
        )
        df = search.srp_search(
            indexed,
            queries,
            n_bits=index.n_bits,
            dim=index.dim,
            hamming_probe=index.hamming_probe,
            **common,
        )
        return PlannedSearch(
            "srp",
            f"size {size} > threshold; SRP index "
            f"(n_bits={index.n_bits}, probe={index.hamming_probe})",
            size,
            df,
        )

    if approx_fallback is not None:
        df = search.matryoshka_search(
            corpus,
            queries,
            prefix_dims=approx_fallback.prefix_dims,
            shortlist=approx_fallback.shortlist,
            **common,
        )
        return PlannedSearch(
            "matryoshka",
            f"size {size} > threshold, no index; caller opted into the "
            f"index-free coarse-to-fine fallback (prefix_dims="
            f"{approx_fallback.prefix_dims}, "
            f"shortlist={approx_fallback.shortlist})",
            size,
            df,
        )

    return PlannedSearch(
        "brute_force",
        f"size {size} > threshold but no index registered — "
        "falling back to exact scan (register an IvfIndex/SrpIndex, or "
        "opt into MatryoshkaFallback for an index-free approximate path)",
        size,
        search.knn_batch_twophase(corpus, queries, **common),
    )
