"""Plan-shape gate: NO registry query may run a window function over a
full-data `Exchange SinglePartition` — the #1 silent scale-killer (a
global window serializes its whole input through one task; at 100 TB
that is the whole table). The same class of bug was shipped twice before
this gate existed: the Z-order percent_rank normalization (fixed r4,
sources/layout.py) and late_interaction_search's rank-ALL-docs window
(fixed r4, registry.py).

Detector: every `Exchange SinglePartition` in the physical plan whose
few enclosing lines contain a `Window` node. Global AGGREGATES also
exchange SinglePartition, but only pre-aggregated partials (one row per
task) cross it — those are benign and don't match the detector.

Queries listed in BOUNDED_GLOBAL_WINDOWS are allowed exactly one
documented global window whose input frame is provably bounded (a
fixed-bucket aggregate or a top-k limit) — the two-phase prefix pattern
depends on one tiny global window over the bucket-totals frame, and
that is the point of the pattern.
"""

from __future__ import annotations

import pytest

from vector_database_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"

#: query -> why its global window input is bounded (and by what)
BOUNDED_GLOBAL_WINDOWS = {
    "events_survival": (
        "one shared-frame global window over the <=|weeks|-row "
        "Kaplan-Meier step aggregate (observation span bounds the "
        "frame; registry q_events_survival)"
    ),
    "quality_calibration": (
        "prefix windows over the <= n_buckets(64)-row bucket-totals "
        "aggregate (two-phase prefix pattern, textops.py)"
    ),
    "pack_sequences": (
        "offset window over the |shuffle partitions|-row per-partition "
        "totals frame (textops.pack_sequences)"
    ),
    "pack_sequences_bpe": (
        "same two-phase prefix pattern as pack_sequences (the BPE-"
        "fertility variant shares the packing code path verbatim)"
    ),
    "curriculum_order": (
        "offset window over the <= n_buckets-row bucket-counts frame "
        "(relational.global_rank two-phase pattern)"
    ),
    "dedup_threshold_sweep": (
        "cumulative window over the 10-row decile sweep frame"
    ),
    # late_interaction_search no longer appears here: its rank-ALL-docs
    # global window was rewritten to orderBy+limit(10) (top-k via
    # TakeOrderedAndProject) + a rank window over the 10-row result,
    # which the detector no longer flags at all.
}


def _single_partition_window_sites(plan: str) -> list[str]:
    lines = plan.splitlines()
    sites = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        above = lines[max(0, i - 4) : i]
        if any("Window" in a for a in above):
            sites.append("\n".join(above + [ln]))
    return sites


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_full_data_window_over_single_partition(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    sites = _single_partition_window_sites(plan)
    if name in BOUNDED_GLOBAL_WINDOWS:
        assert sites, (
            f"{name} is allowlisted for a bounded global window but its "
            "plan no longer has one — remove it from "
            "BOUNDED_GLOBAL_WINDOWS"
        )
        return
    assert not sites, (
        f"{name} runs a window over Exchange SinglePartition — a global "
        "window over full data serializes the table through one task at "
        "scale. Use the two-phase bucketed prefix pattern "
        "(relational.global_rank / textops.quality_calibration) or a "
        "top-k limit before ranking; if the input frame is provably "
        "bounded, document it in BOUNDED_GLOBAL_WINDOWS.\n\n"
        + "\n---\n".join(sites)
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_generator_inferred_recompute_filters(spark, name):
    """Exploding an ALIASED heavy array column lets the optimizer infer
    `size(arr) > 0 AND isnotnull(arr)` from the generator and push that
    filter below exchanges to the scan side — the full array expression
    (shingle assembly, PQ encode, ...) then re-evaluates 2x per
    inferred site on the pre-shuffle splits. Found in four operators in
    r5 (gram_novelty 11.9->1.0 s, contamination_report 17.3->1.2 s,
    ann_pq_search 3.0->1.5 s, ann_ivfpq_search 4.1->1.7 s at sf0.1 —
    PERF.md). Fixes: inline the expression into the generator
    (one-step explode), or explode_outer when emptiness is impossible.

    Detector: a Filter whose condition carries a lambda-based array
    expression in exactly the inferred shape `size(X) > 0 ... AND
    isnotnull(X)`. User predicates with lambdas (corpus_filter's
    quality thresholds) do not match the inferred shape."""
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    sites = [
        ln.strip()[:200]
        for ln in plan.splitlines()
        if "Filter (" in ln
        and "lambdafunction(" in ln
        and "> 0)" in ln
        and "isnotnull(" in ln
    ]
    assert not sites, (
        f"{name}: generator-inferred filter re-evaluates a heavy array "
        "expression at the scan — one-step the explode or use "
        "explode_outer.\n" + "\n---\n".join(sites)
    )
