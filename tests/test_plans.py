"""Physical-plan regression tests — at 100 TB the plan IS the performance.

Each test pins a plan property verified in the PERF.md audit: predicates
reach the parquet scan, small sides broadcast, top-k is
TakeOrderedAndProject (never a global sort), aggregation is partial+final,
and the signature stages stay inside codegen operators. If a refactor
silently turns one of these into a worse plan, these fail before the bench
does."""

from __future__ import annotations

from vector_database_app_spark.plans.explain import (
    assert_broadcast_join,
    assert_pushed_filters,
    assert_take_ordered,
    explain_str,
)
from vector_database_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_knn_plan(spark):
    df = QUERIES["knn_brute_force"](spark, SF)
    assert_pushed_filters(df, "vec_id")
    assert_broadcast_join(df)        # the 1-row query side
    assert_take_ordered(df)          # top-k, not a global sort
    plan = explain_str(df)
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>" in plan


def test_star_join_broadcasts_dims(spark):
    df = QUERIES["join_inner"](spark, SF)
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert_pushed_filters(df, "r_name")


def test_agg_partial_final(spark):
    df = QUERIES["agg_group"](spark, SF)
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 2, plan   # partial + final
    assert_pushed_filters(df, "l_shipdate")


def test_order_limit_is_take_ordered(spark):
    assert_take_ordered(QUERIES["order_limit"](spark, SF))


def test_filter_pushdown_reaches_scan(spark):
    assert_pushed_filters(QUERIES["filter_eq"](spark, SF), "source")


def test_minhash_signatures_stay_codegen(spark):
    from vector_database_app_spark.operators import dedup
    from vector_database_app_spark.sources.catalog import load_table

    sigs = dedup.minhash_signatures(load_table(spark, SF, "documents"))
    plan = explain_str(sigs)
    # explode + two-phase hash aggregation, no interpreted fallback operators
    assert "Generate" in plan and plan.count("HashAggregate") >= 2, plan


def test_ivf_probe_is_broadcast_equijoin(spark):
    df = QUERIES["ann_ivf_search"](spark, SF)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan


def test_column_pruning(spark):
    # a 3-column projection must not read the text column
    df = QUERIES["project_cols"](spark, SF)
    plan = explain_str(df)
    assert "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>" in plan, plan


def test_range_search_has_no_post_join_shuffle(spark):
    """Radius search is filter-on-scores: after the broadcast join there
    must be NO Exchange and NO Window — the corpus stays partition-local
    (the whole point of threshold search over top-k at scale)."""
    df = QUERIES["knn_range_search"](spark, SF)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan
    assert "Exchange" not in plan.split("Join")[0], plan


def test_sample_stratified_single_shuffle(spark):
    """k-per-stratum sampling = one hash partitioning on the stratum key
    feeding the rank window; no second exchange."""
    df = QUERIES["sample_stratified"](spark, SF)
    plan = explain_str(df)
    assert plan.count("hashpartitioning(") == 1, plan
    assert "Window" in plan, plan


def test_pii_scrub_is_scan_project_only(spark):
    """PII scrub must stay a pure projection over the scan: no shuffle,
    no python — regexp expressions inside codegen."""
    df = QUERIES["pii_scrub"](spark, SF)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
    assert "* Project" in plan, plan  # the * marks a codegen'd operator


def test_boilerplate_single_agg_shuffle(spark):
    """Per-doc distinct shingles happen BEFORE the explode, so the only
    gram-keyed shuffle is the final aggregation (partial+final). The
    doc_id-keyed repartition ahead of the shingle stage (r5: spreads
    shingling off a single small input split) is the one other
    exchange — gram STRINGS still cross the wire exactly once."""
    df = QUERIES["boilerplate_ngrams"](spark, SF)
    plan = explain_str(df)
    assert plan.count("hashpartitioning(ngram") == 1, plan
    assert plan.count("hashpartitioning(") == 2, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_embed_quantize_no_shuffle(spark):
    """Quantization audit is row-local: scan + project, nothing else."""
    df = QUERIES["embed_quantize"](spark, SF)
    plan = explain_str(df)
    assert "Exchange" not in plan, plan


def test_cluster_conf_profile():
    """The 100 TB profile keeps semantics-neutral keys only and scales
    the initial shuffle partitioning with the fleet."""
    from vector_database_app_spark.session import cluster_conf

    conf = cluster_conf(total_cores=4000)
    assert conf["spark.sql.shuffle.partitions"] == "8000"
    assert conf["spark.sql.adaptive.enabled"] == "true"
    # semantics-stability keys match the local session exactly
    assert conf["spark.sql.session.timeZone"] == "UTC"
    assert conf["spark.sql.execution.arrow.pyspark.enabled"] == "true"


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must broadcast — the corpus side is one scan
    with no gram-keyed shuffle (the shape that survives a billions-of-docs
    corpus against a thousands-of-docs eval set)."""
    df = QUERIES["decontaminate"](spark, SF)
    assert_broadcast_join(df)
    plan = explain_str(df)
    # exactly ONE gram-keyed exchange: the benchmark-side distinct (small,
    # feeds the BroadcastExchange). The corpus side must contribute none —
    # its only wide exchange is the per-doc counter agg keyed by doc_id.
    assert plan.count("hashpartitioning(ngram") == 1, plan
    assert "hashpartitioning(doc_id" in plan, plan
    # two joins total (details section lists each node once): gram hit join
    # + the left-outer count join — and both are broadcast, never sort-merge
    assert plan.count(") BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_matryoshka_coarse_prunes_fine_cost(spark):
    """Both ranking stages are windows over a broadcast-joined corpus; the
    corpus itself never shuffles on anything but the query_id window key,
    and the scan reads only the embedding payload it needs."""
    df = QUERIES["ann_matryoshka"](spark, SF)
    assert_broadcast_join(df)      # query batch side
    plan = explain_str(df)
    assert "hashpartitioning(query_id" in plan, plan


def test_mmr_diversifies_vs_plain_topk(spark):
    """MMR's picks must (a) start from the plain argmax hit, (b) form a
    valid greedy trajectory (one pick per step per query), and (c) differ
    from the plain similarity top-5 for at least one query on this
    fixture — otherwise the diversification term is dead code."""
    from vector_database_app_spark.registry import QUERIES

    mmr = QUERIES["rag_mmr"](spark, SF).toPandas()
    knn = QUERIES["topk_per_group"](spark, SF)  # noqa: F841  (shape ref)
    # (a) step 1 == argmax qsim per query
    for qid, grp in mmr.groupby("query_id"):
        s1 = grp[grp["step"] == 1]
        assert len(s1) == 1
        assert s1.iloc[0]["qsim"] == grp["qsim"].max()
        # (b) exactly one pick per step 1..5, all distinct vec_ids
        assert sorted(grp["step"]) == [1, 2, 3, 4, 5]
        assert grp["vec_id"].nunique() == 5
    # (c) the MMR set differs from plain top-5-by-qsim for ≥1 query
    from vector_database_app_spark.operators import search as S
    from vector_database_app_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    plain = (
        S.knn_batch(emb.filter(F.col("vec_id") >= 3), queries, k=5)
        .select("query_id", "vec_id")
        .toPandas()
    )
    differs = False
    for qid, grp in mmr.groupby("query_id"):
        plain_set = set(plain[plain["query_id"] == qid]["vec_id"])
        if set(grp["vec_id"]) != plain_set:
            differs = True
    assert differs, "MMR returned plain top-k for every query"


def test_mmr_rerank_cost_is_blocked_by_query(spark):
    """The greedy rounds must stay blocked by query_id (window/agg keys)
    and the corpus side must reach the shortlist via broadcast join —
    never a corpus shuffle."""
    from vector_database_app_spark.registry import QUERIES

    df = QUERIES["rag_mmr"](spark, SF)
    assert_broadcast_join(df)
    plan = explain_str(df)
    assert "hashpartitioning(query_id" in plan, plan


def test_interval_join_is_hash_not_nested_loop(spark):
    """The keyless point-in-interval join must plan as an equi join on
    the bin key — a bare BETWEEN theta-join would be
    BroadcastNestedLoopJoin (O(points × intervals) at any scale)."""
    from vector_database_app_spark.registry import QUERIES

    df = QUERIES["join_interval"](spark, SF)
    plan = explain_str(df)
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan  # still a real join, on the _bin equi key


def test_pack_sequences_two_phase_and_complete(spark):
    """The packing cumsum must be the two-phase form (per-partition window
    keyed on _pid — a full-data SinglePartition sort window would serialize
    the corpus through one task), and the layout must be gapless: every
    sequence except the last carries exactly seq_len tokens."""
    from vector_database_app_spark.registry import QUERIES

    df = QUERIES["pack_sequences"](spark, SF)
    plan = explain_str(df)
    assert "hashpartitioning(_pid" in plan, plan
    pdf = df.toPandas()
    per_seq = pdf.groupby("seq_id")["n_tok_in_seq"].sum().sort_index()
    assert (per_seq.iloc[:-1] == 128).all()
    assert 0 < per_seq.iloc[-1] <= 128
    # document slices reassemble exactly: offsets contiguous from 0
    for _, grp in pdf.groupby("doc_id"):
        g = grp.sort_values("doc_tok_offset")
        assert g["doc_tok_offset"].iloc[0] == 0
        ends = g["doc_tok_offset"] + g["n_tok_in_seq"]
        assert (g["doc_tok_offset"].iloc[1:].values == ends.iloc[:-1].values).all()


def test_ivfpq_adc_is_broadcast_equijoin_no_nested_loop(spark):
    """The IVF-PQ composite's corpus-touching joins are equi-joins on
    blocking keys (centroid_id, then (query, subspace, code)) with the
    tiny sides broadcast. The only nested-loop operators allowed are the
    deliberate Cross products of the query frame against the
    CENTROID/CODEBOOK tables (both tiny, both broadcast) — a THETA
    (non-Cross) nested loop would mean a candidate generator degenerated
    to all-pairs filtering."""
    df = QUERIES["ann_ivfpq_search"](spark, SF)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan
    import re

    for m in re.finditer(r"BroadcastNestedLoopJoin (\w+)", plan):
        assert m.group(1) == "Cross", plan


def test_binary_search_broadcasts_queries(spark):
    """ann_binary_search: query side broadcast (corpus never shuffles for
    candidate gen), vec_id partition filter pushed to the scan."""
    df = QUERIES["ann_binary_search"](spark, SF)
    plan = explain_str(df)
    assert "Broadcast" in plan, plan
    assert_pushed_filters(df, "vec_id")
    assert "CartesianProduct" not in plan, plan


def test_hybrid_search_fusion_plan(spark):
    """hybrid_search: dense query + min-max stats both enter as broadcast
    one-row sides; final top-k is TakeOrderedAndProject, not a sort."""
    df = QUERIES["hybrid_search"](spark, SF)
    plan = explain_str(df)
    assert plan.count("Broadcast") >= 2, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rag_rerank_blocked_pairs_and_arrow_stage(spark):
    """rag_rerank: candidates join queries on the lang blocking key as a
    broadcast HASH join (never an unblocked product), and the pair scorer
    is ONE Arrow mapInPandas stage."""
    df = QUERIES["rag_rerank"](spark, SF)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "MapInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dedup_passage_two_hash_aggs(spark):
    """dedup_passage: owner agg + doc re-agg are both partial+final hash
    aggregations (map-side combine before each shuffle)."""
    df = QUERIES["dedup_passage"](spark, SF)
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_partsupp_queries_avoid_cartesian(spark):
    """Q2/Q11/Q16/Q20: correlated subqueries decorrelate to joins — no
    nested-loop/cartesian fallback anywhere; dims broadcast in Q2."""
    for name in (
        "sql_min_cost_supplier",
        "sql_important_stock",
        "sql_supplier_part_count",
        "sql_part_promotion",
    ):
        plan = explain_str(QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"
    q2 = explain_str(QUERIES["sql_min_cost_supplier"](spark, SF))
    assert "BroadcastHashJoin" in q2, q2


def test_scd_type2_single_key_shuffle(spark):
    """scd_type2: both windows and the run aggregation key on o_custkey —
    exactly ONE exchange on the key partitioning serves the chain (Spark
    reuses the sort/partitioning for the second window and the agg)."""
    df = QUERIES["scd_type2"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("+- Exchange") == 1, plan
    import re

    args = re.findall(r"Arguments: hashpartitioning\(([^,]+)", plan)
    assert args and all("o_custkey" in a for a in args), plan


def test_agg_skew_twophase_two_hash_aggs(spark):
    """salted agg: two partial+final hash-agg pairs (salted phase, merge
    phase), no extra shuffles beyond the two group keys."""
    df = QUERIES["agg_skew_twophase"](spark, SF)
    plan = explain_str(df)
    assert plan.count("HashAggregate") >= 4, plan


def test_dedup_semantic_blocked_join(spark):
    """SemDeDup: centroid assignment broadcasts the (tiny) centroid side;
    the pairwise stage is an EQUI-join on centroid_id — never an
    unblocked product over the corpus."""
    df = QUERIES["dedup_semantic"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "Broadcast" in plan, plan


def test_ann_recall_no_cartesian_beyond_query_broadcast(spark):
    """ann_recall: both legs' candidate/truth joins block on keys; the only
    nested-loop is the broadcast of the 3-row query side."""
    df = QUERIES["ann_recall"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    import re

    for m in re.finditer(r"BroadcastNestedLoopJoin (\w+)", plan):
        assert m.group(1) == "Cross", plan


def test_graph_pagerank_keyed_aggs_lazy(spark):
    """pagerank: 3 unrolled rounds = keyed hash aggs over equi-joins; the
    1-row |nodes| frame broadcasts; nothing cartesian over edges."""
    df = QUERIES["graph_pagerank"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 6, plan


def test_late_interaction_two_hash_aggs_broadcast_query(spark):
    """MaxSim: the 3-row query-token side broadcasts; per-(doc, q_tok)
    max and per-doc sum are both partial+final hash aggs, so raw token
    scores never shuffle."""
    df = QUERIES["late_interaction_search"](spark, SF)
    plan = explain_str(df)
    assert "Broadcast" in plan, plan
    assert plan.count("HashAggregate") >= 4, plan
    assert "CartesianProduct" not in plan, plan


def test_ann_index_incremental_pushes_batch_filter(spark):
    """Incremental IVF: the new-batch side scans with the vec_id
    predicate pushed to parquet (at scale: only the arriving partition),
    centroids broadcast."""
    df = QUERIES["ann_index_incremental"](spark, SF)
    assert_pushed_filters(df, "vec_id")
    plan = explain_str(df)
    assert "Broadcast" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dedup_semantic_grid_spreads_cells(spark):
    """The pairwise join must key on (centroid_id, pb, qb) — the grid
    sub-block keys that spread an oversized cell over grid² tasks."""
    df = QUERIES["dedup_semantic"](spark, SF)
    plan = explain_str(df)
    assert "pb" in plan and "qb" in plan, plan


def test_curriculum_order_avoids_single_partition_data_window(spark):
    """global_rank: the DATA window partitions by bucket (parallel); the
    only global-ordered window runs over the |buckets|-row count frame.
    Concretely: at least one Window partitioned by the bucket key, and
    the bucket-offset frame enters the final join as a broadcast."""
    df = QUERIES["curriculum_order"](spark, SF)
    plan = explain_str(df)
    assert "hashpartitioning(_bkt" in plan, plan
    assert "Broadcast" in plan, plan


def test_doc_winnow_is_shuffle_free(spark):
    """Winnowing is row-local array math: scan + project only — the
    sole permitted Exchange is _docs_parallel's round-robin input
    spread (r11: the staged single-file scan is one task otherwise);
    no keyed shuffle, no Window, no Python anywhere in the plan."""
    df = QUERIES["doc_winnow"](spark, SF)
    plan = explain_str(df)
    # no keyed/global shuffle of any kind …
    assert "hashpartitioning" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    # … every Exchange (if any) is the round-robin input spread
    if "Exchange" in plan:
        assert "RoundRobinPartitioning" in plan, plan
    assert "Window" not in plan, plan
    assert "Python" not in plan, plan


def test_dedup_winnow_codegen_and_keyed_joins(spark):
    """dedup_winnow must stay in the exploded+codegen form: no Python
    operators, no cartesian; shingle/min stages are Window over the doc
    key; pair stage is a fingerprint equi-join."""
    df = QUERIES["dedup_winnow"](spark, SF)
    plan = explain_str(df)
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_probe_sweep_candidate_join_is_broadcast_equijoin(spark):
    """ann_probe_sweep: candidate generation is a broadcast equi-join on
    centroid_id; the only nested-loop joins are Cross over tiny literal/
    broadcast frames (query×centroid ranking, ×sweep values, ×totals) —
    never an unkeyed corpus×corpus product."""
    df = QUERIES["ann_probe_sweep"](spark, SF)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    # every BNLJ in this plan must be the Cross form (tiny build side),
    # never Inner/Outer (which would mean a real join lost its keys)
    import re

    for m in re.finditer(r"BroadcastNestedLoopJoin (\w+)", plan):
        assert m.group(1) in ("Cross", "BuildRight", "BuildLeft"), plan[
            m.start() : m.start() + 80
        ]


def test_lsh_sweep_signature_tower_runs_once(spark):
    """dedup_lsh_sweep: the expensive signature aggregation (shingle
    explode → md5-min ObjectHashAggregate) must appear ONCE in the plan —
    the candidate table has a single consumer (the one flagged hashagg);
    a distinct-pairs verify leg was measured executing it three times."""
    df = QUERIES["dedup_lsh_sweep"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    # detail section lists each physical node once: count sig towers by
    # their ObjectHashAggregate pairs (partial+final per tower)
    towers = plan.count("ObjectHashAggregate")
    assert towers <= 4, f"signature tower duplicated: {towers} OHA nodes"


def test_dedup_prune_no_cartesian(spark):
    df = QUERIES["dedup_prune"](spark, SF)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan


def test_mixture_plan_one_scan_one_agg_shuffle(spark):
    """mixture_plan: ONE corpus scan feeding one partial+final hash
    aggregation on the mixing key; the full-outer join against the
    wanted-groups literal frame (the advisor fix that surfaces
    absent-group deficits) reuses the agg's partitioning on the big side
    — the only other exchange moves the tiny literal relation. Targets
    stay literals: no second corpus scan."""
    df = QUERIES["mixture_plan"](spark, SF)
    plan = explain_str(df)
    tree = plan.split("(1) ")[0]
    assert tree.count("Scan parquet") == 1, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin FullOuter" in plan, plan
    # two exchanges max: agg partial->final + the literal frame's shuffle
    assert tree.count("Exchange") <= 2, plan
