"""Constructed-input semantics for the round-9 op batch: vowel-group
syllable profiling, deterministic Gumbel-top-k weighted sampling
(Efraimidis-Spirakis), the Heaps'-law vocabulary-growth fit, the
integer CUSUM changepoint table, cross-split leakage auditing, and
bounded-round k-core peeling."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from vector_database_app_spark.operators import graph, textops


def test_syllable_profile_counts_vowel_groups(spark):
    docs = spark.createDataFrame(
        # "strength" = 1 group, "idea" = 2 ("i","ea"), "aeiou" = 1,
        # "banana" = 3, "rhythm" = 0 (no aeiou),
        # "beautiful" = 3 ("eau","i","u")
        [(0, "strength idea aeiou", "s0"), (1, "banana rhythm beautiful", "s0")],
        "doc_id long, text string, source string",
    )
    (row,) = textops.syllable_profile(docs).collect()
    assert row.n_words == 6
    assert row.n_syllables == 1 + 2 + 1 + 3 + 0 + 3
    assert row.n_complex == 2          # banana (3), beautiful (3)
    assert row.n_mono == 3             # strength, aeiou, rhythm
    assert row.syl_per_word_permille == (1000 * 10) // 6
    assert row.complex_permille == (1000 * 2) // 6


def test_sample_gumbel_topk_is_deterministic_and_weight_biased(spark):
    # weight 1000 vs weight 1: heavy docs should dominate the sample
    rows = [(i, "h" if i < 200 else "l", 1000 if i < 200 else 1)
            for i in range(1000)]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    ).select("doc_id", F.lit("one").alias("source"), "n_chars")
    s1 = textops.sample_gumbel_topk(docs, k=50).collect()
    s2 = textops.sample_gumbel_topk(docs, k=50).collect()
    assert sorted(r.doc_id for r in s1) == sorted(r.doc_id for r in s2)
    assert len(s1) == 50
    assert [r.sample_rank for r in sorted(s1, key=lambda r: r.sample_rank)] \
        == list(range(1, 51))
    n_heavy = sum(1 for r in s1 if r.doc_id < 200)
    # 200 heavy docs carry 1000/1800 of total weight but are sampled
    # without replacement at k=50 << 200 -> essentially all picks heavy
    assert n_heavy >= 45
    # zero/negative weights never sampled
    docs0 = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 5)], "doc_id long, source string, n_chars long"
    )
    got = textops.sample_gumbel_topk(docs0, k=10).collect()
    assert [r.doc_id for r in got] == [2]


def test_heaps_law_recovers_sublinear_growth(spark):
    # vocabulary grows ~ sqrt(n): doc d introduces a new term only on
    # perfect squares; beta must land well below 1 and the fit must
    # use >= 2 points
    rows = []
    for d in range(1, 300):
        term = f"t{int(math.isqrt(d))}"
        rows.append((d, f"{term} {term}", "s"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    (row,) = textops.heaps_law(docs).collect()
    assert row.n_fit_points >= 2
    assert row.vocab_final == len({int(math.isqrt(d)) for d in range(1, 300)})
    assert row.tokens_final == 2 * 299
    assert 0.0 < row.beta < 0.9
    # single-checkpoint sources are excluded (degenerate OLS)
    tiny = spark.createDataFrame(
        [(1, "a b", "t")], "doc_id long, text string, source string"
    )
    assert textops.heaps_law(tiny).collect() == []


def test_events_changepoint_integer_deviation(spark):
    import datetime as dt

    # type A: constant 10/day for 6 days -> dev_scaled identically 0;
    # type B: 5/day for 3 days then 15/day for 3 days -> trough at day 3
    rows = []
    eid = 0
    for day in range(6):
        ts = dt.datetime(2025, 1, 1 + day, 12, 0, 0)
        for _ in range(10):
            rows.append((eid, ts, eid % 7, "A", 1.0, "{}")); eid += 1
        for _ in range(5 if day < 3 else 15):
            rows.append((eid, ts, eid % 7, "B", 1.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from vector_database_app_spark.registry import QUERIES

    # drive the operator body directly on the constructed frame
    from pyspark.sql import Window
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(date_trunc('DAY', ts)) DIV 86400000000")
        .cast("bigint").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy("day")
    tot = daily.groupBy("event_type").agg(
        F.sum("n_events").cast("bigint").alias("_total"),
        F.count(F.lit(1)).cast("bigint").alias("_n_days"),
    )
    out = (
        daily.withColumn("cum_events", F.sum("n_events").over(w).cast("bigint"))
        .withColumn("day_ix", F.row_number().over(w).cast("bigint"))
        .join(tot, "event_type")
        .select("event_type", "day_ix",
                (F.col("_n_days") * F.col("cum_events")
                 - F.col("day_ix") * F.col("_total"))
                .cast("bigint").alias("dev_scaled"))
    ).collect()
    a = {r.day_ix: r.dev_scaled for r in out if r.event_type == "A"}
    b = {r.day_ix: r.dev_scaled for r in out if r.event_type == "B"}
    assert all(v == 0 for v in a.values())
    # B: total=60, n_days=6; cum at day 3 = 15 -> 6*15 - 3*60 = -90
    assert b[3] == -90 and b[3] == min(b.values())
    assert b[6] == 0   # cusum closes at zero by construction


def test_graph_kcore_peels_tail_and_keeps_clique(spark):
    # 4-clique (degree 3 each) + a pendant chain hanging off node 0:
    # k=2 peeling removes the chain within 3 rounds, keeps the clique
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(0, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "src long, dst long")
    rows = {r.node: r for r in graph.kcore(edges, k=2, rounds=3).collect()}
    assert all(rows[n].in_core == 1 for n in range(4))
    assert all(rows[n].in_core == 0 for n in (11, 12))
    assert rows[12].core_degree == 0
    # clique internal degrees survive intact
    assert {rows[n].core_degree for n in range(1, 4)} == {3}


def test_split_leakage_flags_cross_split_dups(spark):
    from vector_database_app_spark.operators import dedup

    text = " ".join(f"w{i}" for i in range(30))
    # find two doc_ids (both % 5 == 0 irrelevant here — we drive the
    # composition directly) landing in different Knuth-hash splits
    def bucket(d):
        return d * 2654435761 % 4294967296 % 10

    a = next(d for d in range(0, 1000) if bucket(d) < 8)
    b = next(d for d in range(0, 1000) if bucket(d) >= 9)
    docs = spark.createDataFrame(
        [(a, text), (b, text), (777 if bucket(777) < 8 else 778, "x y z")],
        "doc_id long, text string",
    )
    pairs = dedup.similarity_join(docs, threshold=0.5, prefix_filter=True)
    bucket_c = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) % 10
    splits = docs.select(
        "doc_id",
        F.when(bucket_c < 8, "train").when(bucket_c < 9, "val")
        .otherwise("test").alias("split"),
    )
    leaked = (
        pairs.join(splits.select(F.col("doc_id").alias("id_a"),
                                 F.col("split").alias("split_a")), "id_a")
        .join(splits.select(F.col("doc_id").alias("id_b"),
                            F.col("split").alias("split_b")), "id_b")
        .where(F.col("split_a") != F.col("split_b"))
        .collect()
    )
    assert len(leaked) == 1
    assert leaked[0].jaccard == 1.0
    assert {leaked[0].split_a, leaked[0].split_b} == {"train", "test"}


def test_graph_kcore_matches_python_reference_on_random_graph(spark):
    """Spark bounded peel == the pure-Python reference on a pseudo-
    random multigraph (deterministic congruential edges), for two
    (k, rounds) settings."""
    edges = [((i * 7919) % 23, (i * 104729) % 23) for i in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")

    def ref(k, rounds):
        sym = []
        for a, b in edges:
            sym.append((a, b))
            if a != b:
                sym.append((b, a))
        nodes = {a for a, _ in sym}
        surv = list(sym)
        for _ in range(rounds):
            deg = {}
            for a, _ in surv:
                deg[a] = deg.get(a, 0) + 1
            keep = {n for n, d in deg.items() if d >= k}
            surv = [(a, b) for a, b in surv if a in keep and b in keep]
        deg = {}
        for a, _ in surv:
            deg[a] = deg.get(a, 0) + 1
        return {n: (deg.get(n, 0), 1 if n in deg else 0) for n in nodes}

    for k, rounds in ((3, 2), (5, 3)):
        got = {
            r.node: (r.core_degree, r.in_core)
            for r in graph.kcore(df, k=k, rounds=rounds).collect()
        }
        assert got == ref(k, rounds)


def test_quantile_histogram_tracks_exact_percentiles(spark):
    """Grid estimates land within one bin width (0.25) of the exact
    interpolated percentile, and the result is partitioning-invariant
    (the mergeability claim — the hash agg's whole point)."""
    from vector_database_app_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    est = {r.event_type: r for r in QUERIES["quantile_histogram"](spark, sf).collect()}
    from vector_database_app_spark.sources.catalog import load_table

    ev = load_table(spark, sf, "events")
    vals: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    assert set(est) == set(vals)
    for t, xs in vals.items():
        xs.sort()
        n = len(xs)
        # the estimator's contract: within one bin width (0.25) of the
        # ceil(q·n)-th order statistic it targets (NOT the interpolated
        # percentile — in a sparse tail adjacent order stats can sit
        # further apart than a bin)
        for q, got in ((500, est[t].p50_est), (900, est[t].p90_est),
                       (990, est[t].p99_est)):
            target = xs[(q * n + 999) // 1000 - 1]
            assert abs(got - target) <= 0.25 + 1e-9, (t, q, got, target)
    again = {
        r.event_type: r
        for r in QUERIES["quantile_histogram"](spark, sf)
        .repartition(17)
        .collect()
    }
    for t in est:
        assert (est[t].p50_est, est[t].p90_est, est[t].p99_est) == (
            again[t].p50_est, again[t].p90_est, again[t].p99_est)


def test_kneser_ney_matches_python_reference(spark):
    """Spark per-doc KN micro-nats == a pure-Python replay of the
    interpolated bigram Kneser-Ney formula (D = 0.75) with the same
    quantize-log/decimal-sum/floored-integer discipline."""
    import math
    from collections import Counter
    from decimal import Decimal

    texts = {
        0: "a b a b c",
        1: "a b c d",
        2: "b c d a b",
        3: "x",                       # < 2 tokens: excluded
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.kn_neg_logp_micro)
        for r in textops.kneser_ney_score(docs).collect()
    }

    bigrams = {
        d: [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        for d, t in texts.items()
        if len(ws := t.split()) >= 2
    }
    all_bg = [b for bs in bigrams.values() for b in bs]
    cb, cw = Counter(all_bg), Counter(w1 for w1, _ in all_bg)
    types = set(all_bg)
    n1f = Counter(w1 for w1, _ in types)
    n1r = Counter(w2 for _, w2 in types)
    nbb = len(types)

    def logp(w1, w2):
        p = max(cb[(w1, w2)] - 0.75, 0.0) / cw[w1] + (
            0.75 * n1f[w1] / cw[w1]
        ) * (n1r[w2] / nbb)
        return Decimal(str(round(math.log(p), 6)))

    want = {}
    for d, bs in bigrams.items():
        s = sum((logp(*b) for b in bs), Decimal(0))
        want[d] = (len(bs), int(-s * 1_000_000) // len(bs))
    assert got == want
    assert 3 not in got
