"""Constructed-input semantics for the second and third round-8 op batches:
duplicated-span extraction (island merging, ownership, boundaries),
deterministic MLM masking (reproducibility, content-independence,
count/text agreement), the Zipf fit (exact OLS replay under the
quantized-log discipline), and the blocked fuzzy join (brute-force
parity, blocking never drops an in-threshold pair on this fixture)."""

from __future__ import annotations

import math

from vector_database_app_spark.operators import relational, textops


def test_duplicate_spans_merges_islands_and_respects_ownership(spark):
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"          # 10 words: owner doc
    # doc 1 copies owner words 0..8 at its own positions 2..10 (9 words
    # -> windows at pos 2 and 3 duplicated), then diverges
    copy = "x0 x1 " + " ".join(f"w{i}" for i in range(9)) + " y0 y1"
    # doc 2 contains TWO separated copies of an 8-word owner run ->
    # two distinct spans
    two = (
        " ".join(f"w{i}" for i in range(8))
        + " z0 z1 z2 "
        + " ".join(f"w{i}" for i in range(8))
    )
    docs = spark.createDataFrame(
        [(0, base), (1, copy), (2, two), (3, "short doc")],
        "doc_id long, text string",
    )
    rows = textops.duplicate_spans(docs, n=8).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 0 not in by_doc          # earliest doc owns; never a span
    assert 3 not in by_doc          # < n words: no windows at all
    (s1,) = by_doc[1]               # adjacent windows merged to ONE span
    assert (s1.span_start, s1.span_end) == (2, 10)
    assert s1.span_words == 9 and s1.n_windows == 2
    spans2 = sorted((r.span_start, r.span_end) for r in by_doc[2])
    assert spans2 == [(0, 7), (11, 18)]
    assert all(r.n_windows == 1 for r in by_doc[2])


def test_mlm_masking_is_reproducible_and_content_independent(spark):
    words_a = " ".join(f"a{i}" for i in range(400))
    words_b = " ".join(f"b{i}" for i in range(400))
    df_a = spark.createDataFrame([(7, words_a)], "doc_id long, text string")
    df_b = spark.createDataFrame([(7, words_b)], "doc_id long, text string")
    ra1 = textops.mlm_masking(df_a).collect()[0]
    ra2 = textops.mlm_masking(df_a).collect()[0]
    rb = textops.mlm_masking(df_b).collect()[0]
    assert ra1 == ra2                                    # no RNG anywhere
    assert ra1.n_tokens == 400
    assert ra1.n_masked == ra1.corrupted.split(" ").count("[MASK]")
    assert ra1.masked_permille == (1000 * ra1.n_masked) // 400
    # the mask pattern keys on (doc_id, position), not the token text
    mask_a = [w == "[MASK]" for w in ra1.corrupted.split(" ")]
    mask_b = [w == "[MASK]" for w in rb.corrupted.split(" ")]
    assert mask_a == mask_b
    # the hash actually selects: near the 15% line, never degenerate
    assert 0 < ra1.n_masked < 400
    # unmasked tokens pass through verbatim, in position
    orig = words_a.split(" ")
    for i, w in enumerate(ra1.corrupted.split(" ")):
        assert w == "[MASK]" or w == orig[i]


def test_zipf_fit_matches_exact_ols_replay(spark):
    # freq_i chosen so ranks are unambiguous (strictly decreasing)
    freqs = {"t%02d" % i: 40 - 3 * i for i in range(10)}
    text_parts: list[str] = []
    for t, f in freqs.items():
        text_parts.extend([t] * f)
    docs = spark.createDataFrame(
        [(0, " ".join(text_parts), "s1")],
        "doc_id long, text string, source string",
    )
    (row,) = textops.zipf_fit(docs, top_r=200).collect()
    assert row.n_terms == 10 and row.n_tokens == sum(freqs.values())
    assert row.n_fit_terms == 10
    # exact replay: quantized logs, rank-ordered fold, closed form
    pts = sorted(freqs.values(), reverse=True)
    xs = [round(math.log(r + 1), 6) for r in range(10)]
    ys = [round(math.log(f), 6) for f in pts]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    n = 10.0
    denom = n * sxx - sx * sx
    assert abs(row.slope - round((n * sxy - sx * sy) / denom, 6)) <= 2e-6
    assert abs(
        row.intercept - round((sy * sxx - sx * sxy) / denom, 6)
    ) <= 2e-6
    assert row.slope < 0            # frequencies decay with rank


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_join_blocked_matches_brute_force_within_blocks(spark):
    rows = (
        [("alpha widget",)] * 3
        + [("alphq widget",)] * 2
        + [("beta bolt",), ("betta bolt",), ("gamma rod",)]
        + [("completely different widget",)]   # same block, out of band
    )
    df = spark.createDataFrame(rows, "p_name string")
    got = sorted(
        (r.name_a, r.name_b, r.lev, r.n_rows_a, r.n_rows_b)
        for r in relational.fuzzy_join_blocked(
            df, name_col="p_name", max_dist=4, len_band=4
        ).collect()
    )
    # brute force over the name universe: same blocks, same threshold
    from collections import Counter

    universe = Counter(n for (n,) in rows)
    names = sorted(universe)
    want = sorted(
        (a, b, _lev(a, b), universe[a], universe[b])
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if a.split(" ")[-1] == b.split(" ")[-1]
        and abs(len(a) - len(b)) <= 4
        and _lev(a, b) <= 4
    )
    assert got == want
    pairs = {(a, b) for a, b, *_ in got}
    assert ("alpha widget", "alphq widget") in pairs      # lev 1
    assert ("beta bolt", "betta bolt") in pairs           # lev 1
    assert not any("gamma rod" in p for pair in pairs for p in pair)
    assert not any("completely" in a or "completely" in b for a, b in pairs)


def test_bloom_decontaminate_never_misses_a_true_overlap(spark):
    # one-sided error: every exact n-gram hit must also be a bloom hit
    from vector_database_app_spark.operators.textops import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import pyspark.sql.functions as F

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    exact = {
        r.doc_id: r.n_hits
        for r in decontaminate(corpus, bench, n=3, min_hits=2).collect()
    }
    bloom = {
        r.doc_id: r.n_bloom_hits
        for r in bloom_decontaminate(
            corpus, bench, n=3, k=3, m_bits=65536, min_hits=2
        ).collect()
    }
    assert set(exact) == set(bloom)
    assert all(bloom[d] >= exact[d] for d in exact)
    # and at fixture scale the 8 KiB filter is tight enough to be useful
    n_fp_docs = sum(1 for d in exact if bloom[d] > exact[d])
    assert n_fp_docs < len(exact) // 2


def test_dedup_span_clean_cuts_exactly_the_spans(spark):
    base = " ".join(f"w{i}" for i in range(10))
    copy = "x0 x1 " + " ".join(f"w{i}" for i in range(9)) + " y0 y1"
    docs = spark.createDataFrame(
        [(0, base), (1, copy)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in textops.remove_duplicate_spans(docs, n=8).collect()
    }
    assert rows[0].n_removed == 0 and rows[0].cleaned == base  # owner intact
    # doc 1's duplicated span is words 2..10 -> exactly those cut
    assert rows[1].n_words == 13 and rows[1].n_removed == 9
    assert rows[1].cleaned == "x0 x1 y0 y1"
    assert rows[1].removed_permille == (1000 * 9) // 13


def test_zipf_fit_excludes_degenerate_single_term_sources(spark):
    """r8-advice regression: a source whose vocabulary has ONE term
    makes the OLS denominator exactly 0 (Spark NULL vs DuckDB
    version-dependent NULL/Inf) — such sources are excluded, not
    emitted with engine-dependent values."""
    docs = spark.createDataFrame(
        [
            (0, "only only only only", "mono"),
            (1, "a b a c a b d e", "multi"),
        ],
        "doc_id long, text string, source string",
    )
    rows = textops.zipf_fit(docs, top_r=200).collect()
    assert [r.source for r in rows] == ["multi"]
    assert rows[0].slope is not None and math.isfinite(rows[0].slope)


def test_dedup_span_clean_multi_space_alignment(spark):
    """r8-advice regression: duplicate_spans used the UNFILTERED
    split(text,' ') position space while remove_duplicate_spans cut a
    FILTERED word array — consecutive/leading/trailing spaces shifted
    the indices and the wrong words were cut. Both now share the
    empty-token-filtered word space."""
    base = " ".join(f"w{i}" for i in range(10))
    # doc 1: leading spaces + a double space inside the prefix — under
    # the old unfiltered position space these shifted every span index
    copy = "  x0  x1 " + " ".join(f"w{i}" for i in range(9)) + " y0 y1"
    docs = spark.createDataFrame(
        [(0, base), (1, copy)], "doc_id long, text string"
    )
    spans = {
        r.doc_id: r for r in textops.duplicate_spans(docs, n=8).collect()
    }
    # filtered word space: x0 x1 w0..w8 y0 y1 -> span covers words 2..10
    assert (spans[1].span_start, spans[1].span_end) == (2, 10)
    rows = {
        r.doc_id: r
        for r in textops.remove_duplicate_spans(docs, n=8).collect()
    }
    assert rows[0].n_removed == 0
    assert rows[1].n_words == 13 and rows[1].n_removed == 9
    assert rows[1].cleaned == "x0 x1 y0 y1"


def test_events_seasonality_buckets_and_shares(spark):
    from vector_database_app_spark.registry import QUERIES

    rows = QUERIES["events_seasonality"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    total = sum(r.n_events for r in rows)
    assert all(1 <= r.dow <= 7 and 0 <= r.hour <= 23 for r in rows)
    assert all(r.n_users <= r.n_events for r in rows)
    for r in rows:
        assert r.share_permille == (1000 * r.n_events) // total
        assert r.vs_uniform_permille == (1000 * r.n_events * 168) // total


def test_image_ahash_dedup_finds_true_near_dup_clusters(spark):
    from pyspark.sql import functions as F

    from vector_database_app_spark.operators import multimodal

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 200)
    hashes = multimodal.image_ahash(
        multimodal.synthesize_png_variant_payloads(docs)
    )
    hrows = {r.doc_id: r.ahash for r in hashes.collect()}
    assert len(hrows) == 200
    pairs = multimodal.image_near_dups(hashes, max_hamming=7).collect()
    assert pairs
    # every near-dup pair is a TRUE cluster pair (same residue class)
    assert all(r.id_a % 32 == r.id_b % 32 for r in pairs)

    def ham(x: int, y: int) -> int:
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    # banded recall is EXACT at max_hamming=7 (8 bands, pigeonhole):
    # the banding must find every brute-force pair within threshold
    ids = sorted(hrows)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(hrows[a], hrows[b]) <= 7
    }
    found = {(r.id_a, r.id_b) for r in pairs}
    assert found == brute
    # reported hamming values are the true popcounts
    for r in pairs:
        assert r.hamming == ham(hrows[r.id_a], hrows[r.id_b])
    # generation-0 ids never pair below generation-0 of other clusters
    # (cross-cluster hashes are far: fixture margin >= 8)
    assert all(
        ham(hrows[a], hrows[b]) > 7
        for a in range(32)
        for b in range(a + 1, 32)
    )


def test_audio_fingerprint_dedup_finds_true_near_dup_clusters(spark):
    from pyspark.sql import functions as F

    from vector_database_app_spark.operators import multimodal

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 200)
    hashes = multimodal.audio_fingerprint(
        multimodal.synthesize_wav_variant_payloads(docs)
    )
    hrows = {r.doc_id: r.afp for r in hashes.collect()}
    assert len(hrows) == 200
    pairs = multimodal.hamming_near_dups(
        hashes, max_hamming=7, hash_col="afp"
    ).collect()
    assert pairs
    assert all(r.id_a % 16 == r.id_b % 16 for r in pairs)

    def ham(x: int, y: int) -> int:
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    ids = sorted(hrows)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(hrows[a], hrows[b]) <= 7
    }
    assert {(r.id_a, r.id_b) for r in pairs} == brute
    for r in pairs:
        assert r.hamming == ham(hrows[r.id_a], hrows[r.id_b])
    # cross-cluster fingerprints stay far (fixture margin)
    assert all(
        ham(hrows[a], hrows[b]) > 7
        for a in range(16)
        for b in range(a + 1, 16)
    )


def test_video_framehash_dedup_frame_vote(spark):
    from pyspark.sql import functions as F

    from vector_database_app_spark.operators import multimodal

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 200)
    fh = multimodal.video_framehash(
        multimodal.synthesize_video_variant_payloads(docs)
    )
    rows = fh.collect()
    assert len(rows) == 200 * 6
    hmap = {(r.doc_id, r.frame_ix): r.fhash for r in rows}
    pairs = multimodal.video_near_dups(
        fh, max_hamming=7, min_close_frames=4
    ).collect()
    assert pairs
    assert all(r.id_a % 16 == r.id_b % 16 for r in pairs)

    def ham(x: int, y: int) -> int:
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    ids = sorted({r.doc_id for r in rows})
    brute = {}
    for i, a_id in enumerate(ids):
        for b_id in ids[i + 1 :]:
            ncf = sum(
                1
                for f in range(6)
                if ham(hmap[(a_id, f)], hmap[(b_id, f)]) <= 7
            )
            if ncf >= 4:
                brute[(a_id, b_id)] = ncf
    got = {(r.id_a, r.id_b): r.n_close_frames for r in pairs}
    assert got == brute
    # the frame vote actually discriminates on this fixture: partial
    # matches exist (replaced frames) AND full matches exist
    counts = set(got.values())
    assert 6 in counts and (4 in counts or 5 in counts)


def test_label_propagation_converges_on_two_communities(spark):
    from vector_database_app_spark.operators import graph as G

    # two 4-cliques bridged by one edge; LPA should give each clique
    # one label (the smallest member), bridge notwithstanding
    def clique(prefix, k):
        names = [f"{prefix}{i}" for i in range(k)]
        return [
            (a, b) for a in names for b in names if a != b
        ]

    edges_rows = clique("a", 4) + clique("b", 4) + [
        ("a0", "b0"), ("b0", "a0")
    ]
    edges = spark.createDataFrame(edges_rows, "src string, dst string")
    labels = {
        r.node: r.label
        for r in G.label_propagation(edges, rounds=3).collect()
    }
    assert len(labels) == 8
    assert {labels[f"a{i}"] for i in range(4)} == {"a0"}
    # b0 sees three b-neighbors (label b0) and one a-neighbor after
    # round 1; majority keeps the b community on its own label
    assert {labels[f"b{i}"] for i in range(1, 4)} == {"b0"}


def test_label_propagation_isolated_node_keeps_own_label(spark):
    from vector_database_app_spark.operators import graph as G

    # x -> y only: y adopts x's label; x has no in-edges and keeps its own
    edges = spark.createDataFrame([("x", "y")], "src string, dst string")
    labels = {
        r.node: r.label for r in G.label_propagation(edges, rounds=2).collect()
    }
    assert labels == {"x": "x", "y": "x"}


def test_wordpiece_encode_greedy_longest_match_semantics(spark):
    from vector_database_app_spark.operators import tokenize as TK

    pieces = ["a", "b", "c", "ab", "abc", "bc"]

    def wp(word: str) -> tuple[int, int]:
        # reference greedy longest-match; (tokens, unk)
        pos, cnt = 0, 0
        while pos < len(word):
            ln = 0
            for L in (3, 2, 1):
                if word[pos : pos + L] in pieces and len(
                    word[pos : pos + L]
                ) == L:
                    ln = L
                    break
            if ln == 0:
                return 1, 1
            pos += ln
            cnt += 1
        return cnt, 0

    words = ["abc", "abcb", "ab", "ba", "abd", "cab", "aaaa", "abcabc"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in TK.wordpiece_encode_counts(docs, pieces).collect()
    }
    for i, w in enumerate(words):
        tokens, unk = wp(w)
        assert rows[i].n_wp_tokens == tokens, (w, rows[i])
        assert rows[i].n_unk_words == unk, (w, rows[i])
    # greedy != optimal: "abcb" -> abc + b (2), never ab + cb
    assert rows[1].n_wp_tokens == 2
    # 'd' is outside the alphabet -> whole word [UNK], ONE token
    assert rows[4].n_wp_tokens == 1 and rows[4].n_unk_words == 1


def test_wordpiece_unfinished_after_max_steps_is_unk(spark):
    from vector_database_app_spark.operators import tokenize as TK

    docs = spark.createDataFrame(
        [(0, "aaaaaa"), (1, "aaa")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in TK.wordpiece_encode_counts(
            docs, ["a"], max_steps=4
        ).collect()
    }
    assert rows[1].n_wp_tokens == 3 and rows[1].n_unk_words == 0
    # 6 singles > 4 steps -> conservatively [UNK], never undercounted
    assert rows[0].n_wp_tokens == 1 and rows[0].n_unk_words == 1


def test_entity_resolution_bounded_hop_canonicalization(spark):
    rows = (
        [("alpha widget",)] * 3
        + [("alphq widget",)] * 2
        + [("alpho widget",)]        # links to both above -> one cluster
        + [("beta bolt",), ("betta bolt",)]
        + [("gamma rod",)]           # singleton
    )
    df = spark.createDataFrame(rows, "p_name string")
    out = {
        r.name: r
        for r in relational.entity_resolution(
            df, name_col="p_name", hops=4
        ).collect()
    }
    assert len(out) == 6
    widget = {"alpha widget", "alphq widget", "alpho widget"}
    for n in widget:
        assert out[n].canonical == "alpha widget"
        assert out[n].cluster_size == 3
    assert out["alpha widget"].is_canonical == 1
    assert out["alphq widget"].is_canonical == 0
    assert out["alpha widget"].n_rows == 3 and out["alphq widget"].n_rows == 2
    for n in ("beta bolt", "betta bolt"):
        assert out[n].canonical == "beta bolt" and out[n].cluster_size == 2
    assert out["gamma rod"].canonical == "gamma rod"
    assert out["gamma rod"].cluster_size == 1


def test_entity_resolution_hop_bound_caps_chains(spark):
    # a chain a0 - a1 - ... a6 where only adjacent names are within
    # lev<=1 (shared last token so all share one block): with hops=2
    # the far end must NOT reach the chain head
    names = ["a" * (4 + i) + " x" for i in range(7)]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    out = {
        r.name: r.canonical
        for r in relational.entity_resolution(
            df, name_col="p_name", max_dist=1, len_band=1, hops=2
        ).collect()
    }
    assert out[names[0]] == names[0]
    assert out[names[2]] == names[0]      # within 2 hops
    assert out[names[6]] != names[0]      # chain cap: entity bleed stopped


def test_events_cohort_ltv_cumulative_math(spark):
    import datetime as dt

    from vector_database_app_spark.operators import textops  # noqa: F401
    from vector_database_app_spark.registry import QUERIES  # noqa: F401
    from vector_database_app_spark.sources.catalog import load_table  # noqa: F401

    # two users in one cohort week, activity over three weeks
    base = dt.datetime(2026, 3, 2)  # a Monday
    rows = [
        (1, base, 10.0),
        (2, base + dt.timedelta(days=1), 20.0),
        (1, base + dt.timedelta(days=7), 5.0),
        (1, base + dt.timedelta(days=15), 2.5),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, "view", v, "{}") for i, (u, ts, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    cohort = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts")).alias("cohort_wk")
    )
    per = (
        ev.select("user_id", F.date_trunc("week", "ts").alias("wk"), "value")
        .join(cohort, "user_id")
        .groupBy(
            F.unix_micros("cohort_wk").alias("cohort_us"),
            F.floor(F.datediff("wk", "cohort_wk") / 7)
            .cast("bigint")
            .alias("wk_offset"),
        )
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_active_users"),
            F.round(F.sum("value"), 2).alias("period_value"),
        )
    )
    w = (
        Window.partitionBy("cohort_us")
        .orderBy("wk_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = {
        r.wk_offset: r
        for r in per.select(
            "*", F.round(F.sum("period_value").over(w), 2).alias("cum_value")
        ).collect()
    }
    assert out[0].n_active_users == 2 and out[0].period_value == 30.0
    assert out[1].n_active_users == 1 and out[1].period_value == 5.0
    assert out[2].period_value == 2.5
    assert out[0].cum_value == 30.0
    assert out[1].cum_value == 35.0
    assert out[2].cum_value == 37.5


def test_term_burstiness_vmr_semantics(spark):
    from vector_database_app_spark.operators import textops  # noqa: F401

    # 'flat' appears once in each of 5 docs (VMR 0); 'bursty' appears 5x
    # in one doc and 1x in four docs
    docs = spark.createDataFrame(
        [
            (0, "flat bursty bursty bursty bursty bursty"),
            (1, "flat bursty"),
            (2, "flat bursty"),
            (3, "flat bursty"),
            (4, "flat bursty"),
        ],
        "doc_id long, text string",
    )
    import pyspark.sql.functions as F

    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != "")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    agg = (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("c").cast("bigint").alias("tf"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("c2"),
        )
        .collect()
    )
    stats = {r.term: r for r in agg}
    f, b = stats["flat"], stats["bursty"]
    # VMR = (n*Σc² − (Σc)²)/(n*Σc)
    assert (f.df * f.c2 - f.tf * f.tf) == 0                  # uniform
    vmr_b = (b.df * b.c2 - b.tf * b.tf) / (b.df * b.tf)
    assert vmr_b > 1.0                                       # bursty


def test_events_survival_product_limit_math(spark):
    import datetime as dt

    from vector_database_app_spark.registry import QUERIES
    import pyspark.sql.functions as F  # noqa: F401

    base = dt.datetime(2026, 3, 2)
    horizon = base + dt.timedelta(days=40)
    # users 1,2: one event -> duration 0, churned (last << horizon-14d)
    # user 3: events 8 days apart -> duration 1, churned
    # user 4: active until the horizon -> duration 1, CENSORED
    rows = [
        (1, base), (2, base),
        (3, base), (3, base + dt.timedelta(days=8)),
        (4, horizon - dt.timedelta(days=8)), (4, horizon),
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, "view", 1.0, "{}") for i, (u, ts) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    ev.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    # reuse the registry query against a staged dir with just events
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        pass  # events_survival touches only events
    out = {
        r.duration_wk: r
        for r in QUERIES["events_survival"](spark, d).collect()
    }
    s0, s1 = out[0], out[1]
    assert s0.n_at_risk == 4 and s0.n_churned == 2 and s0.n_censored == 0
    assert abs(s0.survival - 0.5) < 1e-6
    assert s1.n_at_risk == 2 and s1.n_churned == 1 and s1.n_censored == 1
    # S(1) = 0.5 * (1 - 1/2): the censored user joins the risk set but
    # is never a death
    assert abs(s1.survival - 0.25) < 1e-6
