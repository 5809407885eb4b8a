"""Constructed-input semantics for the round-5 additions: domain_cap's
two-phase salted selection must equal the naive single-window ranking,
pmi_collocations must produce textbook PMI values (and no fabricated
pairs for 1-word docs — the sequence(1,0) descending-range hazard), and
knn_classify must propagate cluster-majority labels. Unit-level checks
the corpus-wide oracle mirror can't express."""

from __future__ import annotations

import datetime
import hashlib
import math

import pytest

from vector_database_app_spark.operators import search, textops
from vector_database_app_spark.registry import QUERIES


# ---------------------------------------------------------------------------
# domain_cap
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def capped_corpus(spark):
    rows = [(i, "hot", f"doc {i}") for i in range(15)]
    rows += [(100 + i, "cold", f"doc {100 + i}") for i in range(3)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def _md5_rank(ids, cap):
    """The naive single-window selection the two-phase form must equal."""
    ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    return ranked[:cap]


def test_domain_cap_matches_naive_md5_ranking(spark, capped_corpus):
    out = {
        r["source"]: r
        for r in textops.domain_cap(capped_corpus, cap=10).collect()
    }
    hot_kept = _md5_rank(range(15), 10)
    assert out["hot"]["n_docs"] == 15
    assert out["hot"]["n_kept"] == 10
    assert out["hot"]["n_dropped"] == 5
    assert out["hot"]["kept_id_sum"] == sum(hot_kept)
    # under-cap source: everything kept, nothing dropped
    assert out["cold"]["n_docs"] == 3
    assert out["cold"]["n_kept"] == 3
    assert out["cold"]["n_dropped"] == 0
    assert out["cold"]["kept_id_sum"] == 100 + 101 + 102


def test_domain_cap_invariant_to_salt_count(spark, capped_corpus):
    """The kept SET must not depend on how the two-phase split salts —
    the global top-cap survives every per-salt cut."""
    a = sorted(
        map(tuple, textops.domain_cap(capped_corpus, cap=4, n_salts=1).collect())
    )
    b = sorted(
        map(tuple, textops.domain_cap(capped_corpus, cap=4, n_salts=64).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_textbook_values(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in textops.pmi_collocations(df, min_count=1).collect()
    }
    # unigrams: a:2 b:3 c:1 (N=6); bigrams: (a,b):2 (b,c):1 (N=3)
    ab = out[("a", "b")]
    assert (ab["n_ab"], ab["n_a"], ab["n_b"]) == (2, 2, 3)
    assert ab["pmi"] == pytest.approx(math.log2((2 * 6 * 6) / (3 * 2 * 3)))
    bc = out[("b", "c")]
    assert (bc["n_ab"], bc["n_a"], bc["n_b"]) == (1, 3, 1)
    assert bc["pmi"] == pytest.approx(2.0)
    assert set(out) == {("a", "b"), ("b", "c")}


def test_pmi_one_word_doc_yields_no_pair(spark):
    """Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty — an
    unguarded bigram builder fabricates a (word, NULL) pair for every
    1-word doc. The when-guard must keep solo docs out of the pair set
    while still counting their unigram."""
    df = spark.createDataFrame(
        [(0, "solo"), (1, "x y")], "doc_id long, text string"
    )
    rows = textops.pmi_collocations(df, min_count=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["n_ab"]) == ("x", "y", 1)
    # N_uni = 3 (solo, x, y), N_bi = 1: pmi = log2((1*3*3)/(1*1*1))
    assert r["pmi"] == pytest.approx(math.log2(9.0))


def test_pmi_min_count_filters(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    out = textops.pmi_collocations(df, min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("a", "b")]


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------


def test_char_entropy_textbook_values(spark):
    df = spark.createDataFrame(
        [(0, "aab"), (1, "aaaa"), (2, "abcd")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.char_entropy(df).collect()}
    h_aab = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert out[0]["entropy"] == pytest.approx(h_aab, abs=1e-6)
    assert out[0]["n_chars_sampled"] == 3
    assert out[0]["n_distinct_chars"] == 2
    # uniform single char: zero entropy, POSITIVE zero (the 0.0 - s form)
    assert out[1]["entropy"] == 0.0
    assert math.copysign(1.0, out[1]["entropy"]) == 1.0
    # uniform over 4 chars: exactly 2 bits
    assert out[2]["entropy"] == pytest.approx(2.0)


def test_char_entropy_empty_text(spark):
    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    r = textops.char_entropy(df).collect()[0]
    assert (r["n_chars_sampled"], r["n_distinct_chars"], r["entropy"]) == (
        0,
        0,
        0.0,
    )


def test_char_entropy_respects_sample_cap(spark):
    df = spark.createDataFrame(
        [(0, "ab" * 100)], "doc_id long, text string"
    )
    r = textops.char_entropy(df, sample_chars=10).collect()[0]
    assert r["n_chars_sampled"] == 10
    assert r["entropy"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# knn_classify
# ---------------------------------------------------------------------------


def test_knn_classify_cluster_majority(spark):
    """Two tight orthogonal clusters: every vector's 3-NN are its own
    cluster mates, so predictions are the cluster majority — including
    the deliberately mislabeled A member, which the vote corrects to
    the cluster label (the label-noise-repair use case)."""
    dim = 64

    def vec(axis, i):
        v = [0.0] * dim
        v[axis] = 1.0
        v[axis + 2] = 0.001 * i  # break sim ties deterministically
        return v

    rows = [(i, vec(0, i), 0) for i in range(3)]
    rows.append((3, vec(0, 3), 1))  # mislabeled A member
    rows += [(10 + i, vec(1, i), 1) for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        (r["true_label"], r["pred_label"]): r
        for r in search.knn_classify(df, k=3).collect()
    }
    assert out[(0, 0)]["n_vecs"] == 3
    assert out[(1, 0)]["n_vecs"] == 1  # the mislabeled one, repaired
    assert out[(1, 1)]["n_vecs"] == 4
    assert out[(0, 0)]["share"] == pytest.approx(0.375)
    assert out[(1, 1)]["share"] == pytest.approx(0.5)
    assert set(out) == {(0, 0), (1, 0), (1, 1)}


# ---------------------------------------------------------------------------
# t_closeness / session_paths — hand-computed fixtures through the real
# registry entry points (a shared conceptual error in the Spark/DuckDB
# twins would survive the oracle mirror; these are computed on paper)
# ---------------------------------------------------------------------------


def test_t_closeness_hand_computed(spark, tmp_path):
    """Two fully-separated groups at opposite ends of the 10-bin grid:
    ordered EMD = 9·|cumP−cumQ| terms of 0.5 each / 9 = 0.5, failing
    the t ≤ 0.2 verdict. On-paper: N_g=5, N=10, every i in 0..8 has
    |cum_n·N − cum_m·N_g| = |5·10 − 5·5| = 25, sum 225,
    t = 225/(5·10·9) = 0.5."""
    rows = [(i, "en", "A", 0) for i in range(5)]
    rows += [(10 + i, "en", "B", 600) for i in range(5)]  # 600//64=9
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in QUERIES["t_closeness"](spark, str(tmp_path)).collect()
    }
    assert out["A"]["t_value"] == pytest.approx(0.5)
    assert out["B"]["t_value"] == pytest.approx(0.5)
    assert out["A"]["t_close"] is False
    assert out["B"]["t_close"] is False
    assert out["A"]["n_docs"] == 5


def test_t_closeness_group_matching_global_is_zero(spark, tmp_path):
    """A group whose bucket distribution equals the corpus distribution
    has t = 0 exactly (every cross-multiplied term cancels) and passes
    the verdict as an integer comparison, no float boundary."""
    rows = [(i, "en", "A", 0) for i in range(5)]
    rows += [(10 + i, "en", "B", 64) for i in range(5)]
    rows += [(20 + i, "en", "C", 0) for i in range(5)]
    rows += [(30 + i, "en", "C", 64) for i in range(5)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["source"]: r
        for r in QUERIES["t_closeness"](spark, str(tmp_path)).collect()
    }
    assert out["C"]["t_value"] == 0.0
    assert out["C"]["t_close"] is True
    # A and B each: one boundary term |5*20 - 10*5| = 50,
    # t = 50/(5*20*9) = 0.055556 -> close
    assert out["A"]["t_value"] == pytest.approx(50 / 900, abs=1e-6)
    assert out["A"]["t_close"] is True


def _ts(minutes):
    return datetime.datetime(2026, 1, 1, 0, 0) + datetime.timedelta(
        minutes=minutes
    )


def test_session_paths_split_and_truncation(spark, tmp_path):
    """User 1: ten events a minute apart = ONE session, path truncated
    to the first 8 types. User 2: two events 2 h apart = TWO singleton
    sessions."""
    rows = [
        (i, _ts(i), 1, f"t{i}", 0.0, "{}") for i in range(10)
    ]  # one session, types t0..t9
    rows.append((100, _ts(0), 2, "x", 0.0, "{}"))
    rows.append((101, _ts(120), 2, "y", 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["path"]: r
        for r in QUERIES["session_paths"](spark, str(tmp_path)).collect()
    }
    long_path = ">".join(f"t{i}" for i in range(8))  # truncated at 8
    assert set(out) == {long_path, "x", "y"}
    assert out[long_path]["n_sessions"] == 1
    assert out[long_path]["n_events"] == 10  # count is the FULL session
    assert out["x"]["n_sessions"] == 1
    assert out["y"]["n_sessions"] == 1


# ---------------------------------------------------------------------------
# cross_source_overlap
# ---------------------------------------------------------------------------


def test_cross_source_overlap_containment_and_boilerplate_cap(spark):
    """A and B share exactly one non-boilerplate 3-gram (of two each →
    containment 0.5 both ways); the gram present in ALL THREE sources
    exceeds df_cap=2 and must be dropped from shared counts AND totals;
    C shares nothing and must produce no pair row."""
    rows = [
        (0, "A", "one two three four"),
        (1, "B", "one two three five"),
        (2, "C", "zzz yyy xxx"),
        # boilerplate gram "common base gram" in every source
        (3, "A", "common base gram"),
        (4, "B", "common base gram"),
        (5, "C", "common base gram"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {
        (r["src_a"], r["src_b"]): r
        for r in textops.cross_source_overlap(
            df, n=3, df_cap=2
        ).collect()
    }
    assert set(out) == {("A", "B")}
    r = out[("A", "B")]
    assert (r["n_shared"], r["n_a"], r["n_b"]) == (1, 2, 2)
    assert r["contain_a"] == pytest.approx(0.5)
    assert r["contain_b"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# corpus_bootstrap_ci — pure-Python replay of the hash-derandomized
# bootstrap on a constructed corpus
# ---------------------------------------------------------------------------


def test_corpus_bootstrap_ci_matches_python_replay(spark, tmp_path):
    rows = [(i, "en", "s", " ".join(["w"] * (5 + i))) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    r = QUERIES["corpus_bootstrap_ci"](spark, str(tmp_path)).collect()[0]

    xs = {i: 5 + i for i in range(20)}
    means = []
    for rep in range(32):
        swx = sw = 0
        for d, x in xs.items():
            w = int(hashlib.md5(f"{d}:{rep}".encode()).hexdigest()[17:32], 16) % 3
            swx += w * x
            sw += w
        means.append(round(swx / sw, 6))
    means.sort()
    assert r["n_replicates"] == 32
    assert r["n_docs"] == 20
    assert r["point_mean"] == pytest.approx(sum(xs.values()) / 20)
    assert r["ci_lo"] == pytest.approx(means[1], abs=1e-9)
    assert r["ci_hi"] == pytest.approx(means[30], abs=1e-9)
    assert r["ci_lo"] < r["point_mean"] < r["ci_hi"]
