"""operators/tokenize: distributed BPE training must match a pure-Python
reference implementation of the published algorithm (Sennrich et al.
2016) — same corpus-weighted pair counts, same (count desc, pair asc)
tie-break, same greedy leftmost-first merge application — and the
encode path's fertility numbers must match re-tokenizing every document
in Python."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_database_app_spark.operators import tokenize
from vector_database_app_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _ref_words(text: str) -> list[str]:
    return [w for w in text.lower().split(" ") if w != ""]


def _ref_word_counts(texts: list[str]) -> dict[str, int]:
    wc: dict[str, int] = {}
    for t in texts:
        for w in _ref_words(t):
            wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_apply_merge(
    syms: list[str], left: str, right: str
) -> list[str]:
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def _ref_bpe_train(
    wc: dict[str, int], n_merges: int, min_pair_count: int = 2
) -> list[dict]:
    vocab = {w: list(w) for w in wc}
    merges: list[dict] = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, ct in wc.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                pc[key] = pc.get(key, 0) + ct
        if not pc:
            break
        (left, right), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append(
            {
                "rank": rank,
                "left_sym": left,
                "right_sym": right,
                "merged": left + right,
                "pair_count": n,
            }
        )
        vocab = {
            w: _ref_apply_merge(s, left, right) for w, s in vocab.items()
        }
    return merges


@pytest.fixture(scope="module")
def corpus_texts(spark):
    docs = load_table(spark, SF, "documents")
    return [r.text for r in docs.select("text").collect()]


@pytest.fixture(scope="module")
def trained(spark, corpus_texts):
    docs = load_table(spark, SF, "documents")
    got = tokenize.bpe_train(docs, n_merges=8)
    want = _ref_bpe_train(_ref_word_counts(corpus_texts), n_merges=8)
    return got, want


def test_merge_table_matches_reference(trained):
    got, want = trained
    assert got == want
    assert len(got) == 8  # fixture corpus is rich enough for 8 merges


def test_merge_table_invariants(trained):
    got, _ = trained
    counts = [m["pair_count"] for m in got]
    for i, m in enumerate(got):
        assert m["rank"] == i
        assert m["merged"] == m["left_sym"] + m["right_sym"]
        assert m["pair_count"] >= 2
    # each merged symbol is novel (no duplicate merges)
    assert len({m["merged"] for m in got}) == len(got)
    assert counts  # non-empty


def test_merge_step_expr_greedy_leftmost(spark):
    """Single-pass greedy semantics on adversarial symbol runs: 'aaa'
    with merge (a,a) must give [aa, a] (no re-fuse of the new symbol),
    'abab' with (a,b) gives [ab, ab]."""
    df = spark.createDataFrame(
        [("aaa",), ("abab",), ("ba",), ("a",)], "w string"
    )
    out = {
        r.w: r.syms
        for r in df.select(
            "w",
            tokenize.merge_step_expr(
                F.split("w", ""), "a", "a"
            ).alias("syms"),
        ).collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["a"] == ["a"]
    out2 = {
        r.w: r.syms
        for r in df.select(
            "w",
            tokenize.merge_step_expr(
                F.split("w", ""), "a", "b"
            ).alias("syms"),
        ).collect()
    }
    assert out2["abab"] == ["ab", "ab"]
    assert out2["ba"] == ["b", "a"]


def test_encode_counts_match_reference(spark, corpus_texts, trained):
    got, _ = trained
    docs = load_table(spark, SF, "documents")
    enc = {
        r.doc_id: r
        for r in tokenize.bpe_encode_counts(docs, got).collect()
    }
    # re-tokenize every doc in Python with the same merge table
    id_text = {
        r.doc_id: r.text
        for r in docs.select("doc_id", "text").collect()
    }
    checked = 0
    for doc_id, text in id_text.items():
        words = _ref_words(text)
        if not words:
            assert doc_id not in enc  # empty docs drop out of the agg
            continue
        syms = [list(w) for w in words]
        for m in got:
            syms = [
                _ref_apply_merge(s, m["left_sym"], m["right_sym"])
                for s in syms
            ]
        row = enc[doc_id]
        assert row.n_words == len(words)
        assert row.n_chars == sum(len(w) for w in words)
        assert row.n_bpe_tokens == sum(len(s) for s in syms)
        assert row.n_bpe_tokens <= row.n_chars
        checked += 1
    assert checked == len(enc)


def test_registry_queries_schema_and_artifact_reuse(spark):
    from vector_database_app_spark.registry import QUERIES

    tr = QUERIES["bpe_train"](spark, SF)
    assert tr.columns == [
        "rank", "left_sym", "right_sym", "merged", "pair_count",
    ]
    assert tr.count() >= 1
    en = QUERIES["bpe_encode"](spark, SF)
    assert en.columns == [
        "doc_id", "n_words", "n_chars", "n_bpe_tokens",
        "chars_per_token",
    ]
    assert en.count() > 0
    # second construction: artifact memo — zero Spark jobs
    before = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    QUERIES["bpe_train"](spark, SF)
    after = spark.sparkContext._jsc.sc().dagScheduler().numTotalJobs()
    assert after == before


def test_merge_step_exhaustive_small_alphabet(spark):
    """EXHAUSTIVE parity of the F.aggregate merge expression vs the
    Python reference: every string over {a,b} up to length 8 (510
    words), under every possible merge pair — 4 × 510 comparisons per
    run in two Spark jobs. Full enumeration of the small case beats
    sampling: any greedy-scan bug (re-fuse of a fresh symbol, dropped
    tail, wrong leftmost bias) has a witness in this set."""
    from itertools import product

    from pyspark.sql import functions as F

    words = [
        "".join(p)
        for n in range(1, 9)
        for p in product("ab", repeat=n)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    for left, right in [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]:
        got = {
            r.w: r.syms
            for r in df.select(
                "w",
                tokenize.merge_step_expr(
                    F.split("w", ""), left, right
                ).alias("syms"),
            ).collect()
        }
        for w in words:
            want = _ref_apply_merge(list(w), left, right)
            assert got[w] == want, (w, left, right, got[w], want)


def test_apply_merges_chain_exhaustive(spark):
    """Chained-merge parity: applying the REAL trained sf0.001 merge
    table plus a cascading synthetic tail ((a,b)->ab then (ab,a)->aba)
    must match the Python reference on every {a,b}-string up to length
    8 — cascades are where chained F.aggregate rewrites can diverge
    (a merged symbol becoming the left side of a later merge)."""
    from itertools import product

    from pyspark.sql import functions as F

    merges = [
        {"left_sym": "a", "right_sym": "b", "merged": "ab"},
        {"left_sym": "ab", "right_sym": "a", "merged": "aba"},
        {"left_sym": "b", "right_sym": "b", "merged": "bb"},
    ]
    words = [
        "".join(p)
        for n in range(1, 9)
        for p in product("ab", repeat=n)
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: r.syms
        for r in df.select(
            "w",
            tokenize.apply_merges_expr(F.split("w", ""), merges).alias(
                "syms"
            ),
        ).collect()
    }
    for w in words:
        syms = list(w)
        for m in merges:
            syms = _ref_apply_merge(syms, m["left_sym"], m["right_sym"])
        assert got[w] == syms, (w, got[w], syms)


def test_pack_sequences_by_bpe_counts(spark, trained):
    """pack_sequences(n_tok_col=...) must conserve the BPE token budget:
    each doc's packed slices sum to its fertility count + 1 separator,
    and every sequence except the last is exactly seq_len full."""
    from vector_database_app_spark.operators import textops

    got, _ = trained
    docs = load_table(spark, SF, "documents")
    counts = tokenize.bpe_encode_counts(docs, got).select(
        "doc_id", "n_bpe_tokens"
    )
    packed = textops.pack_sequences(
        docs.join(counts, "doc_id"), seq_len=64, n_tok_col="n_bpe_tokens"
    ).collect()
    budget = {r.doc_id: r.n_bpe_tokens for r in counts.collect()}
    per_doc: dict[int, int] = {}
    per_seq: dict[int, int] = {}
    for r in packed:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_tok_in_seq
        per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.n_tok_in_seq
    assert set(per_doc) == set(budget)
    for d, tot in per_doc.items():
        assert tot == budget[d] + 1, (d, tot, budget[d])
    last = max(per_seq)
    for s, tot in per_seq.items():
        assert tot == 64 or s == last, (s, tot)
