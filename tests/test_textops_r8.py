"""Constructed-input semantics for the round-8 training-pipeline ops:
the deterministic global shuffle, the padding-waste bucket audit, and
the capped epoch allocation — unit-level invariants the corpus-wide
oracle mirror can't express (determinism across calls, cap boundaries,
the oversize sentinel)."""

from __future__ import annotations

from vector_database_app_spark.operators import textops


def test_shuffle_corpus_is_a_deterministic_permutation(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    out1 = textops.shuffle_corpus(df, n_shards=4).collect()
    out2 = textops.shuffle_corpus(df, n_shards=4).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # no RNG
    assert len(out1) == 200                                      # a permutation
    assert {r.doc_id for r in out1} == set(range(200))
    by_shard: dict[int, list[int]] = {}
    for r in out1:
        assert 0 <= r.shard < 4
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, positions in by_shard.items():
        # positions are contiguous 1..n within every shard
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # md5 keying actually spreads: no shard holds everything
    assert max(len(v) for v in by_shard.values()) < 200


def test_length_buckets_math_and_oversize_sentinel(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c"),                      # 3 words  -> cap 32
            (1, " ".join(["w"] * 40)),         # 40 words -> cap 64
            (2, " ".join(["w"] * 64)),         # boundary -> cap 64
            (3, " ".join(["w"] * 600)),        # oversize -> sentinel -1
        ],
        "doc_id long, text string",
    )
    rows = {r.bucket_cap: r for r in textops.length_buckets(docs).collect()}
    assert rows[32].n_docs == 1 and rows[32].sum_words == 3
    assert rows[32].padded_words == 32 and rows[32].waste_words == 29
    assert rows[32].waste_permille == (1000 * 29) // 32
    assert rows[64].n_docs == 2 and rows[64].sum_words == 104
    assert rows[64].padded_words == 128 and rows[64].waste_words == 24
    # oversize docs: counted, but never contribute fictitious padding
    assert rows[-1].n_docs == 1 and rows[-1].sum_words == 600
    assert rows[-1].padded_words == 0 and rows[-1].waste_words == 0
    assert rows[-1].waste_permille == 0


def test_epoch_allocation_caps_and_reports_surplus(spark):
    # one tiny source (sqrt-upweighted -> grant exceeds 4 epochs, must
    # cap) and one large source (grant fits)
    docs = spark.createDataFrame(
        [(i, "tiny", 10) for i in range(2)]
        + [(100 + i, "big", 1000) for i in range(50)],
        "doc_id long, source string, n_chars long",
    )
    rows = {
        r.source: r
        for r in textops.epoch_allocation(
            docs, budget_chars=100_000, max_epochs=4
        ).collect()
    }
    tiny, big = rows["tiny"], rows["big"]
    assert tiny.n_chars_total == 20 and big.n_chars_total == 50_000
    assert tiny.capped and not big.capped
    assert tiny.granted_chars == 4 * 20                  # the epoch ceiling
    assert tiny.surplus_chars == tiny.alloc_chars - 80   # visible, not hidden
    assert tiny.epochs_permille == 4000
    assert big.granted_chars == big.alloc_chars and big.surplus_chars == 0
    assert big.epochs_permille == (1000 * big.granted_chars) // 50_000
    # grants never exceed the budget
    assert tiny.alloc_chars + big.alloc_chars <= 100_000


def test_vocab_coverage_counts_oov_chars(spark):
    pieces = [{"piece": "a"}, {"piece": "b"}, {"piece": "ab"}]
    docs = spark.createDataFrame(
        [
            (0, "s1", "ab ab"),     # fully covered: 4 chars, 0 oov
            (1, "s1", "abc"),       # 'c' is oov: 3 chars, 1 oov
            (2, "s2", "xyz 9!"),    # nothing covered: 5 chars, 5 oov
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r.source: r
        for r in textops.vocab_coverage(docs, pieces).collect()
    }
    s1, s2 = rows["s1"], rows["s2"]
    assert (s1.n_chars, s1.n_oov_chars, s1.n_docs_with_oov) == (7, 1, 1)
    assert s1.oov_permille == (1000 * 1) // 7
    assert (s2.n_chars, s2.n_oov_chars, s2.n_docs_with_oov) == (5, 5, 1)
    assert s2.oov_permille == 1000
