"""Property-based tests (hypothesis) for the round-8b primitives — no
SparkSession needed: the WordPiece step SQL is exercised through DuckDB
against a pure-Python reference (the same generated text the Spark
chain runs, so this is a cross-engine semantics check at milliseconds
per example), the perceptual-hash helper through numpy, and the
gaps-and-islands span merge through a DuckDB replay."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vector_database_app_spark.operators.multimodal import _ahash_int
from vector_database_app_spark.operators.tokenize import wordpiece_step_sqls

_PIECES = ["a", "b", "c", "d", "ab", "bc", "abc", "dd", "abcd"]


def _wp_ref(word: str, pieces: list[str], max_steps: int) -> tuple[int, int]:
    """Reference greedy longest-match; returns (tokens, unk)."""
    by_len = sorted({len(p) for p in pieces}, reverse=True)
    pos, cnt, steps = 0, 0, 0
    while pos < len(word):
        if steps >= max_steps:
            return 1, 1  # conservative [UNK] past the step budget
        ln = 0
        for L in by_len:
            if word[pos : pos + L] in pieces and pos + L <= len(word):
                ln = L
                break
        if ln == 0:
            return 1, 1
        pos += ln
        cnt += 1
        steps += 1
    return cnt, 0


wp_words = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=12),
    min_size=1,
    max_size=8,
    unique=True,
)


@given(wp_words)
@settings(max_examples=40, deadline=None)
def test_wordpiece_step_sql_matches_python_reference(ws):
    """The generated step SQL (the text BOTH engines run) implements
    greedy longest-match with whole-word [UNK] — verified by chaining
    the CTEs in DuckDB over arbitrary words and comparing with a
    pure-Python reference."""
    max_steps = 16
    pos_sql, cnt_sql, unk_sql = wordpiece_step_sqls(_PIECES)
    vals = ", ".join("('" + w + "')" for w in ws)
    sql = f"""
    WITH s0 AS (
        SELECT w, CAST(length(w) AS INT) AS w_len, CAST(1 AS INT) AS pos,
               CAST(0 AS INT) AS cnt, CAST(0 AS INT) AS unk
        FROM (VALUES {vals}) t(w)
    )"""
    prev = "s0"
    for i in range(1, max_steps + 1):
        sql += f", s{i} AS (SELECT w, w_len, {pos_sql}, {cnt_sql}, {unk_sql} FROM {prev})"
        prev = f"s{i}"
    sql += f"""
    SELECT w,
           CASE WHEN unk = 1 OR pos <= w_len THEN 1 ELSE cnt END AS tokens,
           CASE WHEN unk = 1 OR pos <= w_len THEN 1 ELSE 0 END AS unk
    FROM {prev}
    """
    got = {w: (t, u) for w, t, u in duckdb.sql(sql).fetchall()}
    for w in ws:
        assert got[w] == _wp_ref(w, _PIECES, max_steps), w


imgs = st.integers(min_value=0, max_value=2**32 - 1)


@given(imgs, st.integers(min_value=4, max_value=24), st.integers(min_value=4, max_value=24))
@settings(max_examples=40, deadline=None)
def test_ahash_is_signed64_deterministic_and_brightness_invariant(seed, h, w):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
    a1 = _ahash_int(img, 8)
    assert -(1 << 63) <= a1 < (1 << 63)
    assert a1 == _ahash_int(img, 8)  # deterministic
    # uniform brightness shift preserves every (pixel > mean) bit
    shifted = (img.astype(np.int64) + 40).astype(np.uint8)
    assert _ahash_int(shifted, 8) == a1


pos_sets = st.lists(
    st.integers(min_value=0, max_value=60), min_size=1, max_size=40, unique=True
)


@given(pos_sets, st.integers(min_value=2, max_value=8))
@settings(max_examples=40, deadline=None)
def test_span_island_merge_matches_reference(poss, n):
    """The gaps-and-islands SQL (the oracle's shape) merges duplicated
    window positions into exactly the maximal runs: spans are disjoint,
    cover every position, and n_windows sums to the input size."""
    vals = ", ".join(f"(0, {p})" for p in poss)
    rows = duckdb.sql(f"""
        WITH dup(doc_id, pos) AS (VALUES {vals}),
        isl AS (
            SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY pos) AS g
            FROM dup
        )
        SELECT min(pos) AS s, max(pos) + {n - 1} AS e, count(*) AS nw
        FROM isl GROUP BY doc_id, g ORDER BY s
    """).fetchall()
    # python reference: split sorted positions into consecutive runs
    ref = []
    run = [sorted(poss)[0]]
    for p in sorted(poss)[1:]:
        if p == run[-1] + 1:
            run.append(p)
        else:
            ref.append(run)
            run = [p]
    ref.append(run)
    assert len(rows) == len(ref)
    for (s, e, nw), r in zip(rows, ref):
        assert s == r[0] and e == r[-1] + n - 1 and nw == len(r)
    assert sum(nw for _, _, nw in rows) == len(poss)
