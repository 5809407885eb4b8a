"""Property-based tests (hypothesis) for the round-10 primitives — no
SparkSession needed: the running-max interval-union islands, the KMV
merge algebra, the SCD2 carrier-merge algebra, and the decimal bin
scaling are checked against pure-Python references (the Spark forms
are deterministic integer replays of exactly these semantics; the
oracle mirror pins the engine side), plus a DuckDB engine check for
the bin expression over arbitrary floats.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

intervals = st.lists(
    st.tuples(st.integers(0, 500), st.integers(1, 80)),
    min_size=1,
    max_size=40,
)


def _merge_running_max(iv):
    """The registry form: sort by (start, ix), new island when start >
    max of all previous ends, agg min(start)/max(end)/count."""
    rows = sorted((s, s + d, i) for i, (s, d) in enumerate(iv))
    spans = []
    prev_max = None
    for s, e, _ in rows:
        if prev_max is None or s > prev_max:
            spans.append([s, e, 1])
        else:
            spans[-1][1] = max(spans[-1][1], e)
            spans[-1][2] += 1
        prev_max = e if prev_max is None else max(prev_max, e)
    return [tuple(x) for x in spans]


def _merge_bruteforce(iv):
    """Ground truth: mark every covered integer point, read off the
    maximal covered runs; count members by interval containment in
    the run."""
    pts = set()
    for s, d in iv:
        pts.update(range(s, s + d))
    spans = []
    for p in sorted(pts):
        if spans and p == spans[-1][1]:
            spans[-1][1] = p + 1
        else:
            spans.append([p, p + 1])
    out = []
    for a, b in spans:
        n = sum(1 for s, d in iv if a <= s and s + d <= b)
        out.append((a, b, n))
    return out


@settings(max_examples=300)
@given(intervals)
def test_interval_union_islands_match_bruteforce(iv):
    assert _merge_running_max(iv) == _merge_bruteforce(iv)


hash_sets = st.lists(
    st.lists(st.integers(0, 10**9), min_size=0, max_size=60),
    min_size=1,
    max_size=6,
)


@settings(max_examples=300)
@given(hash_sets, st.integers(2, 16))
def test_kmv_merge_equals_direct(days, k):
    """The distinct_kmv_merge claim: the k smallest DISTINCT values of
    the union equal the k smallest of the union of per-day k-minima —
    every global minimum is among its own day's k smallest."""
    direct = sorted(set().union(*map(set, days)))[:k]
    per_day = [sorted(set(d))[:k] for d in days]
    merged = sorted(set().union(*map(set, per_day)))[:k]
    assert merged == direct


attr_seqs = st.lists(st.integers(0, 3), min_size=1, max_size=30)


def _scd_ref(seq):
    """(attr, version, first_ix, n_rows, is_current) runs of a
    sequence — the scd_type2 collapse with positions as order keys."""
    runs = []
    for i, a in enumerate(seq):
        if not runs or runs[-1][0] != a:
            runs.append([a, len(runs) + 1, i, 1])
        else:
            runs[-1][3] += 1
    return [
        (a, v, fi, n, ix == len(runs) - 1)
        for ix, (a, v, fi, n) in enumerate(runs)
    ]


@settings(max_examples=300)
@given(attr_seqs, st.integers(0, 30))
def test_scd_carrier_merge_equals_rebuild(seq, cut):
    """The scd_merge_incremental algebra, key-local: split the sequence
    at `cut`, build history on the base, replay a CARRIER of the open
    run (its attr at its first position, ONE row) plus the delta rows,
    re-base version by (open version − 1) and the carrier run's n_rows
    by (open n_rows − 1) — the result must equal the full rebuild."""
    cut = min(cut, len(seq))
    base, delta = seq[:cut], seq[cut:]
    full = _scd_ref(seq)
    if not base:
        assert _scd_ref(delta) == full or not delta
        return
    hist = _scd_ref(base)
    if not delta:
        assert hist == full
        return
    open_attr, open_ver, open_fi, open_n, _ = hist[-1]
    closed = hist[:-1]
    # carrier replay: one row standing in for the open run, at its
    # original first position, followed by the delta rows
    replay_positions = [open_fi] + list(range(cut, len(seq)))
    replay_attrs = [open_attr] + delta
    runs = []
    for pos, a in zip(replay_positions, replay_attrs):
        if not runs or runs[-1][0] != a:
            runs.append([a, len(runs) + 1, pos, 1])
        else:
            runs[-1][3] += 1
    merged = []
    for ix, (a, v, fi, n) in enumerate(runs):
        v2 = v + open_ver - 1
        n2 = n + (open_n - 1 if v == 1 else 0)
        merged.append((a, v2, fi, n2, ix == len(runs) - 1))
    got = [(a, v, fi, n, cur is True) for a, v, fi, n, cur in closed] + merged
    want = [(a, v, fi, n, bool(cur)) for a, v, fi, n, cur in full]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_bin_expression_duckdb_matches_decimal_reference(vals):
    """The decimal-cast bin scaling (r9 advice fix) on DuckDB equals a
    pure-decimal Python reference for arbitrary doubles — including
    values landing exactly on bin edges after HALF_UP rounding."""
    import duckdb
    import pandas as pd

    def ref(v):
        scaled = int(
            Decimal(repr(v)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
            * 10000
        )
        return scaled // 2500

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    got = [
        b
        for (b,) in con.execute(
            """
            SELECT CAST(floor(CAST(CAST(round(v, 4) AS DECIMAL(18,4))
                                   * 10000 AS BIGINT) / 2500)
                        AS BIGINT)
            FROM t
            """
        ).fetchall()
    ]
    assert got == [ref(v) for v in vals]
