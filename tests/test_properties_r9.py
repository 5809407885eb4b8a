"""Property-based tests (hypothesis) for the round-9 primitives — no
SparkSession needed: the k-core bounded peel, the CUSUM deviation
identity, the Efraimidis-Spirakis key ordering, and the syllable
count are checked against pure-Python references (the Spark forms are
deterministic integer/quantized-float replays of exactly these
semantics; the oracle mirror pins the engine side)."""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st

edge_lists = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    min_size=1,
    max_size=40,
)


def _kcore_ref(edges, k, rounds):
    """Reference bounded peel over the symmetrized multigraph —
    mirrors graph.kcore: degree counts BOTH directions, self-loops
    once; each round drops nodes with surviving degree < k."""
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
    return nodes, deg


@given(edge_lists, st.integers(1, 4))
@settings(max_examples=25, deadline=None)
def test_kcore_bounded_peel_is_monotone_and_converges(edges, k):
    """(a) survivor sets shrink monotonically with more rounds;
    (b) once a round removes nothing, every later round is identical
    (the fixpoint IS the true k-core); (c) every fixpoint survivor
    has degree >= k."""
    prev = None
    fixed = None
    # worst case peels ONE node per round (a chain), so 15 nodes need
    # up to 15 rounds to converge plus one more to OBSERVE cur == prev
    # (hypothesis falsified the old 7-round budget with a 7-node chain)
    for rounds in range(1, 17):
        _, deg = _kcore_ref(edges, k, rounds)
        cur = set(deg)
        if prev is not None:
            assert cur <= prev
            if cur == prev and fixed is None:
                fixed = cur
        prev = cur
    assert fixed is not None  # <= 15 nodes -> converges within 15
    _, deg = _kcore_ref(edges, k, 16)
    assert all(d >= k for d in deg.values())


@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=20),
)
@settings(max_examples=50, deadline=None)
def test_cusum_deviation_closes_at_zero_and_flags_shifts(daily):
    """dev_scaled(t) = n_days*cum(t) - t*total is 0 at t = n_days for
    ANY series, and identically 0 iff the series is constant."""
    total = sum(daily)
    n = len(daily)
    cum = 0
    devs = []
    for t, x in enumerate(daily, 1):
        cum += x
        devs.append(n * cum - t * total)
    assert devs[-1] == 0
    if len(set(daily)) == 1:
        assert all(d == 0 for d in devs)
    if any(d != 0 for d in devs[:-1]):
        assert len(set(daily)) > 1


def _gumbel_key(doc_id: int, weight: int) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[22:32], 16)
    return round(
        (round(math.log(h + 1), 6) - round(math.log(2**40), 6)) / weight, 6
    )


@given(
    st.dictionaries(
        st.integers(0, 10_000), st.integers(1, 1_000_000),
        min_size=2, max_size=30,
    )
)
@settings(max_examples=50, deadline=None)
def test_gumbel_keys_are_negative_and_weight_monotone_per_row(rows):
    """Every key is < 0 (u < 1 always: h+1 <= 2^40 and ln quantization
    keeps the numerator strictly negative except the measure-zero
    h = 2^40 - 1 corner, where it is 0); and for a FIXED row, raising
    the weight raises the key (the Efraimidis-Spirakis invariant that
    makes heavy rows win)."""
    for d, w in rows.items():
        k1 = _gumbel_key(d, w)
        assert k1 <= 0.0
        k2 = _gumbel_key(d, w * 2)
        assert k2 >= k1


@given(st.lists(st.text(alphabet="abcdefghiouy", min_size=1, max_size=12),
                min_size=1, max_size=15))
@settings(max_examples=50, deadline=None)
def test_syllable_regex_matches_python_reference(words):
    """size(regexp_extract_all(w, '[aeiou]+')) == the Python count of
    maximal vowel runs, for arbitrary lowercase words (the exact
    expression both engines run)."""
    for w in words:
        runs = len(re.findall(r"[aeiou]+", w))
        groups = [g for g in re.split(r"[^aeiou]+", w) if g]
        assert runs == len(groups)
