"""Property tests for operators/markov.absorption_probability: the
120-step integer recurrence must approximate the EXACT rational
absorption probability (Gaussian elimination over Fraction) on random
small chains, and obey the structural invariants the attribution query
relies on."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from clickhouse_objects_analysis_spark.operators.markov import (
    ITERS,
    SCALE,
    absorption_probability,
)

_CH = ["a", "b", "c"]
_STATES = ["START"] + _CH


def _exact_absorption(counts, removed=None) -> Fraction:
    """Exact v(START) by solving (I−Q)v = c over Fractions."""
    cnt = {}
    for (src, dst), n in counts.items():
        if src == removed:
            continue
        d = "LOSS" if dst == removed else dst
        cnt[(src, d)] = cnt.get((src, d), 0) + n
    states = sorted({s for s, _ in cnt})
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    # rows: v_i - sum_j q_ij v_j = conv_i / tot_i
    aug = [[Fraction(0)] * (k + 1) for _ in range(k)]
    for s in states:
        i = idx[s]
        tot = sum(n for (a, _), n in cnt.items() if a == s)
        aug[i][i] = Fraction(1)
        for (a, d), n in cnt.items():
            if a != s:
                continue
            if d == "CONV":
                aug[i][k] += Fraction(n, tot)
            elif d in idx:
                aug[i][idx[d]] -= Fraction(n, tot)
    # Gaussian elimination (matrix is strictly diagonally dominant for
    # chains with nonzero absorption, so no pivoting needed; guard
    # anyway)
    for col in range(k):
        piv = next(r for r in range(col, k) if aug[r][col] != 0)
        aug[col], aug[piv] = aug[piv], aug[col]
        pv = aug[col][col]
        aug[col] = [x / pv for x in aug[col]]
        for r in range(k):
            if r != col and aug[r][col] != 0:
                f = aug[r][col]
                aug[r] = [x - f * y for x, y in zip(aug[r], aug[col])]
    return aug[idx["START"]][k] if "START" in idx else Fraction(0)


def _chain_strategy():
    """Random transition counts: every transient state gets outgoing
    mass including some absorption, so the chain absorbs a.s."""
    edge = st.integers(min_value=0, max_value=9)
    pos = st.integers(min_value=1, max_value=9)
    return st.fixed_dictionaries(
        {
            (s, d): (pos if d in ("CONV", "LOSS") else edge)
            for s in _STATES
            for d in _CH + ["CONV", "LOSS"]
            if s != d
        }
    )


@given(counts=_chain_strategy())
@settings(max_examples=40, deadline=None)
def test_recurrence_matches_exact_solve(counts):
    counts = {k: v for k, v in counts.items() if v > 0}
    for removed in [None, "a", "b"]:
        got = absorption_probability(counts, removed)
        want = _exact_absorption(counts, removed)
        # geometric convergence: with >= 2/19 absorption mass per step
        # the 120-iter error is far below the 1e-6 oracle rendering
        assert abs(got / SCALE - float(want)) < 1e-7, (removed, counts)
        assert 0 <= got <= SCALE


@given(counts=_chain_strategy())
@settings(max_examples=20, deadline=None)
def test_removal_never_raises_conversion(counts):
    counts = {k: v for k, v in counts.items() if v > 0}
    base = absorption_probability(counts, None)
    for ch in _CH:
        removed = absorption_probability(counts, ch)
        # redirecting a channel's inbound mass to LOSS can only lose
        # conversion paths (up to integer-floor noise per iteration)
        assert removed <= base + ITERS


def test_degenerate_chains():
    # every user converts straight away
    assert absorption_probability({("START", "CONV"): 5}) == SCALE
    # nobody converts
    assert absorption_probability({("START", "LOSS"): 5}) == 0
    # removing the only path kills conversion entirely
    counts = {("START", "a"): 3, ("a", "CONV"): 3}
    assert absorption_probability(counts, "a") == 0
