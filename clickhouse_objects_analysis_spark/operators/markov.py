"""Absorbing-chain fixed point as an exact integer recurrence.

Shared by queries/r10_wave6.markov_removal_attribution and its tests:
given first-order transition COUNTS over states with absorbers CONV and
LOSS, the absorption probability into CONV is the fixed point of
v(s) = (n(s→CONV) + Σ_t n(s→t)·v(t)) / n(s→·). Running it as an
INTEGER recurrence (probabilities scaled by ``scale``, floor division,
Python big-ints) for a fixed iteration count makes the value a pure
function of the counts — any engine that replays the same integer steps
(the DuckDB MATERIALIZED-CTE ladder does) produces bit-identical
output, so cross-engine agreement is by construction, not float luck.
"""

from __future__ import annotations

from collections.abc import Mapping

SCALE = 10**12
ITERS = 120


def absorption_probability(
    counts: Mapping[tuple[str, str], int],
    removed: str | None = None,
    scale: int = SCALE,
    iters: int = ITERS,
) -> int:
    """Scaled absorption probability into 'CONV' from 'START'.

    ``removed`` redirects every transition INTO that channel to 'LOSS'
    and drops the channel's own outgoing rows (the standard
    removal-effect surgery). Returns v(START) as an integer in
    [0, scale]; geometric convergence leaves the ``iters``-step iterate
    within ~(spectral radius)^iters of the true fixed point."""
    cnt: dict[tuple[str, str], int] = {}
    for (src, dst), n in counts.items():
        if src == removed:
            continue
        d = "LOSS" if dst == removed else dst
        cnt[(src, d)] = cnt.get((src, d), 0) + n
    states = sorted({s for s, _ in cnt})
    outgoing: dict[str, list[tuple[str, int]]] = {s: [] for s in states}
    conv: dict[str, int] = {s: 0 for s in states}
    tot: dict[str, int] = {s: 0 for s in states}
    for (src, dst), n in cnt.items():
        tot[src] += n
        if dst == "CONV":
            conv[src] += n
        outgoing[src].append((dst, n))
    v = {s: 0 for s in states}
    for _ in range(iters):
        v = {
            s: (
                conv[s] * scale
                + sum(n * v[d] for d, n in outgoing[s] if d in v)
            )
            // tot[s]
            for s in states
        }
    return v.get("START", 0)
