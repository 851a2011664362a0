"""ASOF and ANY join rewrites.

Grammar anchors: ASOF/ANY accessors in JoinOpInnerContext
(ClickHouseParser.py:10596) and JoinOpLeftRightContext (:10618).

Semantics implemented (ClickHouse manual + grammar):
- ASOF JOIN: for each left row, the single right row with the same equi
  keys and the greatest right timestamp <= left timestamp (``backward``,
  the ClickHouse default ``>=`` form); ``forward`` gives smallest >=.
- ANY JOIN: at most one right match per left row (first by an explicit
  deterministic order — the reference grammar is order-nondeterministic,
  we require the caller to pin it; SURVEY §7 hard-parts list).

Scale notes: the union-and-window ASOF implementation is ONE shuffle on the
equi keys and never materializes the (left x right-candidates) blow-up a
range join would. State per key group is O(1) (a running `last`), so skew
on the equi key is the only hazard — same hazard any keyed join has, and
AQE skew handling applies. ANY join is a window dedup (one shuffle) + a
normal equi join that Catalyst may broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
    allow_exact: bool = True,
    how: str = "inner",
) -> DataFrame:
    """As-of join via the union-and-window technique.

    Tags both inputs, unions them, sorts each equi-key group by timestamp,
    and propagates the most recent right-side values onto left rows with a
    running ``last(..., ignorenulls=True)`` window. Matched right columns
    arrive as ``value_cols`` plus ``matched_<right_ts>``.

    ``right`` should be unique per (by, right_ts) for deterministic output
    (ClickHouse ASOF has the same requirement on the inequality column).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    by = list(by)
    value_cols = list(value_cols)
    matched_ts = f"matched_{right_ts}"

    # Right rows sort before left rows at equal ts iff exact matches count.
    right_rank = 0 if allow_exact else 2
    r = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.col(right_ts).alias(matched_ts),
        *[F.col(c) for c in value_cols],
    ).withColumn("__side", F.lit(right_rank))
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    # Side order is ascending in BOTH directions: at equal ts the right row
    # must precede the left row iff exact matches count, and right_rank
    # (0 or 2, vs left's 1) already encodes that. (Flipping it for forward
    # inverted allow_exact at ties — caught by the property suite.)
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = unioned
    for c in [matched_ts, *value_cols]:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = filled.filter(F.col("__side") == 1).drop("__ts", "__side")
    if how == "inner":
        out = out.filter(F.col(matched_ts).isNotNull())
    return out


def any_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    order: Sequence[str | Column],
    how: str = "left",
) -> DataFrame:
    """ANY JOIN: dedupe the right side to its first row per key (by
    ``order``), then join normally — each left row gets at most one match.

    r15 (OPTIMIZATION_r15.md, the gopher min-struct recipe): when every
    ``order`` entry is a plain column NAME (ascending by convention),
    the dedup is ``min(struct(order…, payload…))`` — identical row to
    the row_number window when (on, order) is tie-free (ties were
    arbitrary under the window too), and the aggregate partial-combines
    map-side instead of sorting the whole right side per key. Column
    expressions (e.g. ``desc()``) keep the window path."""
    if all(isinstance(o, str) for o in order):
        payload = [c for c in right.columns if c not in on]
        rest = [c for c in payload if c not in order]
        deduped = (
            right.groupBy(*on)
            .agg(F.min(F.struct(*order, *rest)).alias("__f"))
            .select(
                *on, *[F.col(f"__f.{c}").alias(c) for c in payload]
            )
        )
    else:
        w = Window.partitionBy(*on).orderBy(*order)
        deduped = (
            right.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    return left.join(deduped, on=list(on), how=how)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Binned range join: match each point row to every interval row with
    ``lo <= point < hi`` — WITHOUT a broadcast-nested-loop join.

    The grammar reaches interval predicates only through theta ON
    conditions (joinConstraintClause ClickHouseParser.py:10970); with no
    equi key Spark executes those as BNLJ — O(|L|·|R|) compares and a
    broadcast of one whole side, which dies at scale. The standard fix
    (e.g. Databricks' bin-based range join): quantize the range dimension
    into width-``bin_width`` bins, explode each interval into the bins it
    overlaps, map each point to its single bin, equi-join on the bin id,
    then re-check the exact predicate. Each (point, interval) pair meets
    in exactly one bin — the point's — so no dedup pass is needed.

    Cost: shuffle ~|L| + |R|·(avg interval span / bin_width) narrow rows
    on an 8-byte key; AQE skew-splitting applies because it is a plain
    shuffle join. Pick bin_width ≈ median interval span so intervals
    explode to O(1) bins each.

    ``point_col``/``lo_col``/``hi_col`` must be numeric (cast timestamps
    to epoch seconds first). ``how`` supports "inner" and "left"
    ("left" keeps unmatched points with nulls, via the bin-key outer join
    + predicate-aware null preservation).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    # floor-division binning (cast truncates toward zero — wrong for
    # negative values)
    p_bin = F.floor(F.col(point_col) / bin_width).cast("long").alias("__bin")
    i_bins = F.explode(
        F.sequence(
            F.floor(F.col(lo_col) / bin_width).cast("long"),
            F.floor(F.col(hi_col) / bin_width).cast("long"),
        )
    ).alias("__bin")
    matched = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    right = intervals.select("*", i_bins)
    if how == "inner":
        left = points.select("*", p_bin)
        return (
            left.join(right, on="__bin", how="inner")
            .filter(matched)
            .drop("__bin")
        )
    # left join: row identity via a synthetic id (point values may repeat)
    left = points.select(
        "*", p_bin, F.monotonically_increasing_id().alias("__rid")
    )
    hit = left.join(right, on="__bin", how="inner").filter(matched)
    missed = left.join(
        hit.select("__rid").distinct(), on="__rid", how="left_anti"
    )
    for c in intervals.columns:
        missed = missed.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return hit.unionByName(missed).drop("__bin", "__rid")
