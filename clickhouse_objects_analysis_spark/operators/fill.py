"""ORDER BY ... WITH FILL [FROM/TO/STEP] + INTERPOLATE.

Grammar anchors: WITH FILL accessors in OrderExprContext
(ClickHouseParser.py:11204-area), interpolateClause (:10080).

Strategy (SURVEY §4.2): generate the dense axis with ``sequence()`` +
``explode`` (inside the plan — no driver collect), anti-join it against the
existing keys, union the missing grid rows with the ORIGINAL rows (so
off-grid and out-of-range input rows survive — ClickHouse WITH FILL never
drops data rows, it only inserts), then carry values forward with a
``last(..., ignorenulls)`` window for INTERPOLATE.

Scale notes: the axis is generated from a 1-row (or per-group) aggregate,
so its size is O(range/step), independent of input rows; the join onto the
axis is an equi join Catalyst can broadcast when the axis is small. The
interpolation window is partitioned by the group keys when ``by`` is given.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def with_fill(
    df: DataFrame,
    order_col: str,
    step: Column,
    from_: Optional[Column] = None,
    to: Optional[Column] = None,
    by: Sequence[str] = (),
    fill_zero: Sequence[str] = (),
    interpolate_prev: Sequence[str] = (),
) -> DataFrame:
    """Densify ``order_col`` (numeric or timestamp) onto a regular grid.

    - ``step``: e.g. ``F.lit(1)`` or ``F.expr("INTERVAL 1 DAY")``.
    - ``from_``/``to``: grid bounds; default = per-group min/max.
    - ``by``: optional group keys — the grid is generated per group.
    - ``fill_zero``: columns set to 0 on synthesized rows.
    - ``interpolate_prev``: columns carried forward from the last non-null
      value (ClickHouse ``INTERPOLATE (c AS c)`` carry-forward form).
    """
    by = list(by)
    lo = from_ if from_ is not None else F.min(order_col)
    hi = to if to is not None else F.max(order_col)
    bounds = df.groupBy(*by).agg(lo.alias("__lo"), hi.alias("__hi")) if by else (
        df.agg(lo.alias("__lo"), hi.alias("__hi"))
    )
    axis = bounds.select(
        *by, F.explode(F.sequence(F.col("__lo"), F.col("__hi"), step)).alias(order_col)
    )
    # Fill rows = grid points with no data row; original rows (including
    # off-grid / out-of-range ones) pass through the union untouched.
    fill_rows = axis.join(
        df.select(*by, order_col).dropDuplicates([*by, order_col]),
        on=[*by, order_col],
        how="left_anti",
    )
    filled = df.unionByName(fill_rows, allowMissingColumns=True)
    for c in fill_zero:
        filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if interpolate_prev:
        w = (
            Window.partitionBy(*by).orderBy(order_col)
            if by
            else Window.orderBy(order_col)
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        for c in interpolate_prev:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled
