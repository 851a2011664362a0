"""LIMIT BY / LIMIT WITH TIES rewrites.

ClickHouse grammar anchors: limitByClause (ClickHouseParser.py:10153-10186),
WITH TIES in limitClause (:10241-area), TOP n (:9454).

Scale notes: both rewrites are a single window over a shuffle on the
partition keys; for LIMIT BY the window is partitioned (parallel per key
group). ``limit_with_ties`` over a global ORDER BY necessarily has an
unpartitioned window — at 100 TB use it only on pre-aggregated inputs, or
bound the scan first with a cheap `orderBy().limit(n * slack)` pre-pass
(TakeOrderedAndProject) when the order key has no pathological tie mass.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_ROW_COL = "__rn"


def limit_by(
    df: DataFrame,
    by: Sequence[str | Column],
    order: Sequence[str | Column],
    n: int,
    offset: int = 0,
) -> DataFrame:
    """ClickHouse ``LIMIT [offset,] n BY by_cols``: first ``n`` rows per
    distinct ``by`` group, after skipping ``offset`` rows per group.

    ClickHouse leaves intra-group order to the query's ORDER BY; here an
    explicit ``order`` is required so results are deterministic (SURVEY §7
    "ANY-join determinism" applies equally to LIMIT BY).
    """
    w = Window.partitionBy(*by).orderBy(*order)
    rn = F.row_number().over(w)
    return (
        df.withColumn(_ROW_COL, rn)
        .filter((F.col(_ROW_COL) > offset) & (F.col(_ROW_COL) <= offset + n))
        .drop(_ROW_COL)
    )


def limit_with_ties(
    df: DataFrame, order: Sequence[str | Column], n: int
) -> DataFrame:
    """``LIMIT n WITH TIES``: the first ``n`` rows in ``order`` plus every
    row tying the n-th on the order key — i.e. ``rank() <= n``."""
    w = Window.orderBy(*order)
    return (
        df.withColumn(_ROW_COL, F.rank().over(w))
        .filter(F.col(_ROW_COL) <= n)
        .drop(_ROW_COL)
    )
