"""LIMIT BY / LIMIT WITH TIES rewrites.

ClickHouse grammar anchors: limitByClause (ClickHouseParser.py:10153-10186),
WITH TIES in limitClause (:10241-area), TOP n (:9454).

Scale notes: LIMIT BY is a single partitioned window over a shuffle on
the partition keys (parallel per key group). ``limit_with_ties`` is a
distributed top-n (TakeOrderedAndProject — per-partition heaps, driver
merge of P·n candidates) followed by a broadcast semi-join of the ≤ n
boundary keys; no unpartitioned window anywhere, any tie mass on the
n-th key streams through the semi-join filter map-side.
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
    row tying the n-th on the order key — i.e. ``rank() <= n``.

    Distributed rewrite (no global single-task rank): ``rank() <= n``
    holds exactly when the row's order-key tuple appears among the keys
    of the first ``n`` rows (a key group with rank ≤ n starts at
    position ≤ n, so at least one of its rows is in the top n;
    conversely any key present in the top n has rank ≤ n).  So:
    distributed top-n (``orderBy().limit(n)`` → TakeOrderedAndProject)
    → distinct keys (≤ n rows) → broadcast LEFT SEMI join back.
    ``order`` items must be projectable expressions (no ``.desc()``
    sort-order wrappers) — rank-tie semantics need the raw key anyway.
    """
    names = [f"__ties_k{i}" for i in range(len(order))]
    cols = [
        (o if isinstance(o, Column) else F.col(o)).alias(nm)
        for o, nm in zip(order, names)
    ]
    aug = df.select("*", *cols)
    top_keys = (
        aug.select(*names)
        .orderBy(*names)
        .limit(n)
        .distinct()
        .select(*[F.col(nm).alias(f"__ties_b{i}") for i, nm in enumerate(names)])
    )
    # null-SAFE equality: rank() puts NULL keys in a rank group too
    # (NULLS FIRST), so a null boundary key must still match
    cond = None
    for i, nm in enumerate(names):
        c = F.col(nm).eqNullSafe(F.col(f"__ties_b{i}"))
        cond = c if cond is None else cond & c
    return aug.join(F.broadcast(top_keys), cond, "left_semi").drop(*names)
