"""GROUP BY ... WITH TOTALS (reference: TOTALS accessor in
SelectStmtContext, ClickHouseParser.py:8931-9030).

Implemented with ``rollup`` + ``grouping_id`` filter: one shuffle computes
both the per-group rows and the grand total (Spark plans rollup as a single
expand+hash-agg), instead of the naive union-of-two-aggregations which scans
the input twice. The totals row carries NULL group keys, matching
ClickHouse's JSON `totals` row semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_totals(
    df: DataFrame, group_cols: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """Per-group aggregate rows plus one grand-total row (NULL keys).

    Keeps only grouping_id 0 (full grouping) and the all-null totals level
    from the rollup lattice — intermediate levels of a multi-key rollup are
    dropped, which is exactly WITH TOTALS (not WITH ROLLUP) semantics.
    """
    gid = F.grouping_id(*[F.col(c) for c in group_cols])
    total_gid = (1 << len(group_cols)) - 1
    return (
        df.rollup(*group_cols)
        .agg(*aggs, gid.alias("__gid"))
        .filter(F.col("__gid").isin(0, total_gid))
        .drop("__gid")
    )
