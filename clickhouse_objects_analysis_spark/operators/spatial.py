"""Grid-bucketed spatial self-join: all point pairs within an L∞
radius, without a cross join.

Reference parity note: the reference repo has no spatial surface; this
is the charter's "custom operator Spark lacks" case (SURVEY §7 —
composition of existing DataFrame ops): the classic fixed-grid spatial
join every large-scale geo/embedding-2D pipeline needs, and the same
cell-bucketing pattern the dedup stack uses for LSH bands.

Scale design: with cell size = radius, any pair within L∞ distance r
lands in the SAME or ADJACENT cells, so one side replicates to its 3×3
cell neighborhood (constant 9× map-side fan-out) and the join is a
plain hash equi-join on cell id — candidate volume is Σ |cell|·|3×3
neighborhood|, which for bounded point density is linear in points,
never the O(n²) cross product. Each unordered pair is emitted exactly
once: the replicated copy of `a` that lands in `b`'s HOME cell is the
only replica meeting `b`'s home row, and the id_a < id_b filter keeps
one orientation. Skewed cells (urban hot spots) are ordinary join skew
— AQE's skew-join split applies, no custom salting needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def grid_neighbor_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All pairs (id_a, id_b, dx, dy) with |x_a−x_b| ≤ radius AND
    |y_a−y_b| ≤ radius, id_a < id_b. Coordinates must be integral
    (exact cell arithmetic; callers quantize floats first)."""
    home = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
        (F.floor(F.col(x_col) / radius)).cast("long").alias("cx"),
        (F.floor(F.col(y_col) / radius)).cast("long").alias("cy"),
    )
    offsets = F.expr(
        "array(-1L, 0L, 1L)"
    )
    replicated = (
        home.select(
            F.col("pid").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.explode(offsets).alias("ox"),
            F.col("cx"),
            F.col("cy"),
        )
        .select(
            "id_a", "xa", "ya",
            (F.col("cx") + F.col("ox")).alias("jcx"),
            F.explode(offsets).alias("oy"),
            F.col("cy"),
        )
        .select(
            "id_a", "xa", "ya", "jcx",
            (F.col("cy") + F.col("oy")).alias("jcy"),
        )
    )
    right = home.select(
        F.col("pid").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("cx").alias("jcx"),
        F.col("cy").alias("jcy"),
    )
    return (
        replicated.join(right, ["jcx", "jcy"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("xa") - F.col("xb")) <= radius)
            & (F.abs(F.col("ya") - F.col("yb")) <= radius)
        )
        .select(
            "id_a",
            "id_b",
            (F.col("xa") - F.col("xb")).alias("dx"),
            (F.col("ya") - F.col("yb")).alias("dy"),
        )
    )
