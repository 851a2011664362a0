"""Skew mitigation: salted joins.

Where it matters at 100 TB: a shuffle join on a key with heavy hitters
puts every row of a hot key into one task — the job runs at the speed of
its worst key. AQE's skew-join splitting handles sort-merge cases
after-the-fact; explicit salting is the planned-for version, and the only
option when the skewed side feeds a non-splittable operator.

Mechanics: the fact side gets a uniform salt in [0, n); the (smaller,
but not broadcastable) side is replicated once per salt value; the join
key becomes (key, salt), fanning each hot key across n tasks. Partial
aggregation is NOT handled here — Spark's hash aggregate already combines
map-side, which is why skewed groupBy needs no salting for algebraic
aggregates.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

SALT_COL = "__salt"


def with_salt(df: DataFrame, unique_cols: Sequence[str], n_salts: int) -> DataFrame:
    """Deterministic uniform salt from a row-identifying column set (a
    hash, not rand() — reruns and retried tasks must agree)."""
    return df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in unique_cols]), F.lit(n_salts)),
    )


def replicated(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the small side with salts 0..n-1 (size × n_salts — the price
    of the technique, which is why n is tens, not thousands)."""
    return df.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    fact_unique_cols: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi join on ``on`` with the fact side salted and the dim side
    replicated: each hot key's rows spread over ``n_salts`` tasks instead
    of one. Result is identical to the unsalted join (the salt matches by
    construction); the helper drops the salt column on the way out."""
    f = with_salt(fact, fact_unique_cols, n_salts)
    d = replicated(dim, n_salts)
    return f.join(d, on=[*on, SALT_COL], how=how).drop(SALT_COL)
