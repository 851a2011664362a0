"""Query/oracle registry plumbing shared by the queries.* modules."""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ..session import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]


def q6(c: Column) -> Column:
    """Floor-quantize a computed double to 6 decimal digits — the
    cross-engine-safe rendering for oracled score columns. F.round
    HALF_UP works on Spark's SHORTEST-REPR decimal while DuckDB ROUND
    works on the exact binary expansion, so the two disagree whenever
    the 7th digit of the two expansions straddles a rounding boundary
    (data-dependent: green at one SF, red at another). floor(x·1e6+0.5)
    is one IEEE expression both engines evaluate identically; the SQL
    twin is FLOOR((x) * 1000000 + 0.5) / 1000000."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

_TABLE_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}
_LAST_SF: dict[int, str] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load + register the testdata tables once per (session, sf_dir).

    The DataFrame handles are cacheable per (session, sf), but the temp
    VIEWS are one global namespace per session — switching sf_dir must
    re-register them or spark.sql-based queries silently read the previous
    scale factor's data (found by a two-sf interleave probe)."""
    key = (id(spark), sf_dir)
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = load_tables(spark, sf_dir)
    elif _LAST_SF.get(id(spark)) != sf_dir:
        load_tables(spark, sf_dir)  # re-point the temp views
    _LAST_SF[id(spark)] = sf_dir
    return _TABLE_CACHE[key]


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB-runnable ANSI
    SQL equivalent (omit only for genuinely non-SQL-expressible operators —
    the driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
