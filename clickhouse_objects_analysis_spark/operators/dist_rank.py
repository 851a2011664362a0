"""Distributed exact rank / cumulative-sum primitive.

The reference grammar admits rank statistics (``rankCorr``,
``mannWhitneyUTest``, ``arrayAUC``, ``kolmogorovSmirnovTest`` — plain
aggregate-function names reachable from the generic function rule,
generated_ch_parser/ClickHouseParser.py:15571) over arbitrary-size
groups.  A naive Spark translation ranks with
``Window.orderBy(...)`` and no partition key, which moves the whole
input through ONE task — correct at test scale, a wall at 100 TB.

This module is the scale-safe alternative promised by the round-4
docstrings: the **two-pass partition-histogram rank**.

    1. Collapse rows to a distinct-value histogram
       (``groupBy(keys, value) → cnt, extra aggs``) — an ordinary hash
       shuffle with map-side combine; a hot value becomes ONE row, so
       value skew cannot skew the sort.
    2. ``repartitionByRange(keys…, value)`` — Spark's sampling range
       partitioner spreads the distinct values over P ordered,
       contiguous, disjoint ranges.  No task ever sees more than ~1/P
       of the distinct values.
    3. Within each range partition: a *partitioned* window
       (``partitionBy(pid, keys).orderBy(value)``) computes the local
       running sums.  Every sort is bounded by the partition slice.
    4. Per-(partition, key) totals — at most P × |keys| rows — are
       prefix-summed into global offsets and broadcast-joined back.

``global_cumsum = local_cumsum + offset`` is exact integer arithmetic;
partition boundaries cannot change the answer, so the result is
deterministic regardless of how the range sampler splits the data.

From the inclusive cumulative count the usual rank identities follow
for each distinct value ``v`` with multiplicity ``cnt``:

    below = cum_cnt − cnt            (# rows strictly smaller)
    rank  = below + 1                (min rank, ties share it)
    r2    = 2·below + cnt + 1        (integral 2·avg_rank — the
                                      ``2·rank + ties − 1`` form used by
                                      the wave-6 moment math)

AQE note: adaptive coalescing merges only *adjacent* shuffle
partitions, so ``spark_partition_id()`` still enumerates contiguous
ranges in ascending value order — the offset prefix-sum stays correct.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

_PID = "__dr_pid"


def dist_cumsum(
    df: DataFrame,
    order_col: str | Sequence[str],
    sum_cols: Sequence[str],
    keys: Sequence[str] = (),
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive cumulative sums of ``sum_cols`` per ``keys`` group,
    ordered by ``order_col`` (a column name or a composite of names),
    with NO single-task global sort.

    Adds one ``cum_<c>`` (long) column per input sum column.  Intended
    for distinct-value histograms: rows must be unique per
    ``(keys, order_col)`` and the order columns null-free — both hold
    by construction when the input is a ``groupBy(keys, value)`` result.

    Plan shape: RangeExchange(P) → hash Exchange on (pid, keys) for the
    local windows (each task sorts only its range slice) → broadcast
    join of the P×|keys| offset table.  The only unpartitioned window
    in the job runs over that offset table.

    INVARIANT: the ``totals`` and ``local`` branches below must observe
    IDENTICAL range-partition boundaries — the (pid, keys) offset join
    is silently wrong otherwise.  Catalyst normally guarantees this by
    reusing the single range exchange, but with
    ``spark.sql.exchange.reuse=false`` each branch would re-sample its
    own boundaries, so we pin the partitioning with a lazy
    ``localCheckpoint`` right after the exchange: both branches then
    read one materialized RDD regardless of reuse settings (covered by
    tests/test_dist_rank.py with exchange reuse disabled).
    """
    order_cols = (
        [order_col] if isinstance(order_col, str) else list(order_col)
    )
    part_cols = [*keys, *order_cols]
    if num_partitions is None:
        h = df.repartitionByRange(*part_cols)
    else:
        h = df.repartitionByRange(num_partitions, *part_cols)
    h = h.withColumn(_PID, F.spark_partition_id()).localCheckpoint(eager=False)

    # Pass 1: per-(partition, key) totals — tiny (≤ P × |key groups|).
    totals = h.groupBy(_PID, *keys).agg(
        *[F.sum(c).alias(f"__tot_{c}") for c in sum_cols]
    )
    w_off = (
        Window.partitionBy(*keys).orderBy(_PID)
        if keys
        else Window.orderBy(_PID)
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _PID,
        *keys,
        *[
            F.coalesce(F.sum(f"__tot_{c}").over(w_off), F.lit(0))
            .cast("long")
            .alias(f"__off_{c}")
            for c in sum_cols
        ],
    )

    # Pass 2: local inclusive cumsum within each range slice, then add
    # the global offset.  The window HAS partition keys — no task sorts
    # more than its slice.
    w_loc = Window.partitionBy(_PID, *keys).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = h.select(
        "*",
        *[
            F.sum(c).over(w_loc).cast("long").alias(f"__loc_{c}")
            for c in sum_cols
        ],
    )
    joined = local.join(F.broadcast(offsets), [_PID, *keys])
    out_cols = [c for c in df.columns]
    return joined.select(
        *out_cols,
        *[
            (F.col(f"__loc_{c}") + F.col(f"__off_{c}"))
            .cast("long")
            .alias(f"cum_{c}")
            for c in sum_cols
        ],
    )


def dist_ntile(
    df: DataFrame,
    n: int,
    order_cols: Sequence[str],
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` without a global
    single-task sort.

    SQL ntile semantics depend on each row's exact global POSITION in
    the total order (with ``N = q·n + r`` rows, buckets ``1..r`` get
    ``q+1`` rows, buckets ``r+1..n`` get ``q``) — a value-threshold
    bucketing can't reproduce the tie splits.  Positions come from
    ``dist_cumsum`` over a unit column (rows must be unique per
    ``order_cols`` — include a tie-break id), the row count joins as a
    one-row broadcast, and the bucket is then pure map-side integer
    arithmetic:

        p < r·(q+1)  →  bucket = p DIV (q+1) + 1
        otherwise    →  bucket = r + (p − r·(q+1)) DIV q + 1

    (When N < n, every row has p < r so the q = 0 branch never
    evaluates.)
    """
    ranked = dist_cumsum(
        df.withColumn("__one", F.lit(1)),
        list(order_cols),
        ["__one"],
        num_partitions=num_partitions,
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__n_tot"))
    b = ranked.crossJoin(F.broadcast(total)).withColumn(
        "__p", (F.col("cum___one") - 1).cast("long")
    )
    # exact int64 arithmetic throughout (a double floor(p/q) would lose
    # exactness past 2^53 rows)
    bucket = F.expr(
        f"CAST(CASE WHEN __p < (__n_tot % {n}) * (__n_tot DIV {n} + 1) "
        f"THEN __p DIV (__n_tot DIV {n} + 1) "
        f"ELSE (__n_tot % {n}) "
        f"  + (__p - (__n_tot % {n}) * (__n_tot DIV {n} + 1)) "
        f"    DIV (__n_tot DIV {n}) "
        f"END + 1 AS INT)"
    )
    out = [c for c in df.columns if c != "__one"]
    return b.select(*out, bucket.alias(out_col))


def weighted_quantile_boundary_cw(
    rows: DataFrame,
    group_col: str,
    value_col: str,
    thresholds: Sequence[tuple[int, int]],
    bucket_width: int,
    weight_col: str = "__w",
) -> DataFrame:
    """Exact cumulative weights for the rows that can decide weighted
    quantile thresholds — WITHOUT a fact-sized shuffle (r15,
    guide §8 "decide with small rows"; VERDICT r14 #6).

    ``rows`` carries raw ``(group_col, value_col, weight_col)`` rows
    (integral weights). Each threshold ``(a, b)`` selects the boundary
    where ``a·cw(v) >= b·tw`` first holds (cw = cumulative weight
    through value v including ties, tw = group total).  Any
    ``min/max(CASE WHEN a·cw {>=,<=} b·tw ...)`` selector evaluated
    over the returned frame equals the same selector over the full
    cumsum, because the returned frame contains every value of each
    threshold's CROSSING bucket and of the nonzero bucket immediately
    before it:

    - ``min{v : a·cw >= b·tw}`` lies in the crossing bucket (values in
      earlier buckets have cw <= cumb(prev) < b·tw/a); later rows only
      add larger v to the min.
    - ``max{v : a·cw <= b·tw}`` (and its cw) is either in the crossing
      bucket or is the LAST value of the previous nonzero bucket — both
      included with exact cw; earlier rows only add smaller v.

    Plan shape: one coarse bucket histogram (groupBy(group, bucket) —
    map-side combined, bucket count is DOMAIN-bounded, not data-bounded)
    → integer prefix sums over that tiny table (one small window) →
    broadcast the boundary-bucket set back onto a second scan of the
    fact (map-side inner join drops ~everything before any shuffle) →
    exact in-bucket cumsum over the tiny candidate histogram.  Zero
    fact-sized exchanges; the price is a second columnar scan of the
    three input columns, which at 100 TB is parallel I/O instead of a
    network-crossing shuffle (the shipped dist_cumsum shape paid TWO
    near-fact-sized exchanges because prices are near-unique).  All
    comparisons are int64 — no float crosses a selection boundary.

    Returns a tiny DataFrame ``(group_col, value_col, cw, tw)``.
    """
    g, y = group_col, value_col
    b = rows.withColumn(
        "__b", F.floor(F.col(y) / F.lit(bucket_width)).cast("long")
    )
    bs = b.groupBy(g, "__b").agg(F.sum(weight_col).alias("bw"))
    wo = Window.partitionBy(g).orderBy("__b")
    bs2 = bs.select(
        g,
        "__b",
        "bw",
        F.sum("bw")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cumb"),
        F.sum("bw").over(Window.partitionBy(g)).alias("tw"),
    ).withColumn("cumb_next", F.lead("cumb").over(wo))
    # The tiny prefix-summed bucket table feeds TWO broadcast branches
    # (boundary set + group totals); a lazy localCheckpoint shares one
    # histogram scan between them instead of re-scanning the fact per
    # branch (the dist_cumsum pinning discipline).
    bs2 = bs2.localCheckpoint(eager=False)
    keep = F.lit(False)
    for a_k, b_k in thresholds:
        crossing = (a_k * F.col("cumb") >= b_k * F.col("tw")) & (
            a_k * (F.col("cumb") - F.col("bw")) < b_k * F.col("tw")
        )
        before = (
            (a_k * F.col("cumb") < b_k * F.col("tw"))
            & F.col("cumb_next").isNotNull()
            & (a_k * F.col("cumb_next") >= b_k * F.col("tw"))
        )
        keep = keep | crossing | before
    bounds = bs2.filter(keep).select(
        g, "__b", (F.col("cumb") - F.col("bw")).alias("__off")
    )
    tws = bs2.groupBy(g).agg(F.max("tw").alias("tw"))
    cand = b.join(F.broadcast(bounds), [g, "__b"])
    ch = cand.groupBy(g, "__b", "__off", y).agg(
        F.sum(weight_col).alias("__cw0")
    )
    wy = (
        Window.partitionBy(g, "__b")
        .orderBy(y)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ch.select(
        g, y, (F.col("__off") + F.sum("__cw0").over(wy)).alias("cw")
    )
    return out.join(F.broadcast(tws), g)


def histogram_r2(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    extra_aggs: Mapping[str, Column] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distinct-value histogram with exact distributed rank columns.

    Returns one row per distinct ``(keys…, value_col)`` carrying:

    - ``cnt``  — multiplicity (long)
    - ``below`` — rows strictly smaller within the key group (long)
    - ``r2``   — integral 2·avg_rank = 2·below + cnt + 1 (long)
    - one column per ``extra_aggs`` entry (aggregated over the tied rows)

    This is the drop-in distributed replacement for
    ``2*F.rank().over(Window.orderBy(v)) + count().over(partitionBy(v)) - 1``:
    the rank-sum moment math downstream is unchanged, only the rank
    computation stops being a single-task sort.
    """
    extra_aggs = dict(extra_aggs or {})
    h = df.groupBy(*keys, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        *[c.alias(name) for name, c in extra_aggs.items()],
    )
    h = dist_cumsum(
        h, value_col, ["cnt"], keys=keys, num_partitions=num_partitions
    )
    return h.select(
        *keys,
        value_col,
        "cnt",
        (F.col("cum_cnt") - F.col("cnt")).alias("below"),
        (2 * F.col("cum_cnt") - F.col("cnt") + 1).alias("r2"),
        *extra_aggs.keys(),
    )
