"""Round-7 wave 13: session-3 registry additions.

gd_logistic_regression — ClickHouse ``stochasticLogisticRegression``
(the last "unclaimed" name in the translation-table audit's backlog),
re-expressed like its sibling ``gd_linear_regression``
(r6_wave2.py): full-batch deterministic gradient descent in integer
fixed point, so the whole trajectory — and therefore the driver's
value hash — is bit-identical in the DuckDB replay.

The logistic link is the softsign sigmoid p = 1/2 + z/(2(1+|z|)),
not exp-based 1/(1+e^-z): e^x is the one sub-expression whose last
ulp is NOT pinned down by IEEE-754 across engines (JVM Math.exp vs
DuckDB's libm may differ), and a last-ulp difference under a floor()
poisons the integer trajectory. Softsign needs only *,+,/,abs —
all correctly-rounded IEEE ops that are deterministic given identical
inputs — and keeps the logistic shape (monotone, (0,1), p(0)=1/2).
The docstring-level contract mirrors ClickHouse's: a learned (w, b)
for P(label | feature), trained by gradient steps; the exact link
function is an implementation detail CH also leaves tunable
(its ``stochasticLogisticRegression`` takes method parameters).

Reference parity target: clickhouse_objects_analysis is an analysis
repo (ch_view_dependencies.py); the ML-aggregate names come from the
ClickHouse function surface its DDL corpus can reference.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .registry import query, tables
from .sources_queries import _sf_key


def _gdl_step(fact: DataFrame, state: DataFrame) -> DataFrame:
    """One full-batch logistic gradient step in integer micro-units.

    state is a 1-row (w, b) frame broadcast into the fact scan. Per
    row: z = w·x + b (micro), p = 500000 + sign(z)·floor(500000·|z| /
    (1000000 + |z|)) — the softsign sigmoid quantized to micro-units
    entirely from integer inputs, so the float divide sees identical
    operands in both engines. Gradient sums are exact DECIMAL(38,0)
    (order-independent, map-side combinable); the lr update reuses the
    SIGN·FLOOR(ABS/d) truncating-division recipe with d = 64·n. At
    100 TB: cache the two-column projection once; each step is one
    map-side-combined aggregation, shuffling only partial sums."""
    z = F.col("w") * F.col("x") + F.col("b")
    az = F.abs(z)
    p = F.lit(500000).cast("long") + (
        F.signum(z.cast("double")).cast("long")
        * F.floor(
            (F.lit(500000.0) * az.cast("double"))
            / (F.lit(1000000) + az).cast("double")
        ).cast("long")
    )
    r = p - F.col("ymicro")
    grads = fact.join(F.broadcast(state)).agg(
        F.sum((r * F.col("x")).cast("decimal(38,0)")).alias("gw"),
        F.sum(r.cast("decimal(38,0)")).alias("gb"),
        F.count("*").alias("n"),
        F.first("w").alias("w"),
        F.first("b").alias("b"),
    )
    div = 64 * F.col("n")

    def upd(pcol: str, g: str):
        q = F.signum(F.col(g).cast("double")) * F.floor(
            F.abs(F.col(g)).cast("double") / div
        )
        return (F.col(pcol) - q).cast("long").alias(pcol)

    return grads.select(upd("w", "gw"), upd("b", "gb"), "n")


_GDL_ORACLE_STEP = """
    {out} AS (
        SELECT CAST({prev}.w - SIGN(CAST(g.gw AS DOUBLE))
                    * FLOOR(ABS(CAST(g.gw AS DOUBLE)) / (64 * g.n))
                    AS BIGINT) AS w,
               CAST({prev}.b - SIGN(CAST(g.gb AS DOUBLE))
                    * FLOOR(ABS(CAST(g.gb AS DOUBLE)) / (64 * g.n))
                    AS BIGINT) AS b,
               g.n AS n
        FROM (SELECT SUM(CAST((q.p - q.ymicro) * q.x
                              AS DECIMAL(38,0))) AS gw,
                     SUM(CAST(q.p - q.ymicro AS DECIMAL(38,0))) AS gb,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM (SELECT f.x, f.ymicro,
                           500000 + CAST(SIGN(CAST({prev}.w * f.x
                                      + {prev}.b AS DOUBLE)) AS BIGINT)
                             * CAST(FLOOR(
                                 (500000.0 * CAST(ABS({prev}.w * f.x
                                      + {prev}.b) AS DOUBLE))
                                 / CAST(1000000 + ABS({prev}.w * f.x
                                      + {prev}.b) AS DOUBLE))
                               AS BIGINT) AS p
                    FROM fact f CROSS JOIN {prev}) q) g
             CROSS JOIN {prev}
    )"""


@query(
    "gd_logistic_regression",
    oracle=(
        """
    WITH fact AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(CASE WHEN l_returnflag = 'R' THEN 1000000
                         ELSE 0 END AS BIGINT) AS ymicro
        FROM lineitem
    ),
    s0 AS (SELECT CAST(0 AS BIGINT) AS w, CAST(0 AS BIGINT) AS b),
    """
        + _GDL_ORACLE_STEP.format(out="s1", prev="s0")
        + ","
        + _GDL_ORACLE_STEP.format(out="s2", prev="s1")
        + ","
        + _GDL_ORACLE_STEP.format(out="s3", prev="s2")
        + """
    SELECT w AS w_micros, b AS b_micros, n AS n_rows FROM s3
    """
    ),
)
def gd_logistic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse stochasticLogisticRegression as its deterministic
    distributed twin: three full-batch gradient steps (lr=1/64)
    fitting P(l_returnflag = 'R') ≈ sigmoid(w·l_quantity + b) in
    integer micro-units with the softsign link (module docstring: why
    not exp). Same execution contract as gd_linear_regression — each
    step one map-side-combined aggregation, 1-row state broadcast back
    into the next scan."""
    li = tables(spark, sf_dir)["lineitem"]
    fact = li.select(
        F.col("l_quantity").cast("long").alias("x"),
        F.when(F.col("l_returnflag") == "R", F.lit(1000000))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ymicro"),
    )
    state = spark.range(1).select(
        F.lit(0).cast("long").alias("w"), F.lit(0).cast("long").alias("b")
    )
    for _ in range(3):
        state = _gdl_step(fact, state)
    return state.select(
        F.col("w").alias("w_micros"),
        F.col("b").alias("b_micros"),
        F.col("n").alias("n_rows"),
    )


@query(
    "parts_storage_stats",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS part_month,
           CAST(1 AS BIGINT) AS parts,
           CAST(COUNT(*) AS BIGINT) AS part_rows,
           CAST(1 AS BIGINT) AS row_groups,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def parts_storage_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``system.parts`` introspection, Spark-shaped: snapshot
    orders into a month-partitioned parquet layout (MergeTree's
    classic ``toYYYYMM`` partitioning,
    ch_view_dependencies.py's system-table stance applied to parts),
    then read back ONLY the parquet footers — per-part row counts, row
    group counts, and the o_orderkey min/max zone stats the planner
    prunes on. The oracle re-derives every number from the table
    itself (GROUP BY month, COUNT/MIN/MAX), so the check proves the
    footer metadata agrees with the data — the same invariant that
    makes partition pruning sound.

    100 TB: the repartition("part_month") before the write pins one
    file per part (hash-colocated, dynamic partition write); the
    footer scan ships only paths to executors and reads ~KB footers
    via pyarrow in mapInPandas — never row data. A petabyte table's
    million files parallelize across the path DataFrame; the driver
    glob below would become a distributed file-index read."""
    import glob as _glob
    import os as _os

    import pandas as pd

    from ..sources.io import scratch_path

    o = tables(spark, sf_dir)["orders"]
    dest = scratch_path("parts", _sf_key(sf_dir), "orders_parts")
    (
        o.withColumn(
            "part_month", F.date_format("o_orderdate", "yyyy-MM")
        )
        .repartition("part_month")
        .write.partitionBy("part_month")
        .mode("overwrite")
        .parquet(dest)
    )
    paths = sorted(
        _glob.glob(_os.path.join(dest, "part_month=*", "*.parquet"))
    )
    files = spark.createDataFrame(
        [(p,) for p in paths], "path string"
    ).repartition(min(32, max(1, len(paths))))

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                names = md.schema.to_arrow_schema().names
                ok_idx = names.index("o_orderkey")
                mins, maxs = [], []
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ok_idx).statistics
                    # A writer may omit statistics, and an all-null row
                    # group carries none even when enabled.
                    if st is not None and st.has_min_max:
                        mins.append(st.min)
                        maxs.append(st.max)
                part = [
                    seg.split("=", 1)[1]
                    for seg in path.split(_os.sep)
                    if seg.startswith("part_month=")
                ][0]
                rows.append(
                    {
                        "part_month": part,
                        "file_rows": md.num_rows,
                        "row_groups": md.num_row_groups,
                        "min_ok": min(mins) if mins else None,
                        "max_ok": max(maxs) if maxs else None,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "part_month", "file_rows", "row_groups",
                    "min_ok", "max_ok",
                ],
            )

    stats = files.mapInPandas(
        read_footers,
        "part_month string, file_rows long, row_groups long, "
        "min_ok long, max_ok long",
    )
    return (
        stats.groupBy("part_month")
        .agg(
            F.count(F.lit(1)).cast("long").alias("parts"),
            F.sum("file_rows").cast("long").alias("part_rows"),
            F.sum("row_groups").cast("long").alias("row_groups"),
            F.min("min_ok").cast("long").alias("min_orderkey"),
            F.max("max_ok").cast("long").alias("max_orderkey"),
        )
        .orderBy("part_month")
    )


@query(
    "bm25_retrieval",
    oracle="""
    WITH w AS (SELECT doc_id,
                      unnest(list_filter(
                          string_split_regex(trim(text), '\\s+'),
                          x -> length(x) > 0)) AS w
               FROM documents),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM w GROUP BY doc_id, w),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen
           FROM w GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                     CAST(SUM(dlen) AS BIGINT) AS total_len
              FROM dl),
    dfreq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY w),
    qt AS (SELECT w, df FROM (
               SELECT w, df, row_number() OVER (ORDER BY df DESC, w) AS r
               FROM (SELECT w, df FROM dfreq
                     ORDER BY df DESC, w LIMIT 30))
           WHERE r IN (10, 20, 30)),
    cand AS (SELECT t.doc_id, t.tf, q.df, d.dlen, s.n_docs, s.total_len
             FROM tf t JOIN qt q ON t.w = q.w
                       JOIN dl d ON t.doc_id = d.doc_id
             CROSS JOIN stats s),
    sc AS (SELECT doc_id,
                  CAST(FLOOR(
                    ln((CAST(n_docs AS DOUBLE) - df + 0.5)
                       / (df + 0.5) + 1.0)
                    * ((tf * 2.2)
                       / (tf + 1.2 * (0.25 + 0.75 *
                            (CAST(dlen AS DOUBLE)
                             / (CAST(total_len AS DOUBLE) / n_docs)))))
                    * 1000000.0 + 0.5) AS BIGINT) AS s_micro
           FROM cand)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS matched_terms,
           CAST(SUM(s_micro) AS BIGINT) AS score_micro
    FROM sc GROUP BY doc_id
    ORDER BY score_micro DESC, doc_id LIMIT 10
    """,
)
def bm25_retrieval_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 retrieval (k1=1.2, b=0.75) over the documents
    table — the keyword-retrieval complement to the embedding-side ANN
    stack (similarity.py) and the scoring sibling of tfidf_top_terms.
    The three query terms are data-derived (document-frequency ranks
    10/20/30 — mid-frequency terms, not stopword salad) so both
    engines pick identical queries with no literal baked in.

    Inverted-index shape, never all-pairs: tf is the one full
    (doc, term) shuffle (map-side combined); the 3-term query table
    broadcasts into it, shrinking the stream to candidate postings
    before the doc-length join. Per-(doc, term) scores quantize to
    integer micro-units BEFORE the per-doc sum (the llm_wave7 recipe:
    double addition is order-dependent, integer addition is not), so
    the driver's exact hash survives any partitioning. 100 TB: the
    posting-list join scales with matched postings, not corpus size;
    df/query tables are vocabulary-bounded broadcasts."""
    from pyspark.sql import Window

    d = tables(spark, sf_dir)["documents"]
    words = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    ).filter(F.length("w") > 0)
    tf = words.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = words.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dlen")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dlen").cast("long").alias("total_len"),
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qt = (
        dfreq.orderBy(F.desc("df"), "w")
        .limit(30)
        .withColumn(
            "r", F.row_number().over(Window.orderBy(F.desc("df"), "w"))
        )
        .filter(F.col("r").isin(10, 20, 30))
        .select("w", "df")
    )
    cand = (
        tf.join(F.broadcast(qt), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    avgl = F.col("total_len").cast("double") / F.col("n_docs")
    norm = F.lit(0.25) + F.lit(0.75) * (
        F.col("dlen").cast("double") / avgl
    )
    s = idf * (
        (F.col("tf") * F.lit(2.2)) / (F.col("tf") + F.lit(1.2) * norm)
    )
    s_micro = F.floor(s * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        cand.select("doc_id", s_micro.alias("s_micro"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("matched_terms"),
            F.sum("s_micro").cast("long").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(10)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "matched_terms",
            "score_micro",
        )
    )
