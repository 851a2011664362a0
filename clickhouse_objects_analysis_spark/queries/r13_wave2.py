"""Round-13 wave 2: the band-3 promotions (33 names) — block-local
helpers (neighbor / runningConcurrency / runningDifference-SWF /
nowInBlock, where the Arrow batch IS the CH block), server/macro/
setting/catalog introspection, the user-files sandbox ``file()``,
query normalization, the ngram/wordShingle MinHash+SimHash text
fingerprints, ``reinterpret``, UUIDv7, sleep/logTrace helpers, and
the bf16/weighted quantile tails.

Oracle strategy:
- block-local functions ride a DETERMINISTIC block: the 60-row frame
  is repartition(1) + sorted by key before the Arrow kernels, so the
  batch equals the sorted frame and DuckDB window/correlated forms
  reproduce it exactly (neighbor → LEAD, runningDifference-SWF →
  k - LAG with the first row's own value, runningConcurrency → a
  correlated interval count).
- reinterpret's little-endian byte reuse is LIVE in both engines
  (DuckDB rebuilds the integer from ascii() code points).
- fingerprints are self-pinned (NON_BIT_COMPATIBLE documents the
  farm_fingerprint64 gram hash vs CH's CRC-based one).
- quantileTDigestWeighted(w=1) equals DuckDB quantile_cont LIVE;
  quantileBFloat16 is pinned over the sf-independent k%7 multiset.
- environment introspection → boolean contracts; getMacro/getSetting
  are configured by the query itself (set_macros / spark.conf) and
  checked for the exact configured values; file() reads a sandbox
  file the query writes with deterministic content.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.ch import ch_expr, set_macros
from .registry import query, tables

#: pri → (ngramMinHash h1, h2, wordShingleMinHash(2,3) h1, h2,
#: ngramSimHash, wordShingleSimHash(2)) — self-pinned NBC vectors
_PRI_FP: dict[str, tuple[int, ...]] = {
    "1-URGENT": (
        -5004270274167668321, -5004270274167668321,
        171290565443944328, 171290565443944328,
        3405489053379625485, -5759174117798200650,
    ),
    "2-HIGH": (
        -6892050848996148637, -6892050848996148637,
        -4410538515480753006, -4410538515480753006,
        1369739975483228232, 1510206931830867796,
    ),
    "3-MEDIUM": (
        -2693584357747042476, -2693584357747042476,
        8340971239930512406, 8340971239930512406,
        4631398286797090833, -224986514317311442,
    ),
    "4-NOT SPECIFIED": (
        3128072045776157017, 8099001956352552966,
        -8309832664294389328, -8309832664294389328,
        -1110302648769698841, 337671425332023790,
    ),
    "5-LOW": (
        71066967706533913, 71066967706533913,
        5689887683770044468, 5689887683770044468,
        5054913935974336863, -2487857790183472212,
    ),
}

_NQ_TEXT = "SELECT 'x', 42, id FROM t WHERE a IN (1, 2, 3)"
_NQ_NORM = "SELECT ?.., id FROM t WHERE a IN (?..)"
_NQ_HASH = 3013460366548059227


def _fp_case_sql(idx: int) -> str:
    arms = "\n".join(
        f"WHEN '{p}' THEN CAST({v[idx]} AS BIGINT)"
        for p, v in _PRI_FP.items()
    )
    return f"CASE pri\n{arms}\nEND"


@query(
    "ch_r13_function_surface_3",
    oracle=f"""
    WITH src AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri
        FROM orders WHERE o_orderkey < 60
    ),
    agg AS (
        SELECT quantile_cont(CAST(k AS DOUBLE), 0.5) AS qtw,
               CAST(3.0 AS DOUBLE) AS qbf
        FROM src
    )
    SELECT CAST(k AS BIGINT) AS k,
           TRUE AS u7_ok,
           TRUE AS nib_ok,
           TRUE AS rc_ok,
           CAST(1 AS INT) AS shard_num,
           CAST(1 AS INT) AS shard_cnt,
           TRUE AS os_ok,
           'r13-replica' AS macro_v,
           'band3' AS setting_v,
           TRUE AS has_col,
           FALSE AS has_col_neg,
           CAST(1 AS TINYINT) AS ic_lit,
           CAST(0 AS TINYINT) AS ic_col,
           CAST(0 AS BIGINT) AS dv_int,
           '' AS dv_str,
           CAST(NULL AS DOUBLE) AS dv_nullable,
           CAST(4 AS BIGINT) AS vw_null,
           CAST(LENGTH(pri) AS BIGINT) AS vw_pri,
           CAST(1 AS TINYINT) AS ih,
           CAST(k AS VARCHAR) || ',' || CAST(k AS VARCHAR) AS rep,
           COALESCE(LEAD(CAST(k AS DOUBLE)) OVER (ORDER BY k), -1.0)
               AS nb_next,
           COALESCE(CAST(k AS DOUBLE)
                    - LAG(CAST(k AS DOUBLE)) OVER (ORDER BY k),
                    CAST(k AS DOUBLE)) AS rd_swf,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM src s2
             WHERE s2.k <= src.k AND s2.k + 3 > src.k) AS rconc,
           CAST(0 AS BIGINT) AS slept,
           CAST(0 AS BIGINT) AS traced,
           'band3 file content' AS file_v,
           TRUE AS fs_ok,
           '{_NQ_NORM}' AS nq,
           CAST({_NQ_HASH} AS BIGINT) AS nqh,
           {_fp_case_sql(0)} AS nmh1,
           {_fp_case_sql(1)} AS nmh2,
           {_fp_case_sql(2)} AS wmh1,
           {_fp_case_sql(3)} AS wmh2,
           {_fp_case_sql(4)} AS nsh,
           {_fp_case_sql(5)} AS wsh,
           CAST(1.5 AS DOUBLE) AS ri_f32,
           CAST(ascii(substr(pri, 1, 1))
                + 256 * ascii(substr(pri, 2, 1))
                + 65536 * ascii(substr(pri, 3, 1))
                + 16777216 * ascii(substr(pri, 4, 1)) AS BIGINT)
               AS ri_u32,
           agg.qtw AS qtw,
           agg.qbf AS qbf
    FROM src, agg ORDER BY k
    """,
)
def ch_r13_function_surface_3_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r13 band-3 promotions end-to-end (module docstring has the
    per-family oracle strategy).

    Scale shape: one pushed-down filtered scan; the deliberate
    repartition(1)+sort exists ONLY to make the block-local functions'
    oracle deterministic (CH documents the same functions as
    block-order-dependent); everything else is per-row scalar or a
    1-row broadcast aggregate."""
    set_macros({"replica": "r13-replica"})
    spark.conf.set("spark.clickhouse_objects.band3", "band3")
    files_dir = os.environ.get(
        "SPARK_GRAFT_USER_FILES",
        os.path.join(os.getcwd(), ".scratch", "user_files"),
    )
    os.makedirs(files_dir, exist_ok=True)
    with open(os.path.join(files_dir, "r13_band3.txt"), "w") as fh:
        fh.write("band3 file content")
    o = (
        tables(spark, sf_dir)["orders"]
        .filter(F.col("o_orderkey") < 60)
        .select("o_orderkey", "o_orderpriority")
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    k = F.col("o_orderkey").cast("long")
    kd = F.col("o_orderkey").cast("double")
    pri = F.col("o_orderpriority")
    agg_q = o.agg(
        ch_expr("quantileTDigestWeighted", kd, F.lit(1), 0.5).alias("qtw")
    )
    agg_b = o.agg(
        ch_expr("quantileBFloat16", (k % 7).cast("double"), 0.5).alias(
            "qbf"
        )
    )
    u7 = ch_expr("generateUUIDv7")
    u7_re = "^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    nmh = ch_expr("ngramMinHash", pri)
    wmh = ch_expr("wordShingleMinHash", pri, 2, 3)
    return (
        o.crossJoin(F.broadcast(agg_q))
        .crossJoin(F.broadcast(agg_b))
        .select(
            k.alias("k"),
            u7.rlike(u7_re).alias("u7_ok"),
            (
                F.abs(
                    F.unix_seconds(ch_expr("nowInBlock"))
                    - F.unix_seconds(F.current_timestamp())
                )
                < 3600
            ).alias("nib_ok"),
            ch_expr("randConstant")
            .between(0, (1 << 32) - 1)
            .alias("rc_ok"),
            ch_expr("shardNum").alias("shard_num"),
            ch_expr("shardCount").alias("shard_cnt"),
            ch_expr("getOSKernelVersion")
            .startswith("Linux")
            .alias("os_ok"),
            ch_expr("getMacro", "replica").alias("macro_v"),
            ch_expr(
                "getSetting", "spark.clickhouse_objects.band3"
            ).alias("setting_v"),
            ch_expr("hasColumnInTable", "", "orders", "o_orderkey").alias(
                "has_col"
            ),
            ch_expr(
                "hasColumnInTable", "", "orders", "no_such_col"
            ).alias("has_col_neg"),
            ch_expr("isConstant", F.lit(5) * 2).alias("ic_lit"),
            ch_expr("isConstant", k).alias("ic_col"),
            ch_expr("defaultValueOfTypeName", "Int64").alias("dv_int"),
            ch_expr("defaultValueOfTypeName", "String").alias("dv_str"),
            ch_expr("defaultValueOfTypeName", "Nullable(Float64)").alias(
                "dv_nullable"
            ),
            ch_expr("visibleWidth", F.lit(None).cast("int")).alias(
                "vw_null"
            ),
            ch_expr("visibleWidth", pri).alias("vw_pri"),
            ch_expr("indexHint", k, pri).alias("ih"),
            F.array_join(
                F.transform(
                    ch_expr("replicate", k, F.array(F.lit(1), F.lit(2))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("rep"),
            ch_expr("neighbor", k, 1, -1.0).alias("nb_next"),
            ch_expr(
                "runningDifferenceStartingWithFirstValue", k
            ).alias("rd_swf"),
            ch_expr("runningConcurrency", kd, kd + 3).alias("rconc"),
            ch_expr("sleep", 0).alias("slept"),
            ch_expr("logTrace", "r13 band3 surface").alias("traced"),
            ch_expr("file", "r13_band3.txt").alias("file_v"),
            (
                (ch_expr("filesystemAvailable") >= 0)
                & (
                    ch_expr("filesystemAvailable")
                    <= ch_expr("filesystemCapacity")
                )
                & (
                    ch_expr("filesystemUnreserved")
                    <= ch_expr("filesystemCapacity")
                )
            ).alias("fs_ok"),
            ch_expr("normalizeQuery", F.lit(_NQ_TEXT)).alias("nq"),
            ch_expr("normalizedQueryHash", F.lit(_NQ_TEXT)).alias("nqh"),
            nmh.getField("h1").alias("nmh1"),
            nmh.getField("h2").alias("nmh2"),
            wmh.getField("h1").alias("wmh1"),
            wmh.getField("h2").alias("wmh2"),
            ch_expr("ngramSimHash", pri).alias("nsh"),
            ch_expr("wordShingleSimHash", pri, 2).alias("wsh"),
            ch_expr("reinterpret", F.lit(1069547520), "Float32").alias(
                "ri_f32"
            ),
            ch_expr("reinterpret", pri, "UInt32").alias("ri_u32"),
            F.col("qtw"),
            F.col("qbf"),
        )
        .orderBy("k")
    )


@query(
    "ch_r13_function_surface_4",
    oracle="""
    WITH src AS (
        SELECT o_orderkey AS k, o_orderpriority AS pri
        FROM orders WHERE o_orderkey < 60
    ),
    agg AS (SELECT CAST(NULL AS DOUBLE) AS athrow FROM (SELECT 1))
    SELECT CAST(k AS BIGINT) AS k,
           CAST(2 * k + 1 AS VARCHAR) || ','
               || CAST(3 * k + 6 AS VARCHAR) AS arr_ranges,
           'SELECT 1 , 2 FROM t' AS fq_line,
           'SELECT 1 , 2' || chr(10) || 'FROM t' || chr(10)
               || 'WHERE x = ?' AS fq_multi,
           'struct Message' || chr(10) || '{' || chr(10)
               || '    id @0 : UInt64;' || chr(10)
               || '    name @1 : Text;' || chr(10) || '}' AS capnp,
           'c1 String, c2 Int16, c3 Int8' AS grs,
           CASE k % 3 WHEN 0 THEN 'Python' WHEN 1 THEN 'Go'
                      ELSE 'SQL' END AS dpl,
           CAST(2.5 AS FLOAT) AS dt_pos,
           CAST(-3.0 AS FLOAT) AS dt_neg,
           CAST(0.0 AS FLOAT) AS dt_zero,
           'en=0.75,es=0.25' AS dlm,
           CAST(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END
                AS TINYINT) AS mfma_exact,
           CAST(CASE WHEN pri IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END
                AS TINYINT) AS mfma_fuzzy,
           agg.athrow AS athrow,
           TRUE AS bid_ok
    FROM src, agg ORDER BY k
    """,
)
def ch_r13_function_surface_4_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The r13 band-4 promotions: arrayReduceInRanges (live slice-sum
    oracle), formatQuery/-SingleLine (token re-render — NBC vs CH's
    AST printer, content pinned), structureToCapnProtoSchema (IDL
    text), generateRandomStructure (seeded determinism for THIS
    generator), detectProgrammingLanguage/Tonality/LanguageMixed
    (keyword/valence/stopword heuristics, NBC), multiFuzzyMatchAny
    (exact semi-global edit-distance DP), aggThrow(p=0), buildId."""
    o = tables(spark, sf_dir)["orders"].filter(F.col("o_orderkey") < 60)
    k = F.col("o_orderkey").cast("long")
    pri = F.col("o_orderpriority")
    kd = k.cast("double")
    ranges = F.array(
        F.struct(F.lit(1).alias("start"), F.lit(2).alias("length")),
        F.struct(F.lit(2).alias("start"), F.lit(3).alias("length")),
    )
    arr = F.array(kd, kd + 1, kd + 2, kd + 3)
    code = F.element_at(
        F.array(
            F.lit("def foo():\n    import os"),
            F.lit("package main\nfunc main() { ch := make(chan int) }"),
            F.lit("SELECT a FROM t WHERE b GROUP BY a"),
        ),
        (k % 3 + 1).cast("int"),
    )
    dlm = ch_expr(
        "detectLanguageMixed", F.lit("the dog and the cat el perro")
    )
    dlm_txt = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(F.map_keys(dlm)),
            lambda key: F.concat(
                key, F.lit("="), F.element_at(dlm, key).cast("string")
            ),
        ),
    )
    agg = o.agg(ch_expr("aggThrow", F.lit(1.0), 0.0).alias("athrow"))
    return (
        o.crossJoin(F.broadcast(agg))
        .select(
            k.alias("k"),
            F.array_join(
                F.transform(
                    ch_expr("arrayReduceInRanges", "sum", ranges, arr),
                    lambda x: x.cast("long").cast("string"),
                ),
                ",",
            ).alias("arr_ranges"),
            ch_expr(
                "formatQuerySingleLine",
                F.lit("SELECT  1 ,\n   2 -- trailing comment\nFROM t"),
            ).alias("fq_line"),
            ch_expr(
                "formatQuery", F.lit("SELECT 1, 2 FROM t WHERE x = ?")
            ).alias("fq_multi"),
            ch_expr(
                "structureToCapnProtoSchema", "id UInt64, name String"
            ).alias("capnp"),
            ch_expr("generateRandomStructure", 3, 42).alias("grs"),
            ch_expr("detectProgrammingLanguage", code).alias("dpl"),
            ch_expr(
                "detectTonality",
                F.lit("the movie was great and wonderful"),
            ).alias("dt_pos"),
            ch_expr(
                "detectTonality", F.lit("awful terrible hate")
            ).alias("dt_neg"),
            ch_expr(
                "detectTonality", F.lit("the chair is on the floor")
            ).alias("dt_zero"),
            dlm_txt.alias("dlm"),
            ch_expr("multiFuzzyMatchAny", pri, 0, ["1-URGENT"]).alias(
                "mfma_exact"
            ),
            # 'URGENT' sits inside 1-URGENT exactly; '2-HIG.' needs one
            # edit against 2-HIGH's substring
            ch_expr(
                "multiFuzzyMatchAny", pri, 1, ["URGENT", "2-HIGX"]
            ).alias("mfma_fuzzy"),
            F.col("athrow"),
            (F.length(ch_expr("buildId")) > 0).alias("bid_ok"),
        )
        .orderBy("k")
    )


@query(
    "dict_hierarchy_walk",
    oracle="""
    WITH RECURSIVE nodes AS (
        SELECT n_nationkey AS id, 25 + n_regionkey AS parent,
               n_name AS name
        FROM nation
        UNION ALL
        SELECT 25 + r_regionkey AS id, NULL AS parent, r_name AS name
        FROM region
    ),
    walk(start_id, id, parent, depth) AS (
        SELECT id, id, parent, 0 FROM nodes
        UNION ALL
        SELECT w.start_id, n.id, n.parent, w.depth + 1
        FROM walk w JOIN nodes n ON n.id = w.parent
    ),
    chains AS (
        SELECT start_id,
               list(id ORDER BY depth) AS chain
        FROM walk GROUP BY start_id
    )
    SELECT CAST(n.n_nationkey AS BIGINT) AS nation_id,
           array_to_string((SELECT chain FROM chains
                 WHERE start_id = n.n_nationkey), ',') AS hierarchy,
           TRUE AS is_in_region,
           FALSE AS is_in_wrong,
           n.n_name AS name_hit,
           CAST(NULL AS VARCHAR) AS name_miss
    FROM nation n ORDER BY nation_id
    """,
)
def dict_hierarchy_walk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dictGetHierarchy`` / ``dictIsIn`` / ``dictGetOrNull`` — the
    hierarchical-dictionary family (reference grammar: dictionary DDL
    ClickHouseParser.py:1361, dictGet* as plain function idents).
    The dictionary is a parent-keyed dim (nations → synthetic region
    nodes at id 25+regionkey): dictGetHierarchy(key) is the iterative
    parent walk (each level ONE broadcast hash join against the tiny
    dict — bounded by hierarchy depth, never row count, the 100 TB
    shape for dimension hierarchies), dictIsIn(child, ancestor) is
    membership in that chain, dictGetOrNull a broadcast left join
    (miss → NULL)."""
    t = tables(spark, sf_dir)
    n, r = t["nation"], t["region"]
    nodes = (
        n.select(
            F.col("n_nationkey").cast("long").alias("id"),
            (F.col("n_regionkey") + 25).cast("long").alias("parent"),
            F.col("n_name").alias("name"),
        )
        .unionByName(
            r.select(
                (F.col("r_regionkey") + 25).cast("long").alias("id"),
                F.lit(None).cast("long").alias("parent"),
                F.col("r_name").alias("name"),
            )
        )
    )
    # dictGetHierarchy: iterative broadcast parent walk, chain carried
    # as an array column; terminates when every frontier parent is NULL
    walk = nodes.select(
        F.col("id").alias("start_id"),
        F.array(F.col("id")).alias("chain"),
        F.col("parent").alias("frontier"),
    )
    for _ in range(10):  # depth bound; this hierarchy is depth 2
        if walk.filter(F.col("frontier").isNotNull()).isEmpty():
            break
        step = walk.join(
            F.broadcast(
                nodes.select(
                    F.col("id").alias("frontier"),
                    F.col("parent").alias("next_parent"),
                )
            ),
            "frontier",
            "left",
        ).select(
            "start_id",
            F.when(
                F.col("frontier").isNotNull(),
                F.concat(F.col("chain"), F.array(F.col("frontier"))),
            )
            .otherwise(F.col("chain"))
            .alias("chain"),
            F.col("next_parent").alias("frontier"),
        )
        walk = step.localCheckpoint(eager=False)
    hier = walk.select("start_id", "chain")
    region_of = n.select(
        F.col("n_nationkey").cast("long").alias("start_id"),
        (F.col("n_regionkey") + 25).cast("long").alias("region_node"),
    )
    # dictGetOrNull: broadcast left lookup; the +100 probe misses
    probe = n.select(
        F.col("n_nationkey").cast("long").alias("start_id"),
        F.col("n_nationkey").cast("long").alias("hit_key"),
        (F.col("n_nationkey") + 100).cast("long").alias("miss_key"),
    )
    name_dim = nodes.select(F.col("id"), F.col("name"))
    out = (
        hier.join(F.broadcast(region_of), "start_id")
        .join(F.broadcast(probe), "start_id")
        .join(
            F.broadcast(name_dim.withColumnRenamed("id", "hit_key")),
            "hit_key",
            "left",
        )
        .withColumnRenamed("name", "name_hit")
        .join(
            F.broadcast(
                name_dim.withColumnRenamed("id", "miss_key")
                .withColumnRenamed("name", "name_miss")
            ),
            "miss_key",
            "left",
        )
    )
    return out.select(
        F.col("start_id").alias("nation_id"),
        F.array_join(
            F.transform(F.col("chain"), lambda x: x.cast("string")), ","
        ).alias("hierarchy"),
        F.array_contains(F.col("chain"), F.col("region_node")).alias(
            "is_in_region"
        ),
        F.array_contains(F.col("chain"), F.col("region_node") + 999).alias(
            "is_in_wrong"
        ),
        F.col("name_hit"),
        F.col("name_miss"),
    ).orderBy("nation_id")
