"""SparkSession factory and testdata registry.

Scale notes (100 TB design point):
- AQE is always on: runtime partition coalescing, skew-join splitting and
  dynamic broadcast decisions are the difference between "works at sf0.1"
  and "works at 100 TB".
- ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a real cluster it should be ~2-3x total executor cores (AQE coalesces
  down, it never splits a too-coarse setting except for skew).
- Session timezone is pinned to UTC so timestamp semantics are stable and
  oracle-comparable regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Tables the driver generates at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "clickhouse-objects-analysis-spark") -> SparkSession:
    """Build (or fetch) the session with scale-minded defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # 16g: local[32] runs all 32 task threads in the driver JVM; at 8g
        # long sessions (the 129-query bench) spent multi-second stretches
        # in GC that landed on whichever query was running — iterative
        # multi-job queries (connected components) suffered 2-3x.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The events table stores TIMESTAMP(NANOS) parquet, which Spark's
        # reader rejects; read as raw int64 nanos and convert in load_tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    # Scale-dependent settings stay parameterized (driver contract):
    # SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" overlays arbitrary session
    # confs without code changes — how a production deployment sets
    # cluster-sized shuffle partitions, codec choices, or memory knobs,
    # and how the r14 config A/Bs were run (OPTIMIZATION_r14.md). Local
    # defaults above are unchanged when the variable is unset, keeping
    # the driver's bench comparable.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in extra.split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata parquet in ``sf_dir`` and register each as a
    temp view, so both the DataFrame API and ``spark.sql`` see them.

    Parquet scans stay lazy; Catalyst pushes filters/column pruning into
    the scan (verify with ``df.explain``: PushedFilters / ReadSchema).
    """
    # The caller's session may not come from get_spark (the driver builds
    # its own); events.parquet is TIMESTAMP(NANOS), which Spark's reader
    # rejects without this runtime conf.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp_micros() below carries session-TZ semantics; oracle
        # comparisons assume UTC.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — the get_spark path already set it
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = normalize_nanos(spark.read.parquet(path))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def widen_scan(df: DataFrame) -> DataFrame:
    """Restore scan parallelism for a single-row-group test file, for
    queries whose MAP phase dominates.

    The driver's testdata parquet is written as ONE row group per table,
    and a row group is parquet's minimal read unit — so a map phase over
    these tables runs in a single task no matter how many cores the
    session has (measured: 3.2 s of single-threaded shingling inside a
    6.6 s query at sf0.1 on local[32]). At 100 TB the same tables arrive
    as thousands of files/row groups and the scan parallelizes natively;
    a round-robin repartition emulates that layout locally.

    Deliberately opt-in per query, NOT applied in load_tables: the extra
    exchange costs ~0.5-0.9 s against this testdata, which only pays for
    itself where per-row expression work exceeds that (shingling /
    per-shingle hashing). A blanket version regressed the sf0.1 bench
    136 s -> 161 s across scan-light queries; the four gram-pipeline
    adopters below each won 35-85%. Round-robin (not hash) partitioning:
    no key skew, and plan-shape tests that pin "no hash exchange before
    X" keep meaning what they say.

    No-op when the scan already splits enough (multi-file synthesized
    sf1/sf10, or any real multi-row-group layout): there the repartition
    would shuffle the full text column for nothing — measured +0.5 s/GB
    of pure linear overhead on the sf1→sf10 gram queries before this
    guard."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def normalize_nanos(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to a session-TZ TIMESTAMP regardless of
    how the parquet stored it:

    - TIMESTAMP(NANOS) read via nanosAsLong → int64 nanos → truncate to µs
      (integer ``div`` keeps full int64 precision; a double division would
      round above 2^53).
    - naive ``timestamp[us]`` (no TZ, the current testdata shape) → Spark
      reads TIMESTAMP_NTZ, which functions like ``unix_micros`` reject —
      cast to TIMESTAMP; with the session pinned UTC the instant is
      unchanged and matches DuckDB's naive reading."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if field.name == "ts":
            if isinstance(field.dataType, LongType):
                df = df.withColumn(
                    field.name,
                    F.expr(f"timestamp_micros({field.name} div 1000)"),
                )
            elif isinstance(field.dataType, TimestampNTZType):
                df = df.withColumn(
                    field.name, F.col(field.name).cast("timestamp")
                )
    return df
