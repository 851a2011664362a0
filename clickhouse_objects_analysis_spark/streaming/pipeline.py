"""Streaming pipelines over the `events` table, replayed through the
parquet file source (SURVEY §7 M4).

Execution model: each helper starts a one-shot (`availableNow`) streaming
query — the batch-replay of the stream — and returns the materialized
result. In production the same code runs continuously; availableNow is
the deterministic-test trigger. State (window aggregations, session
merges) lives in the streaming state store, sized by watermark retention,
exactly how a 100 TB continuous MV would run.

Sinks: memory sink for windowed aggregates (small, driver-collectable by
definition: one row per window×key), parquet file sink for the MV-style
`TO dest` path (append-only insert-trigger semantics).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..session import normalize_nanos

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")

#: Per-batch state-store telemetry from the most recent replay of each
#: tagged streaming query (r6 verdict directive #3): tag -> [{batch,
#: operator, rows, memory_bytes}, ...]. tools/bench_scaling.py reads
#: this to record state growth at sf1/sf10 and assert the watermark
#: actually bounds it; entries are overwritten per run, never appended
#: across runs.
STATE_METRICS: dict[str, list[dict]] = {}


def record_state_metrics(q, tag: str) -> None:
    """Capture ``recentProgress.stateOperators`` (numRowsTotal,
    memoryUsedBytes) for a finished streaming query. Defensive across
    progress representations (dict vs object) and stateless queries
    (empty stateOperators)."""
    import json as _json

    def _get(o, k):
        if isinstance(o, dict):
            return o.get(k)
        return getattr(o, k, None)

    snaps: list[dict] = []
    try:
        for p in q.recentProgress:
            if isinstance(p, str):
                p = _json.loads(p)
            for op in _get(p, "stateOperators") or []:
                snaps.append(
                    {
                        "batch": _get(p, "batchId"),
                        "operator": _get(op, "operatorName"),
                        "rows": _get(op, "numRowsTotal"),
                        "memory_bytes": _get(op, "memoryUsedBytes"),
                    }
                )
    except Exception:
        pass
    STATE_METRICS[tag] = snaps


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet replayed as a stream (schema pinned from the batch
    read — file streams require an explicit schema)."""
    # Same guard as session.load_tables: the caller's session may be a
    # bare one (the driver builds its own) — events.parquet is
    # TIMESTAMP(NANOS) and window boundaries assume UTC. Don't rely on a
    # prior tables() call having set these.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down — get_spark already set them
    path = os.path.join(sf_dir, "events.parquet")
    # The file stream source wants a directory of data files; expose the
    # table through a scratch directory of symlinks (testdata is
    # read-only). Handles both physical shapes: a single parquet FILE
    # (the driver-generated testdata) and a parquet DIRECTORY of part
    # files (Spark-written tables, e.g. the synthesized sf1).
    import glob as _glob

    if os.path.isdir(path):
        parts = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    else:
        parts = [path]
    # Key the scratch dir on the PART LIST, not just sf_dir: a source
    # regenerated with a different physical layout (single file -> part
    # dir, renamed/fewer parts) must land in a fresh dir, or stale links
    # double-count rows / dangle. Same-content reuse stays warm.
    key = hashlib.md5("|".join([sf_dir, *parts]).encode()).hexdigest()[:12]
    stream_dir = os.path.join(SCRATCH, f"events_src_{key}")
    expected = {f"events_{i:04d}.parquet" for i in range(len(parts))}
    if os.path.isdir(stream_dir):
        have = set(os.listdir(stream_dir))
        stale = have != expected or any(
            not os.path.exists(os.path.join(stream_dir, n)) for n in have
        )
        if stale:
            shutil.rmtree(stream_dir)
    os.makedirs(stream_dir, exist_ok=True)
    for i, part in enumerate(parts):
        link = os.path.join(stream_dir, f"events_{i:04d}.parquet")
        if not os.path.islink(link):
            # abspath: a relative source would dangle relative to the
            # link's own directory
            os.symlink(os.path.abspath(part), link)
    schema = _source_schema(spark, path)
    return normalize_nanos(spark.readStream.schema(schema).parquet(stream_dir))


#: (path, mtime_ns, size) -> StructType. Every streaming query pays one
#: driver job just to re-read the footer schema of an immutable source
#: (the stream-stream joins pay it twice); keyed on stat() so a
#: regenerated file misses.
_SCHEMA_CACHE: dict = {}


def _source_schema(spark: SparkSession, path: str):
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return spark.read.parquet(path).schema
    if key not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[key] = spark.read.parquet(path).schema
    return _SCHEMA_CACHE[key]


#: (path, mtime_ns, size) -> max(ts). The left-outer sentinel needs the
#: source's max event time to aim its far-future row; the source is
#: immutable, so one scan per (file, stat) is enough — stat-keyed like
#: _SCHEMA_CACHE so regenerated testdata misses.
_MAXTS_CACHE: dict = {}


def _events_max_ts(spark: SparkSession, sf_dir: str):
    path = os.path.join(sf_dir, "events.parquet")

    def scan():
        return (
            normalize_nanos(
                spark.read.option("mergeSchema", "false").parquet(path)
            )
            .agg(F.max("ts").alias("m"))
            .head()[0]
        )

    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return scan()
    if key not in _MAXTS_CACHE:
        _MAXTS_CACHE[key] = scan()
    return _MAXTS_CACHE[key]


#: Floor state-store partition count for the replay pipelines. The number
#: of streaming state partitions is pinned at first checkpoint creation
#: from spark.sql.shuffle.partitions — size it to throughput, not the
#: batch default. Prefer ``state_partitions_for(sf_dir)``, which derives
#: the count from input volume; this constant is its floor and the
#: fallback when no source path is known. Floor 4 (was 8, r9 verdict #7):
#: every state partition costs 4 store commits per batch in the
#: stream-stream joins, and at the 2 MB sf0.1 replay the commit overhead
#: dominated — measured floor sweep: left-outer 3.3 s @8 → 2.5 s @4,
#: interval join 2.6 s @8 → 2.0 s @4; bigger sources outgrow the floor
#: via the 2 MiB/partition curve, so only toy inputs are affected.
STATE_PARTITIONS = "4"

#: Measured curve (SCALE.md round-5 STATE_PARTITIONS sweep at sf1, ~20 MB
#: of parquet events): 8 partitions → 3.9 s ≈ 16 → 3.9 s, 32 → 8.6 s —
#: i.e. ~2 MiB of parquet input per state partition is the sweet spot;
#: more partitions just multiply the per-batch state-store commit cost,
#: fewer under-parallelize the stateful exchange.
_STATE_PARTITION_INPUT_BYTES = 2 << 20


def state_partitions_for(sf_dir: str) -> str:
    """Derive the streaming shuffle/state partition count from the byte
    size of the events source under ``sf_dir`` using the measured curve
    above: one partition per ~2 MiB of parquet input, rounded up to a
    power of two (state-store partition counts are sticky per checkpoint;
    pow2 keeps re-derivations stable under small size drift), clamped to
    [STATE_PARTITIONS, 512]. Unknown/missing sources fall back to the
    floor."""
    path = os.path.join(sf_dir, "events.parquet")
    try:
        if os.path.isdir(path):
            n_bytes = sum(
                e.stat().st_size
                for e in os.scandir(path)
                if e.name.endswith(".parquet")
            )
        else:
            n_bytes = os.path.getsize(path)
    except OSError:
        return STATE_PARTITIONS
    want = max(1, -(-n_bytes // _STATE_PARTITION_INPUT_BYTES))
    parts = 1 << (want - 1).bit_length()  # next power of two
    return str(min(max(parts, int(STATE_PARTITIONS)), 512))

#: Checkpoint dirs created by THIS process — exempt from the reaper so a
#: long-running session can never delete its own live state.
_SESSION_CKPTS: set[str] = set()


def ckpt_dir(tag: str) -> str:
    """Fresh checkpoint dir for one availableNow replay, preferring a
    tmpfs base. These checkpoints are transient BY CONSTRUCTION (every
    run creates a new one and never resumes it), so their offset/state
    fsyncs are pure overhead — putting them on /dev/shm stops cold-disk
    latency from being charged to query cost, the same way a production
    stream puts state on local NVMe while the DURABLE sink (the parquet
    dest dirs, which results are read back from) stays in SCRATCH."""
    base = "/dev/shm"
    if not (os.path.isdir(base) and os.access(base, os.W_OK)):
        base = SCRATCH
    root = os.path.join(base, "spark_graft_ckpt")
    # best-effort reap of finished runs' checkpoints so tmpfs (RAM)
    # doesn't accumulate them across bench/test sessions
    import time as _time

    try:
        for old in os.listdir(root):
            p = os.path.join(root, old)
            if p in _SESSION_CKPTS:
                continue  # never reap this process's own checkpoints
            # age from the NEWEST mtime inside the dir, not the top-level
            # one: a live stream refreshes offsets/ and commits/ every
            # batch but not the checkpoint root, so top-level age would
            # reap a >1h-running concurrent session's checkpoint mid-query
            try:
                newest = max(
                    [os.path.getmtime(p)]
                    + [e.stat().st_mtime for e in os.scandir(p)]
                )
            except OSError:
                continue
            if _time.time() - newest > 3600:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass
    d = os.path.join(root, f"{tag}_{uuid.uuid4().hex[:8]}")
    os.makedirs(d, exist_ok=True)
    _SESSION_CKPTS.add(d)
    return d


def drop_stale_memory_tables(spark: SparkSession, prefix: str) -> None:
    """Drop previous runs' memory-sink temp views sharing ``prefix``.
    Every replay registers a fresh ``<prefix>_<uuid>`` view whose rows
    live in DRIVER heap; without this, repeated runs in one session (a
    benchmark loop, a long notebook) ratchet heap until a large-SF run
    tips the JVM over — the r6 sf10 bench died broadcasting into a heap
    already holding several 10x-sized session-window result tables."""
    try:
        # SHOW VIEWS instead of catalog.listTables(): listTables builds
        # a full metadata object per table (~0.2 s against a warm
        # session catalog) and this cleanup runs inside EVERY streaming
        # replay query — it was a measurable slice of the r9/r10
        # streaming fixed-cost band.
        for row in spark.sql("SHOW VIEWS").collect():
            nm = row["viewName"]
            if row["isTemporary"] and nm.startswith(prefix + "_"):
                spark.catalog.dropTempView(nm)
    except Exception:
        pass  # catalog listing is best-effort cleanup


def _run_to_memory(
    agg: DataFrame, name: str, n_parts: str = STATE_PARTITIONS
) -> None:
    from ..functions.settings import query_settings

    drop_stale_memory_tables(agg.sparkSession, name.rsplit("_", 1)[0])

    with query_settings(
        agg.sparkSession, {"spark.sql.shuffle.partitions": n_parts}
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            # explicit transient checkpoint: the implicit one lands in
            # java.io.tmpdir on spinning /tmp
            .option("checkpointLocation", ckpt_dir(name))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_state_metrics(q, name.rsplit("_", 1)[0])


def _source_sig(sf_dir: str, table: str) -> str:
    """Content signature of a parquet source: part paths + size +
    mtime_ns, so a regenerated file under the same path invalidates
    dependent caches (r12 advice — id(spark) keying served stale
    fan-out results after an in-place rewrite)."""
    import glob as _glob

    path = os.path.join(sf_dir, f"{table}.parquet")
    parts = (
        sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    items = []
    for p in parts:
        try:
            st = os.stat(p)
            items.append(f"{p}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            items.append(f"{p}:missing")
    return hashlib.md5("|".join(items).encode()).hexdigest()[:12]


#: (source signatures) -> destination dirs of a completed fan-out run.
#: Keyed on CONTENT (events + customer part lists with size/mtime), not
#: session identity — the destinations are plain parquet dirs any
#: session can read, and id(spark) can be reused after GC.
_MV_FANOUT_CACHE: dict[tuple[str, str, str], dict[str, str]] = {}


def shared_mv_fanout(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """ONE availableNow replay of the events stream feeding FOUR
    destination tables in a single pass — the reference engine's
    N-materialized-views-on-one-table shape (every INSERT into the
    source triggers each MV's transform exactly once; createStmt
    destinationClause, ClickHouseParser.py:5572). r11 verdict #6: the
    replay band's floor was one full stream START/microbatch/STOP
    lifecycle PER consumer (~1.1 s each at sf0.1); the fan-out pays it
    once per (session, sf_dir) and every MV read after that is a small
    destination-table scan.

    Aggregating consumers write PARTIAL per-batch aggregates and are
    re-aggregated at read time — the SummingMergeTree/AggregatingMergeTree
    contract (the MV stores partial states; SELECT ... GROUP BY merges),
    so the fan-out stays correct under ANY microbatch split, not just
    the single-batch bounded replay. Each batch lands in its own
    ``batch=<id>`` subdir with overwrite mode, making retried batches
    idempotent (exactly-once under foreachBatch's at-least-once
    contract). The static dimension is re-read per batch — the
    slowly-changing-dim semantics of the stream-static join."""
    key = (
        sf_dir,
        _source_sig(sf_dir, "events"),
        _source_sig(sf_dir, "customer"),
    )
    hit = _MV_FANOUT_CACHE.get(key)
    if hit is not None and all(os.path.isdir(p) for p in hit.values()):
        return hit
    _reap_run_dirs("mvfan_")
    run_dir = os.path.join(SCRATCH, f"mvfan_{uuid.uuid4().hex[:8]}")
    _SESSION_RUN_DIRS.add(run_dir)
    shutil.rmtree(run_dir, ignore_errors=True)
    dests = {
        k: os.path.join(run_dir, k)
        for k in ("tumbling", "sliding", "enrich", "mv_rows")
    }
    dim_path = os.path.join(sf_dir, "customer.parquet")

    def fan_out(bdf: DataFrame, bid: int) -> None:
        bdf = bdf.persist()
        try:
            sess = bdf.sparkSession
            dim = sess.read.parquet(dim_path).select(
                "c_custkey", "c_mktsegment"
            )
            (
                bdf.groupBy(
                    F.window("ts", "5 minutes").alias("win"), "event_type"
                )
                .agg(
                    F.count(F.lit(1)).alias("pn"),
                    F.sum("value").alias("psv"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(dests["tumbling"], f"batch={bid}"))
            )
            (
                bdf.groupBy(
                    F.window("ts", "10 minutes", "5 minutes").alias("win")
                )
                .agg(F.count(F.lit(1)).alias("pn"))
                .write.mode("overwrite")
                .parquet(os.path.join(dests["sliding"], f"batch={bid}"))
            )
            (
                bdf.filter(F.col("event_type") == "purchase")
                .join(
                    F.broadcast(dim),
                    F.col("user_id") == F.col("c_custkey"),
                )
                .groupBy(F.window("ts", "1 day").alias("win"), "c_mktsegment")
                .agg(
                    F.count(F.lit(1)).alias("pn"),
                    F.sum(F.col("value").cast("decimal(38,6)")).alias(
                        "psv"
                    ),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(dests["enrich"], f"batch={bid}"))
            )
            (
                bdf.filter(F.col("event_type") == "purchase")
                .select(
                    "event_id",
                    "user_id",
                    "ts",
                    F.round(F.col("value") * 100, 2).alias("cents"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(dests["mv_rows"], f"batch={bid}"))
            )
        finally:
            bdf.unpersist()

    from ..functions.settings import query_settings

    stream = read_events_stream(spark, sf_dir)
    with query_settings(
        spark, {"spark.sql.shuffle.partitions": state_partitions_for(sf_dir)}
    ):
        q = (
            stream.writeStream.foreachBatch(fan_out)
            .option("checkpointLocation", ckpt_dir("mvfan"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _MV_FANOUT_CACHE[key] = dests
    return dests


def _read_fanout(spark: SparkSession, path: str) -> DataFrame:
    # the batch=<id> layout surfaces as a partition column — drop it
    return spark.read.parquet(path).drop("batch")


def tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling windows per event_type, materialized through
    the shared MV fan-out (partial per-batch aggregates merged at read
    — the SummingMergeTree read contract)."""
    d = shared_mv_fanout(spark, sf_dir)["tumbling"]
    return _read_fanout(spark, d).groupBy("win", "event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("psv"), 2).alias("total_value"),
    )


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes — each event lands in
    two overlapping windows. Shared-fan-out materialization; partial
    counts merged at read."""
    d = shared_mv_fanout(spark, sf_dir)["sliding"]
    return _read_fanout(spark, d).groupBy("win").agg(
        F.sum("pn").alias("n_events")
    )


def session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap
    (F.session_window): a new session starts when the gap is reached
    (diff >= gap); window.end = last_event_ts + gap."""
    name = f"session_{uuid.uuid4().hex[:8]}"
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window("ts", "10 minutes").alias("win"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    _run_to_memory(agg, name, state_partitions_for(sf_dir))
    return spark.table(name)


def stateful_user_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (the Spark
    primitive SURVEY §0 names for operators the built-ins can't express):
    per-user running state across microbatches — event count, max single
    event value, and last-seen timestamp — emitted once per key when the
    replay finishes (GroupStateTimeout unused here; a continuous run would
    emit on update). State lives in the streaming state store, keyed by
    user, surviving between microbatches exactly as a 100 TB continuous
    job's would."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    name = f"stateful_{uuid.uuid4().hex[:8]}"
    drop_stale_memory_tables(spark, "stateful")
    stream = read_events_stream(spark, sf_dir)

    def track(key, pdfs, state: GroupState):
        # peak starts at -inf, not 0.0 — an all-negative value domain must
        # still report its true MAX(value), matching the batch oracle.
        n, peak, last = state.get if state.exists else (0, float("-inf"), None)
        for pdf in pdfs:
            n += len(pdf)
            peak = max(peak, float(pdf["value"].max()))
            batch_last = pdf["ts"].max()
            last = batch_last if last is None else max(last, batch_last)
        state.update((n, peak, last))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "peak_value": [round(peak, 2)],
                "last_ts": [last],
            }
        )

    out = (
        stream.select("user_id", "value", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType="user_id long, n_events long, peak_value double, last_ts timestamp",
            stateStructType="n long, peak double, last timestamp",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    from ..functions.settings import query_settings

    with query_settings(
        spark, {"spark.sql.shuffle.partitions": state_partitions_for(sf_dir)}
    ):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir(name))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_state_metrics(q, "stateful_user_peaks")
    # one-shot replay → last emitted row per user is the final state
    t = spark.table(name)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        t.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def materialized_view_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATERIALIZED VIEW ... TO dest (destinationClause reference
    ClickHouseParser.py:5572): an insert-triggered row transform into a
    destination parquet table, materialized through the shared MV
    fan-out (per-batch idempotent appends = each arriving row
    transformed exactly once); result read back from the destination —
    the full MV round trip."""
    d = shared_mv_fanout(spark, sf_dir)["mv_rows"]
    return _read_fanout(spark, d)


def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the purchase stream enriched against the
    broadcast customer dimension (re-read per micro-batch inside the
    fan-out, so a slowly-changing dim is picked up between batches —
    Spark's native semantics for this join), then a 1-day rollup per
    market segment. This is the MV-over-join shape ClickHouse users
    build with a JOIN inside a materialized view's SELECT; partial
    per-batch aggregates merged at read."""
    d = shared_mv_fanout(spark, sf_dir)["enrich"]
    return _read_fanout(spark, d).groupBy("win", "c_mktsegment").agg(
        F.sum("pn").alias("n_purchases"),
        F.sum("psv").alias("__sv"),
    )


def stream_stream_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join: each click joined to the
    same user's purchases landing within the following hour. Both sides
    carry watermarks and the join condition bounds event time in BOTH
    directions, so Spark can size the join state and evict rows as the
    watermark advances — the unbounded-state hazard of stream-stream
    joins is engineered away. Append mode (the only mode stream-stream
    joins support)."""
    run_dir = os.path.join(SCRATCH, f"ss_{uuid.uuid4().hex[:8]}")
    dest = os.path.join(run_dir, "dest")
    ckpt = ckpt_dir("stream")
    shutil.rmtree(run_dir, ignore_errors=True)

    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    # The join's state-store partition count is pinned from
    # shuffle.partitions at checkpoint creation — size it to stream
    # throughput like every other pipeline here (32 state dirs cost ~2x
    # the replay wall-clock at this volume).
    from ..functions.settings import query_settings

    with query_settings(
        spark, {"spark.sql.shuffle.partitions": state_partitions_for(sf_dir)}
    ):
        q = (
            joined.writeStream.format("parquet")
            .option("path", dest)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_state_metrics(q, "stream_stream_click_purchase")
    return spark.read.parquet(dest)


def stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join: every click,
    matched to same-user purchases in the following hour — or emitted
    with NULLs once the watermark proves no purchase can still arrive.

    Outer results can only flush when the watermark passes the join
    window, and a stream's watermark never passes its own last event —
    so a one-row far-future SENTINEL is unioned into each side purely
    to drive the watermark past all real data (filtered back out of the
    output). That makes the availableNow replay's outer result exactly
    the batch left join — the property the oracle checks. At 100 TB the
    same pattern is how a bounded backfill of an outer-join stream is
    made complete: advance the watermark, then stop."""
    run_dir = os.path.join(SCRATCH, f"sslo_{uuid.uuid4().hex[:8]}")
    dest = os.path.join(run_dir, "dest")
    ckpt = ckpt_dir("sslo")
    shutil.rmtree(run_dir, ignore_errors=True)

    # far-future sentinel rows (one per side), written once per sf_dir
    max_ts = _events_max_ts(spark, sf_dir)
    # key the sentinel dir on max_ts as well as sf_dir: a regenerated
    # source with LATER events must not reuse an older (now too-early)
    # sentinel, or the watermark would never pass the new tail and the
    # outer join would silently under-emit
    sent_key = hashlib.md5(
        f"{sf_dir}|{max_ts.isoformat()}".encode()
    ).hexdigest()[:12]
    sent_dir = os.path.join(SCRATCH, f"sslo_sentinel_{sent_key}")
    if not os.path.isdir(sent_dir):
        import datetime as _dt

        far = max_ts + _dt.timedelta(hours=12)
        spark.createDataFrame(
            [(-1, far, -1, "__sentinel__", 0.0, "{}")],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(sent_dir)

    def side(event_type: str, prefix: str) -> DataFrame:
        ev = read_events_stream(spark, sf_dir)
        sen = spark.readStream.schema(ev.schema).parquet(sent_dir)
        return (
            ev.unionByName(sen)
            .filter(
                (F.col("event_type") == event_type)
                | (F.col("event_type") == "__sentinel__")
            )
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "1 minute")
        )

    clicks = side("click", "c")
    purchases = side("purchase", "p")
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        "c_id",
        "c_user",
        "p_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    from ..functions.settings import query_settings

    with query_settings(
        spark, {"spark.sql.shuffle.partitions": state_partitions_for(sf_dir)}
    ):
        q = (
            joined.writeStream.format("parquet")
            .option("path", dest)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_state_metrics(q, "stream_stream_left_outer")
    return spark.read.parquet(dest).filter(F.col("c_id") >= 0)


def _watch_slices(spark: SparkSession, sf_dir: str, n_slices: int = 4) -> str:
    """Materialize the events table as ``n_slices`` single-file parquet
    slices (slice i = rows with event_id % n_slices == i) with strictly
    increasing mtimes, so the file stream source replays them as
    n_slices deterministic updates — the stand-in for a live table
    receiving successive inserts. Cached per (sf_dir, n_slices)."""
    import glob as _glob

    from ..session import load_tables

    key = hashlib.md5(f"{sf_dir}:{n_slices}".encode()).hexdigest()[:8]
    src_dir = os.path.join(SCRATCH, f"watch_src_{key}")
    ready = os.path.join(src_dir, "_READY")
    if os.path.exists(ready):
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    ev = load_tables(spark, sf_dir)["events"]
    base = 1_600_000_000  # fixed epoch: mtime order == slice order
    for i in range(n_slices):
        tmp = os.path.join(SCRATCH, f"watch_tmp_{key}_{i}")
        (
            ev.filter(F.col("event_id") % n_slices == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"slice-{i:03d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (base + i, base + i))
    open(ready, "w").close()
    return src_dir


def watch_heartbeats(
    spark: SparkSession,
    sf_dir: str,
    limit: int | None = None,
    n_slices: int = 4,
) -> DataFrame:
    """WATCH ... EVENTS / WATCH ... LIMIT n (watchStmt EVENTS/LIMIT
    accessors, reference ClickHouseParser.py:14249-14321): subscribe to a
    live view's UPDATES rather than its contents — one heartbeat row per
    refresh carrying the version counter, with LIMIT n detaching the
    subscription after n updates.

    Spark rendering: the sliced events source replays as one micro-batch
    per slice (maxFilesPerTrigger=1 under availableNow); foreachBatch is
    the subscription callback, recording (version, n_new_rows, n_total)
    per update. With ``limit``, a driver-side monitor stops the streaming
    query once the first ``limit`` heartbeats are recorded — the bounded
    subscription, not a post-hoc head() (recording also guards on the
    limit so a batch racing the stop() never changes the result)."""
    import time as _time

    src_dir = _watch_slices(spark, sf_dir, n_slices)
    schema = _source_schema(spark, src_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    ckpt = ckpt_dir("watch")
    beats: list[tuple[int, int]] = []

    def on_update(bdf: DataFrame, bid: int) -> None:
        if limit is None or len(beats) < limit:
            beats.append((int(bid), bdf.count()))

    q = (
        stream.writeStream.foreachBatch(on_update)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if limit is not None:
        while q.isActive:
            if len(beats) >= limit:
                q.stop()
                break
            _time.sleep(0.05)
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    rows, total = [], 0
    for version, n_new in beats[: limit if limit is not None else len(beats)]:
        total += n_new
        rows.append((version, n_new, total))
    return spark.createDataFrame(
        rows, "version long, n_new_rows long, n_total long"
    )


def upsert_latest_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree as a STREAMING sink: each micro-batch upserts
    into a keyed destination, latest (ts, event_id) version per user
    wins — the write-side twin of the batch SELECT ... FINAL read
    (final_replacing_read). Replays the deterministic 4-slice source
    (one micro-batch per slice); foreachBatch reduces the batch to its
    latest row per key, merges with the current destination, and swaps
    the parquet directory atomically (write-new, remove-old, rename).
    Latest-wins is associative under the total (ts, event_id) order, so
    the final state is independent of batch boundaries — which is what
    the oracle (one argmax over the whole table) checks."""
    import glob as _glob  # noqa: F401  (parallel to _watch_slices import)

    from pyspark.sql import Window
    from pyspark.sql import functions as SF

    src_dir = _watch_slices(spark, sf_dir, 4)
    schema = _source_schema(spark, src_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    run_dir = os.path.join(SCRATCH, f"upsert_{uuid.uuid4().hex[:8]}")
    dest = os.path.join(run_dir, "dest")
    ckpt = ckpt_dir("stream")
    shutil.rmtree(run_dir, ignore_errors=True)
    os.makedirs(run_dir, exist_ok=True)

    w = Window.partitionBy("user_id").orderBy(
        SF.col("ts").desc(), SF.col("event_id").desc()
    )

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__rn", SF.row_number().over(w))
            .filter(SF.col("__rn") == 1)
            .drop("__rn")
        )

    def merge(bdf: DataFrame, bid: int) -> None:
        cols = ["user_id", "event_id", "ts", "value"]
        new = latest(bdf.select(*cols))
        if os.path.exists(dest):
            cur = bdf.sparkSession.read.parquet(dest)
            merged = latest(cur.unionByName(new))
        else:
            merged = new
        tmp = dest + f".tmp{bid}"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(dest, ignore_errors=True)
        os.rename(tmp, dest)

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(dest)


def _time_slices(spark: SparkSession, sf_dir: str, n_slices: int) -> str:
    """Materialize events as ``n_slices`` single-file parquet slices cut
    by EVENT-TIME range (ntile over ts) with increasing mtimes — unlike
    ``_watch_slices`` (hash slices, every slice spans the whole month),
    these advance the event-time clock batch by batch, which is what
    lets the watermark actually EVICT state between micro-batches.
    Cached per (sf_dir, n_slices)."""
    import glob as _glob

    from pyspark.sql import Window as _W

    from ..session import load_tables

    key = hashlib.md5(f"ts:{sf_dir}:{n_slices}".encode()).hexdigest()[:8]
    src_dir = os.path.join(SCRATCH, f"tslice_src_{key}")
    ready = os.path.join(src_dir, "_READY")
    if os.path.exists(ready):
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    ev = load_tables(spark, sf_dir)["events"]
    sliced = ev.withColumn(
        "_slice",
        F.ntile(n_slices).over(_W.orderBy("ts", "event_id")) - 1,
    )
    base = 1_600_000_000
    for i in range(n_slices):
        tmp = os.path.join(SCRATCH, f"tslice_tmp_{key}_{i}")
        (
            sliced.filter(F.col("_slice") == i)
            .drop("_slice")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"slice-{i:03d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (base + i, base + i))
    open(ready, "w").close()
    return src_dir


def dedup_state_probe(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 6,
    watermark: str = "1 day",
) -> dict:
    """Measure whether watermark-bounded dedup state actually PLATEAUS
    (r6 verdict directive #3): replay events in ``n_slices`` event-time
    micro-batches, dedup on the unique event_id (the worst case — every
    row is a new key, so WITHOUT eviction state grows linearly with the
    stream), and read per-batch numRowsTotal from the state operator.

    With a 1-day watermark over ~30 days of events split into ~5-day
    slices, steady-state state ≈ one trailing day + the current slice —
    constant across batches — while cumulative input grows n_slices×.
    Returns {"rows": per-batch state rows, "input_rows": per-batch
    input, "plateau_ok": last-batch state ≤ 2.5× first-batch state,
    "bounded_ok": final state ≤ 60% of total input}."""
    from ..functions.settings import query_settings

    src = _time_slices(spark, sf_dir, n_slices)
    schema = _source_schema(spark, src)
    stream = normalize_nanos(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    dd = (
        stream.select("event_id", "ts")
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"stateprobe_{uuid.uuid4().hex[:8]}"
    drop_stale_memory_tables(spark, "stateprobe")
    with query_settings(
        spark, {"spark.sql.shuffle.partitions": state_partitions_for(sf_dir)}
    ):
        q = (
            dd.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt_dir("stateprobe"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        record_state_metrics(q, "dedup_state_probe")
    snaps = STATE_METRICS.get("dedup_state_probe", [])
    rows = [s["rows"] for s in snaps if s.get("rows") is not None]
    total_in = spark.read.parquet(src).count()
    plateau_ok = bool(rows) and rows[-1] <= 2.5 * max(rows[0], 1)
    bounded_ok = bool(rows) and rows[-1] <= 0.6 * total_in
    return {
        "rows": rows,
        "total_input_rows": total_in,
        "watermark": watermark,
        "n_slices": n_slices,
        "plateau_ok": plateau_ok,
        "bounded_ok": bounded_ok,
    }


#: Run dirs created by THIS process — exempt from the reaper (same
#: contract as _SESSION_CKPTS for checkpoints).
_SESSION_RUN_DIRS: set[str] = set()


def _reap_run_dirs(prefix: str, max_age_s: int = 3600) -> None:
    """Best-effort cleanup of finished runs' scratch dirs (band index +
    shingle store + dup sink are corpus-scale state — without this every
    bench/parity invocation leaks one copy into SCRATCH). Age is taken
    from the NEWEST mtime inside the dir so a concurrent session's live
    run is never reaped mid-query."""
    import time as _time

    try:
        for name in os.listdir(SCRATCH):
            if not name.startswith(prefix):
                continue
            p = os.path.join(SCRATCH, name)
            if p in _SESSION_RUN_DIRS or not os.path.isdir(p):
                continue
            try:
                newest = max(
                    [os.path.getmtime(p)]
                    + [e.stat().st_mtime for e in os.scandir(p)]
                )
            except OSError:
                continue
            if _time.time() - newest > max_age_s:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def _doc_slices(spark: SparkSession, sf_dir: str, n_slices: int) -> str:
    """Materialize documents as ``n_slices`` single-file parquet slices
    cut by doc_id ntile with increasing mtimes — the ingest-order replay
    source for the incremental dedup path (doc_id is the arrival clock,
    so every slice's ids are strictly greater than all earlier slices').
    Cached per (sf_dir, n_slices) like the events slicers above."""
    import glob as _glob

    from pyspark.sql import Window as _W

    from ..session import load_tables

    key = hashlib.md5(f"doc:{sf_dir}:{n_slices}".encode()).hexdigest()[:8]
    src_dir = os.path.join(SCRATCH, f"docslice_src_{key}")
    ready = os.path.join(src_dir, "_READY")
    if os.path.exists(ready):
        return src_dir
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir, exist_ok=True)
    docs = load_tables(spark, sf_dir)["documents"].select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    sliced = docs.withColumn(
        "_slice", F.ntile(n_slices).over(_W.orderBy("doc_id")) - 1
    )
    base = 1_600_000_000
    for i in range(n_slices):
        tmp = os.path.join(SCRATCH, f"docslice_tmp_{key}_{i}")
        (
            sliced.filter(F.col("_slice") == i)
            .drop("_slice")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"slice-{i:03d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (base + i, base + i))
    open(ready, "w").close()
    return src_dir


def incremental_minhash_dedup(
    spark: SparkSession,
    sf_dir: str,
    n_slices: int = 4,
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.8,
    run_dir: str | None = None,
    fail_after_batches: int | None = None,
    files_per_trigger: int = 1,
    spread_shingles: bool = False,
) -> DataFrame:
    """INCREMENTAL near-duplicate dedup — the ingest-time twin of the
    batch minhash_lsh_pairs: documents arrive as a Structured Streaming
    replay (one micro-batch per doc_id slice) and each batch is checked
    against a PERSISTED LSH band index of everything seen so far, never
    against raw earlier text. Per-batch cost is O(batch bands) + an
    equi-join against the index on (band_id, band_key) — at 100 TB the
    index is the only state that grows, it's 16 longs per doc, and the
    join prunes to colliding buckets; the corpus itself is never
    rescanned.

    Every batch: shingle → minhash(32) → 16 band keys; candidates =
    (index ⋈ batch) ∪ (batch ⋈ batch, id_a < id_b); exact-Jaccard verify
    against the persisted shingle store (only candidate ids are fetched —
    the equi-join prunes the store scan); then the batch's bands and
    shingle sets are appended to the index. Because ALL arriving docs are
    indexed (duplicates too), a doc's candidate set is complete in its
    arrival batch, so the final answer is independent of slice
    boundaries — which is exactly what the batch oracle checks. The LSH
    miss bound is the batch path's: (1 − 0.8²)¹⁶ ≈ 1e-7 at s = 0.8, and
    verification kills false positives.

    Returns one row per detected duplicate: (doc_id, rep_id, rep_jacc)
    where rep_id = the LOWEST earlier doc within threshold (first-seen
    representative) and rep_jacc its exact Jaccard.

    ``run_dir`` pins the checkpoint + index + sink locations so a second
    call RESUMES from the offset log instead of starting over — the
    restart path tests/test_streaming_state.py crashes mid-replay (via
    ``fail_after_batches``, which raises before the batch writes
    anything) and then completes; committed batches are not reprocessed.
    The injected crash lands on a batch boundary; a production deployment
    gets atomic batch commits from a transactional sink (Delta/Iceberg),
    which slots into the same foreachBatch."""
    from pyspark.sql import Window as _W

    from ..operators.dedup import (
        _verify_jaccard,
        band_rows,
        minhash_signatures,
        shingle_sets,
    )

    src_dir = _doc_slices(spark, sf_dir, n_slices)
    schema = _source_schema(spark, src_dir)
    # files_per_trigger batches several arrival slices into one
    # micro-batch: the answer is slice-boundary-independent by design
    # (tests/test_streaming_state.py::…_slice_invariant), so this only
    # trades replay fidelity for fewer per-batch fixed costs (3 parquet
    # writes + 2 index reads per batch). The registry query uses 2; the
    # crash-resume test keeps 1 so fail_after_batches lands mid-replay.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    resuming = run_dir is not None
    if run_dir is None:
        _reap_run_dirs("incdedup_")
        run_dir = os.path.join(SCRATCH, f"incdedup_{uuid.uuid4().hex[:8]}")
        _SESSION_RUN_DIRS.add(run_dir)
    idx_bands = os.path.join(run_dir, "band_index")
    idx_sets = os.path.join(run_dir, "shingle_store")
    out_dir = os.path.join(run_dir, "dups")
    if not resuming:
        shutil.rmtree(run_dir, ignore_errors=True)
    os.makedirs(run_dir, exist_ok=True)
    seen_batches = [0]

    def process(bdf: DataFrame, bid: int) -> None:
        if (
            fail_after_batches is not None
            and seen_batches[0] >= fail_after_batches
        ):
            raise RuntimeError("injected crash before batch writes")
        seen_batches[0] += 1
        # persist(), not localCheckpoint(): each intermediate feeds 2-3
        # consumers within the batch, and a cache keeps them inside
        # codegen without the RDD-conversion overhead a checkpoint pays
        # (measured ~0.3 s per checkpoint on KB-scale batches).
        s = bdf.sparkSession
        # spread default False: under the DEFAULT slicing contract
        # (n_slices=4, files_per_trigger=1) each micro-batch is a ~1k-doc
        # slice, where the per-batch plan->RDD probe + repartition cost
        # more than the parallelism buys (A/B measured ~1 s per replay).
        # Callers that reconfigure for coarse slices (large
        # files_per_trigger / small n_slices => 100k+-doc batches on a
        # couple of scan tasks) should pass spread_shingles=True.
        sets = shingle_sets(
            bdf, "doc_id", "text", k, spread=spread_shingles
        ).persist()
        banded = band_rows(
            minhash_signatures(sets, num_hashes), num_hashes, bands
        ).persist()
        cand_in = (
            banded.alias("a")
            .join(banded.alias("b"), ["band_id", "band_key"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
            )
        )
        store = sets
        cands = cand_in
        if os.path.exists(idx_bands):
            idx = s.read.parquet(idx_bands)
            # every indexed id precedes every batch id (doc_id slicing),
            # so the index side is always id_a
            cand_old = (
                idx.alias("a")
                .join(banded.alias("b"), ["band_id", "band_key"])
                .where(F.col("a.id") < F.col("b.id"))
                .select(
                    F.col("a.id").alias("id_a"),
                    F.col("b.id").alias("id_b"),
                )
            )
            cands = cand_old.unionByName(cand_in)
            store = s.read.parquet(idx_sets).unionByName(sets)
        # Pinned join-strategy verification: ONE job per batch (the
        # candidate pairs broadcast against the shingle store and score
        # in Arrow batches) instead of the auto gate's count + collect +
        # broadcast. Duplicate candidate pairs (multi-band collisions)
        # are NOT deduped first: verifying a pair twice is cheaper than
        # the extra shuffle, and the final min-per-doc pick is
        # insensitive to repeats. (A production deployment would bucket
        # the store by id so this join never rescans it; see docstring.)
        verified = _verify_jaccard(cands, store, threshold, strategy="join")
        verified.write.mode("append").parquet(out_dir)
        banded.write.mode("append").parquet(idx_bands)
        sets.write.mode("append").parquet(idx_sets)
        banded.unpersist()
        sets.unpersist()

    from ..functions.settings import query_settings

    # Micro-batches are KB-scale here; 8 shuffle partitions keep the
    # per-batch join stages from paying 32-64 task dispatches each. At
    # production scale this is the state_partitions_for-style knob.
    ckpt = (
        os.path.join(run_dir, "ckpt") if resuming else ckpt_dir("incdedup")
    )
    with query_settings(spark, {"spark.sql.shuffle.partitions": "8"}):
        q = (
            stream.writeStream.foreachBatch(process)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    dups = spark.read.parquet(out_dir)
    w = _W.partitionBy("id_b").orderBy("id_a")
    return (
        dups.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("id_b").alias("doc_id"),
            F.col("id_a").alias("rep_id"),
            F.col("jacc").alias("rep_jacc"),
        )
    )
