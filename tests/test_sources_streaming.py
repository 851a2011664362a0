"""Table-function dispatch, watermark late-data policy, and the
KILL/SYSTEM statement mappings (SURVEY §2.B rows 'Table functions',
'KILL / SYSTEM', and the streaming-surface watermark semantics)."""

from __future__ import annotations

import threading
import time

import pandas as pd
import pyspark.sql.functions as F
import pytest

from clickhouse_objects_analysis_spark.sources.io import table_function


def test_table_function_numbers(spark):
    rows = table_function(spark, "numbers", 5).collect()
    assert [r.number for r in rows] == [0, 1, 2, 3, 4]


def test_table_function_s3_rewrites_scheme(spark):
    # No s3a filesystem on the offline classpath — the failure itself
    # proves the s3:// → s3a:// connector rewrite took effect.
    with pytest.raises(Exception, match="s3a"):
        table_function(spark, "s3", "s3://bucket/key", "Parquet").collect()


def test_table_function_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="unsupported FORMAT"):
        table_function(spark, "file", "/tmp/x", "Protobuf")


def test_table_function_rejects_unknown_function(spark):
    with pytest.raises(ValueError, match="unknown table function"):
        table_function(spark, "remoteSecure", "host")


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data policy, at the exact guarantee boundary (established
    empirically): a late row arriving while its window is STILL IN STATE
    is merged — even if it is behind the watermark — because eviction
    runs at end-of-batch; a late row arriving AFTER its window was
    finalized+emitted is dropped (counted in numRowsDroppedByWatermark)
    and the window is never re-emitted. This is the semantics a LIVE-view
    replacement inherits, so it's pinned by test."""
    src = tmp_path / "stream"
    src.mkdir()

    def put(name, ts_list):
        # microsecond units — pandas' default nanos read back as raw INT64
        pd.DataFrame(
            {"ts": pd.to_datetime(ts_list), "v": [1] * len(ts_list)}
        ).to_parquet(src / name, coerce_timestamps="us")
        time.sleep(1.05)  # file source orders batches by modification time

    put("a.parquet", ["2026-01-01 10:00:00", "2026-01-01 10:00:30"])
    put("b.parquet", ["2026-01-01 10:00:35"])  # advances the watermark
    put("c.parquet", ["2026-01-01 10:00:05"])  # late: window already closed

    stream = (
        spark.readStream.schema("ts timestamp, v bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 seconds").alias("w"))
        .agg(F.sum("v").alias("s"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)
    dropped = sum(
        s["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        for s in p["stateOperators"]
    )
    assert dropped == 1, [p["stateOperators"] for p in q.recentProgress]
    res = {
        r.w.start.isoformat(): r.s for r in spark.table("late_test").collect()
    }
    # the 10:00:00 window finalized with exactly the on-time row; the late
    # event neither updated it nor produced a duplicate emission
    assert res == {"2026-01-01T10:00:00": 1}, res


class TestKillSystem:
    def test_kill_query_cancels_job_group(self, spark):
        """KILL QUERY (KillStmtContext ClickHouseParser.py:8274) →
        cancelJobGroup: a runaway job dies, the session survives."""
        errs: list[Exception] = []

        def runaway():
            try:
                spark.sparkContext.setJobGroup(
                    "kill_me", "runaway", interruptOnCancel=True
                )
                spark.range(10**12).selectExpr("sum(id * id)").collect()
            except Exception as e:  # cancellation surfaces as a Py4J error
                errs.append(e)

        t = threading.Thread(target=runaway)
        t.start()
        time.sleep(2)
        spark.sparkContext.cancelJobGroup("kill_me")
        t.join(300)
        assert not t.is_alive() and errs, "job group was not cancelled"
        # the session is still usable afterwards
        assert spark.range(3).count() == 3

    def test_system_drop_cache(self, spark):
        """SYSTEM DROP ... CACHE (SystemStmtContext :13902) →
        catalog.clearCache()."""
        df = spark.range(100)
        df.createOrReplaceTempView("cache_probe")
        spark.catalog.cacheTable("cache_probe")
        assert spark.catalog.isCached("cache_probe")
        spark.catalog.clearCache()
        assert not spark.catalog.isCached("cache_probe")
        spark.catalog.dropTempView("cache_probe")


class TestWatchHeartbeats:
    def test_watch_events_versions_and_totals(self, spark, sf_dir):
        from clickhouse_objects_analysis_spark.streaming.pipeline import (
            watch_heartbeats,
        )

        got = watch_heartbeats(spark, sf_dir).orderBy("version").collect()
        assert [r["version"] for r in got] == [0, 1, 2, 3]
        # running total is cumulative and ends at the full table size
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert got[-1]["n_total"] == n_events
        assert all(
            got[i]["n_total"] == got[i - 1]["n_total"] + got[i]["n_new_rows"]
            for i in range(1, 4)
        )

    def test_watch_limit_detaches_after_n(self, spark, sf_dir):
        from clickhouse_objects_analysis_spark.streaming.pipeline import (
            watch_heartbeats,
        )

        got = watch_heartbeats(spark, sf_dir, limit=2).orderBy("version").collect()
        assert [r["version"] for r in got] == [0, 1]


def test_events_stream_dir_rebuilds_on_layout_change(spark, tmp_path):
    """A regenerated source with a different part layout must get a fresh
    (or rebuilt) scratch link dir — stale links from a previous layout
    would double-count every row (round-4 ADVICE)."""
    import glob
    import os
    import shutil

    from clickhouse_objects_analysis_spark.streaming.pipeline import (
        read_events_stream,
    )

    src = tmp_path / "sfX"
    src.mkdir()
    base = pd.read_parquet("/root/testdata/sf0.001/events.parquet").head(100)
    # layout 1: single file
    base.to_parquet(src / "events.parquet")

    def count_rows():
        df = read_events_stream(spark, str(src))
        name = f"relink_{os.urandom(4).hex()}"
        q = (
            df.writeStream.format("memory").queryName(name)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.table(name).count()

    assert count_rows() == 100

    # layout 2: directory of two part files, same path name
    (src / "events.parquet").unlink()
    d = src / "events.parquet"
    d.mkdir()
    base.head(40).to_parquet(d / "part-0000.parquet")
    base.tail(60).to_parquet(d / "part-0001.parquet")
    assert count_rows() == 100  # not 200: no stale single-file link

    # layout 3: back to fewer parts — no dangling links either
    for f in glob.glob(str(d / "*.parquet")):
        os.remove(f)
    base.head(25).to_parquet(d / "part-0000.parquet")
    assert count_rows() == 25


class TestStatePartitionSizing:
    """state_partitions_for encodes the round-5 STATE_PARTITIONS sweep
    (SCALE.md): ~2 MiB parquet input per state partition, pow2, floor 8,
    cap 512 — the sf1 session-window number must reproduce without
    manual tuning."""

    def test_curve_matches_sweep(self, tmp_path):
        from clickhouse_objects_analysis_spark.streaming.pipeline import (
            state_partitions_for,
        )

        def fake_sf(n_bytes):
            d = tmp_path / f"sf_{n_bytes}"
            d.mkdir()
            (d / "events.parquet").write_bytes(b"\0" * n_bytes)
            return str(d)

        # sf0.1 (~2 MB) -> floor 4 (r10: the 8-partition floor was
        # store-commit-dominated at toy inputs — left-outer 3.3 -> 2.5 s
        # at 4); sf1 (~20 MB) -> 16 (inside the measured 8-16 optimum;
        # 32 measured 2.2x slower)
        assert state_partitions_for(fake_sf(2_000_000)) == "4"
        assert state_partitions_for(fake_sf(20_000_000)) == "16"
        # sf10 (~200 MB) -> 128; growth stays monotone and capped
        assert state_partitions_for(fake_sf(200_000_000)) == "128"
        assert state_partitions_for(fake_sf(10_000_000_000)) == "512"

    def test_missing_source_falls_back_to_floor(self, tmp_path):
        from clickhouse_objects_analysis_spark.streaming.pipeline import (
            STATE_PARTITIONS,
            state_partitions_for,
        )

        assert state_partitions_for(str(tmp_path / "nope")) == STATE_PARTITIONS

    def test_real_testdata_sizing(self):
        from clickhouse_objects_analysis_spark.streaming.pipeline import (
            state_partitions_for,
        )

        # the bundled sf0.1 events (~2 MB) sit at the floor (4 since
        # the r10 fixed-cost audit)
        assert state_partitions_for("/root/testdata/sf0.1") == "4"
