"""Python DataSource (sources/pyds.py): partition splitting must cover
the series exactly once, and the registered source must agree with
spark.range semantics."""

from __future__ import annotations

import pytest

from clickhouse_objects_analysis_spark.sources.pyds import (
    _SeriesReader,
    register,
)


def _values(reader):
    out = []
    for p in reader.partitions():
        out.extend(v for (v,) in reader.read(p))
    return out


def test_partitions_cover_exactly_once():
    r = _SeriesReader({"start": "0", "stop": "5000000", "step": "3"})
    parts = r.partitions()
    assert len(parts) > 1  # >1M values per split, so this range splits
    vals = _values(r)
    assert vals == list(range(0, 5000001, 3))


def test_empty_and_singleton_ranges():
    assert _values(_SeriesReader({"start": "5", "stop": "4"})) == []
    assert _values(_SeriesReader({"start": "7", "stop": "7"})) == [7]


def test_step_validation():
    with pytest.raises(ValueError, match="step"):
        _SeriesReader({"start": "0", "stop": "9", "step": "0"})


def test_registered_source_reads(spark):
    register(spark)
    df = (
        spark.read.format("generate_series")
        .option("start", 10)
        .option("stop", 30)
        .option("step", 5)
        .load()
    )
    assert [r["value"] for r in df.orderBy("value").collect()] == [
        10, 15, 20, 25, 30,
    ]


def test_series_stream_reader_offsets():
    from clickhouse_objects_analysis_spark.sources.pyds import (
        _SeriesStreamReader,
    )

    r = _SeriesStreamReader({"start": "0", "stop": "24", "chunk": "10"})
    off = r.initialOffset()
    seen = []
    for _ in range(5):
        rows, off = r.read(off)
        seen.extend(v for (v,) in rows)
    assert seen == list(range(25))  # drained; further reads are empty
    assert off == {"pos": 25}
    # recovery replay between offsets is the same closed-form range
    replay = [v for (v,) in r.readBetweenOffsets({"pos": 10}, {"pos": 20})]
    assert replay == list(range(10, 20))


def test_series_stream_chunk_validation():
    import pytest

    from clickhouse_objects_analysis_spark.sources.pyds import (
        _SeriesStreamReader,
    )

    with pytest.raises(ValueError, match="chunk"):
        _SeriesStreamReader({"start": "0", "stop": "9", "chunk": "0"})
