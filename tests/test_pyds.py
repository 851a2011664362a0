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
