"""Python DataSource (Spark 4 DataSource V2 Python API): the
``generate_series`` table function as a REGISTERED source with
partitioned parallel reads.

The existing table functions (sources/io.py) rewrite to ``spark.range``
driver-side; this module exposes the same semantics through the engine's
own pluggable-source seam — ``spark.read.format("generate_series")`` —
the way a production integration would surface a ClickHouse table
function to every Spark user (SQL included) without helper imports.

Scale shape: the reader splits the closed interval into one
InputPartition per ~1M values (capped at 64); each partition yields
Arrow-friendly tuples independently on its executor, so generation
parallelism follows the cluster, not the driver. Predicate pushdown is
irrelevant (the source IS the predicate); column pruning is trivial
(single column).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import LongType, StructField, StructType

_PER_PARTITION = 1_000_000
_MAX_PARTITIONS = 64


class _SeriesPartition(InputPartition):
    def __init__(self, start: int, end: int, step: int):
        self.start, self.end, self.step = start, end, step


class _SeriesReader(DataSourceReader):
    def __init__(self, options):
        self.start = int(options.get("start", 0))
        self.stop = int(options.get("stop", 0))  # inclusive, CH-style
        self.step = int(options.get("step", 1))
        if self.step <= 0:
            raise ValueError("generate_series step must be positive")

    def partitions(self):
        n = max(0, (self.stop - self.start) // self.step + 1)
        per = max(
            _PER_PARTITION, -(-n // _MAX_PARTITIONS)
        )  # >=1M values each, <=64 splits
        parts = []
        i = self.start
        while i <= self.stop:
            hi = min(self.stop, i + (per - 1) * self.step)
            parts.append(_SeriesPartition(i, hi, self.step))
            i = hi + self.step
        return parts or [_SeriesPartition(self.start, self.start - 1, 1)]

    def read(self, partition):
        for v in range(partition.start, partition.end + 1, partition.step):
            yield (v,)


class GenerateSeriesDataSource(DataSource):
    """``spark.read.format("generate_series").option("start", a)
    .option("stop", b).option("step", s)`` → one ``value`` column, the
    ClickHouse/Postgres generate_series(a, b, s) contract (inclusive
    stop; empty when a > b)."""

    @classmethod
    def name(cls):
        return "generate_series"

    def schema(self):
        return StructType([StructField("value", LongType())])

    def reader(self, schema):
        return _SeriesReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the Python data source."""
    spark.dataSource.register(GenerateSeriesDataSource)


class _SeriesStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked finite counter stream: each micro-batch emits the
    next ``chunk`` values of [start, stop]; past ``stop`` the offset
    stops advancing (an idle, fully-drained stream). readBetweenOffsets
    makes recovery replays exact — the same closed-form range."""

    def __init__(self, options):
        self.start = int(options.get("start", 0))
        self.stop = int(options.get("stop", 0))
        self.chunk = int(options.get("chunk", 1000))
        if self.chunk <= 0:
            raise ValueError("series_stream chunk must be positive")

    def initialOffset(self):
        return {"pos": self.start}

    def read(self, start):
        pos = start["pos"]
        if pos > self.stop:
            return iter([]), {"pos": pos}
        hi = min(self.stop, pos + self.chunk - 1)
        return iter([(v,) for v in range(pos, hi + 1)]), {"pos": hi + 1}

    def readBetweenOffsets(self, start, end):
        return iter([(v,) for v in range(start["pos"], end["pos"])])


class SeriesStreamDataSource(DataSource):
    """``spark.readStream.format("series_stream")`` — the STREAMING half
    of the Python DataSource surface (generate_series is the batch
    half): a deterministic finite counter source whose end state is the
    full closed interval regardless of micro-batch timing."""

    @classmethod
    def name(cls):
        return "series_stream"

    def schema(self):
        return StructType([StructField("value", LongType())])

    def simpleStreamReader(self, schema):
        return _SeriesStreamReader(self.options)


def register_streaming(spark) -> None:
    """Idempotent registration of the streaming Python data source."""
    spark.dataSource.register(SeriesStreamDataSource)
