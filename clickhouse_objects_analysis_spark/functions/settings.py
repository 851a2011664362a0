"""Per-query SETTINGS (settingsClause, ClickHouseParser.py:10271-10297) as
a scoped SparkConf context manager (SURVEY §4.2 mapping).

ClickHouse's ``SELECT ... SETTINGS max_threads = 4`` scopes engine knobs to
one statement. Spark's session conf is mutable-global, so the faithful
shape is save → set → run → restore. Confs that matter per-query on a
cluster: ``spark.sql.shuffle.partitions``, AQE toggles, broadcast
thresholds, ANSI mode.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping
from contextlib import contextmanager

from pyspark.sql import SparkSession

_UNSET = object()


@contextmanager
def query_settings(spark: SparkSession, settings: Mapping[str, str]) -> Iterator[None]:
    """Apply ``settings`` for the duration of the block, then restore each
    key to its previous value (or unset it if it had none).

    Note Spark reads most SQL confs at *action* time — the DataFrame must
    be executed inside the block, not merely defined there.
    """
    saved: dict[str, object] = {}
    for key, value in settings.items():
        try:
            saved[key] = spark.conf.get(key)
        except Exception:
            saved[key] = _UNSET
        spark.conf.set(key, value)
    try:
        yield
    finally:
        for key, prev in saved.items():
            if prev is _UNSET:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
