from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Small local session for tests: fewer shuffle partitions = faster tiny-data
# runs (scale configs live in session.get_spark and bench.py).
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402

#: sf0.01 is the driver's correctness scale (TESTDATA.md).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
