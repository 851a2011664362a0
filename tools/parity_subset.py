"""Run the driver-style parity check for a named subset of queries.

Usage: python tools/parity_subset.py q1 q2 ... [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402
from tests.parity import run_oracle  # noqa: E402
from tools.local_parity import frame_hash  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    fail = 0
    for name in argv:
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{name}: rows-only, {len(spdf)} rows "
                      f"({time.time()-t0:.2f}s)")
                continue
            opdf = run_oracle(oracles[name], sf_dir)
            ok = (
                len(spdf) == len(opdf)
                and sorted(spdf.columns) == sorted(opdf.columns)
                and frame_hash(spdf) == frame_hash(opdf)
            )
            fail += 0 if ok else 1
            print(
                f"{name}: {'GREEN' if ok else 'RED'} "
                f"spark={len(spdf)} oracle={len(opdf)} "
                f"({time.time()-t0:.2f}s)"
            )
            if not ok and len(spdf) < 20:
                print(spdf.sort_index(axis=1).to_string())
                print(opdf.sort_index(axis=1).to_string())
        except Exception as ex:  # noqa: BLE001
            fail += 1
            print(f"{name}: ERR {type(ex).__name__}: {ex}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
