"""Run the driver-style parity check for a named subset of queries.

Usage: python tools/parity_subset.py <name> [<name> ...] [--sf <dir>]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402
from tests.parity import assert_driver_safe_schema, run_oracle  # noqa: E402
from tools.local_parity import frame_hash  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
    if "--sf" in args:
        i = args.index("--sf")
        if i + 1 >= len(args):
            sys.exit("usage: parity_subset.py <name>... [--sf DIR]")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2:]
    if not args:
        sys.exit("usage: parity_subset.py <name>... [--sf DIR]")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    oracles = e.oracle_sql()
    ok = True
    for name in args:
        if name not in qs:
            ok = False
            print(f"{name:36s} NOT REGISTERED")
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            assert_driver_safe_schema(sdf.schema, name)
            spdf = sdf.toPandas()
            if name in oracles:
                opdf = run_oracle(oracles[name], sf_dir)
                rows = len(spdf) == len(opdf)
                schema = sorted(spdf.columns) == sorted(opdf.columns)
                hm = rows and schema and frame_hash(spdf) == frame_hash(opdf)
                status = "green" if hm else "RED"
                if not hm:
                    ok = False
                    print(f"  spark cols={sorted(spdf.columns)}")
                    print(f"  oracle cols={sorted(opdf.columns)}")
                    print(f"  spark rows={len(spdf)} oracle rows={len(opdf)}")
                    print(spdf.head(8).to_string())
                    print(opdf.head(8).to_string())
            else:
                status = "rows-only"
            print(f"{name:36s} {status:9s} rows={len(spdf)} "
                  f"{time.time()-t0:5.1f}s")
        except Exception as ex:  # noqa: BLE001
            ok = False
            print(f"{name:36s} ERR {type(ex).__name__}: {ex}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
