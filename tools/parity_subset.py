"""Ad-hoc driver-style parity check for a named subset of queries.

Usage: python tools/parity_subset.py q4_order_priority q21_waiting_suppliers
Runs at sf0.01 (override with PARITY_SF_DIR), prints one line per query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402
from tests.parity import assert_driver_safe_schema, run_oracle  # noqa: E402
from tools.local_parity import frame_hash  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    qs, oracles = e.queries(), e.oracle_sql()
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failures += 1
            continue
        try:
            df = qs[name](spark, sf_dir)
            assert_driver_safe_schema(df.schema, name)
            sdf = df.toPandas()
            if name not in oracles:
                # Deliberately non-SQL-expressible op → the driver runs a
                # weaker rows-only check; mirror it instead of erroring.
                print(f"{name}: rows-only, {len(sdf)} rows")
                continue
            odf = run_oracle(oracles[name], sf_dir)
            ok_rows = len(sdf) == len(odf)
            ok_schema = sorted(sdf.columns) == sorted(odf.columns)
            ok_hash = ok_schema and frame_hash(sdf) == frame_hash(odf)
            status = "OK" if (ok_rows and ok_schema and ok_hash) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(
                f"{name}: {status} rows={len(sdf)}/{len(odf)} "
                f"schema={ok_schema} hash={ok_hash}"
            )
            if not ok_schema:
                print("  spark cols:", list(sdf.columns))
                print("  oracle cols:", list(odf.columns))
            elif not ok_hash:
                print("  spark head:\n", sdf.head(5))
                print("  oracle head:\n", odf.head(5))
        except Exception as ex:  # noqa: BLE001
            failures += 1
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
