"""Record a driver-style correctness result for EVERY registered query —
not just the 50 the driver's capped window reaches.

For each query: run the Spark build and the DuckDB oracle at sf0.01,
compare row count, sorted column names, and a value hash over canonical
cell renderings (floats bit-exact, timestamps ISO), mirroring the
driver's t2 gate. Rows-only queries record execution + row count.

Writes LOCAL_PARITY_r{N}.json at the repo root:

    {"<query>": {"rows_match": true, "schema_match": true,
                 "hash_match": true, "spark_rows": N, "oracle_rows": N,
                 "err": null}, ...}

Usage: python tools/local_parity.py <round> [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402
from clickhouse_objects_analysis_spark.session import get_spark  # noqa: E402
from tests.parity import (  # noqa: E402
    _canon_cell,
    assert_driver_safe_schema,
    run_oracle,
)


def frame_hash(pdf) -> str:
    """Mirror the driver's canonicalizer: row-sort the frame across ALL
    name-sorted columns before hashing.  The driver sorts the raw frame
    with pandas ``sort_values``; any deterministic total order over
    canonical cell renderings yields the same multiset hash, so we sort
    fully-rendered rows (which also stays deterministic for cells the
    raw sort could not compare).  Complex cells (list/dict) are rejected
    upstream by ``assert_driver_safe_schema`` — the driver crashes on
    them, so they must never reach this hash."""
    cols = sorted(pdf.columns)
    rows = [
        tuple(repr(_canon_cell(row[c])) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    rows.sort()
    h = hashlib.sha256()
    for row in rows:
        for cell in row:
            h.update(cell.encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    oracles = e.oracle_sql()
    out: dict[str, dict] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, sf_dir)
            assert_driver_safe_schema(sdf.schema, name)
            spdf = sdf.toPandas()
            rec["spark_rows"] = len(spdf)
            if name in oracles:
                opdf = run_oracle(oracles[name], sf_dir)
                rec["oracle_rows"] = len(opdf)
                rec["rows_match"] = len(spdf) == len(opdf)
                rec["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and frame_hash(spdf) == frame_hash(opdf)
                )
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"{type(ex).__name__}: {ex}"[:200]
        out[name] = rec
        status = (
            "green"
            if rec["hash_match"]
            else ("rows-only" if name not in oracles and not rec["err"] else "RED")
        )
        print(f"{i:3d} {name:36s} {status:9s} cum={time.time()-t0:6.1f}s")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"LOCAL_PARITY_r{rnd:02d}.json",
    )
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=1)
    greens = sum(1 for r in out.values() if r["hash_match"])
    rows_only = sum(
        1 for n, r in out.items() if n not in oracles and not r["err"]
    )
    reds = len(out) - greens - rows_only
    print(
        f"WROTE {dest}: {greens} green / {rows_only} rows-only / {reds} red "
        f"of {len(out)} in {time.time()-t0:.0f}s"
    )


if __name__ == "__main__":
    main()
