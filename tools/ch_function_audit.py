"""Translation-table audit (r6 verdict directive #6): resolve every
name in the public ClickHouse function catalog
(functions/ch_catalog.py) to exactly one coverage status and write the
machine-readable result to CH_FUNCTION_COVERAGE.json at the repo root.

Resolution order per name:
1. BUILTIN (ANSI surface Spark SQL parses directly)
2. CH_FUNCTIONS (the scalar translation table)
3. REGISTRY_OVERRIDES (implemented under a different internal name)
4. UNSUPPORTED (deliberate, reason recorded)
5. word-boundary source search across queries/ + operators/ —
   implemented as an oracle-checked registry query / operator
6. otherwise: UNCLASSIFIED — the audit fails; every new catalog name
   must be consciously classified, no silent gaps.

Also flags CH_FUNCTIONS keys missing from the catalog (the catalog must
be a superset of the table, or the audit is reading the wrong list).

Usage: python tools/ch_function_audit.py [--check]
  --check: exit 1 on unclassified names / catalog gaps, write nothing.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_objects_analysis_spark.functions.ch import (  # noqa: E402
    CH_FUNCTIONS,
    NON_BIT_COMPATIBLE,
)
from clickhouse_objects_analysis_spark.functions.ch_catalog import (  # noqa: E402
    BUILTIN,
    CATALOG,
    FAMILIES,
    REGISTRY_OVERRIDES,
    UNSUPPORTED,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "clickhouse_objects_analysis_spark")


def _source_index() -> list[tuple[str, str]]:
    out = []
    for sub in ("queries", "operators", "streaming", "plans"):
        d = os.path.join(PKG, sub)
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".py"):
                path = os.path.join(d, fn)
                with open(path) as fh:
                    out.append((f"{sub}/{fn}", fh.read()))
    return out


def audit() -> dict:
    sources = _source_index()
    coverage: dict[str, dict] = {}
    for category, names in CATALOG.items():
        for name in names:
            rec: dict = {"category": category}
            if name in BUILTIN:
                rec.update(status="builtin", via=BUILTIN[name])
            elif name in CH_FUNCTIONS:
                rec.update(status="table", via="functions/ch.py")
                if name in NON_BIT_COMPATIBLE:
                    rec["non_bit_compatible"] = True
            elif name in REGISTRY_OVERRIDES:
                rec.update(status="registry", via=REGISTRY_OVERRIDES[name])
            elif name in UNSUPPORTED:
                rec.update(status="unsupported", reason=UNSUPPORTED[name])
            else:
                pat = re.compile(rf"\b{re.escape(name)}\b")
                hit = next(
                    (f for f, text in sources if pat.search(text)), None
                )
                if hit and len(name) >= 4:
                    rec.update(status="registry", via=hit)
                else:
                    rec.update(status="UNCLASSIFIED")
            coverage[name] = rec

    table_not_in_catalog = sorted(set(CH_FUNCTIONS) - set(coverage))
    statuses = [r["status"] for r in coverage.values()]
    summary = {
        "catalog_names": len(coverage),
        "table": statuses.count("table"),
        "builtin": statuses.count("builtin"),
        "registry": statuses.count("registry"),
        "unsupported": statuses.count("unsupported"),
        "unclassified": statuses.count("UNCLASSIFIED"),
        "families": len(FAMILIES),
        "table_entries": len(CH_FUNCTIONS),
        "table_not_in_catalog": table_not_in_catalog,
    }
    return {"summary": summary, "families": FAMILIES, "functions": coverage}


def main() -> None:
    result = audit()
    s = result["summary"]
    bad = s["unclassified"] or s["table_not_in_catalog"]
    if bad:
        print(
            "UNCLASSIFIED:",
            [n for n, r in result["functions"].items()
             if r["status"] == "UNCLASSIFIED"],
        )
        print("TABLE NOT IN CATALOG:", s["table_not_in_catalog"])
    if "--check" in sys.argv:
        print(json.dumps(s, indent=1))
        sys.exit(1 if bad else 0)
    dest = os.path.join(ROOT, "CH_FUNCTION_COVERAGE.json")
    with open(dest, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
    print(f"WROTE {dest}")
    print(json.dumps(s, indent=1))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
