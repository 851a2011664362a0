"""Calibration-normalized round-over-round bench comparison (r6 verdict
directive #7).

Both inputs are bench.py side files ({"queries": {...},
"calibration_sec": X}). Per query the reported figure is

    (t_new / cal_new) / (t_old / cal_old)

— dividing by the data-independent spark.range-aggregate calibration
time cancels uniform host-speed shifts (virtualization jitter, thermal
state), so a ratio > 1 is a real plan/code regression, not a slow host.

Prints a summary + the worst normalized ratios as markdown, flags
anything > 1.3 on a query costing ≥ 0.3 s (micro-queries live inside
run noise).

Usage: python tools/bench_compare.py OLD.json NEW.json [--floor 0.3]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    floor = (
        float(sys.argv[sys.argv.index("--floor") + 1])
        if "--floor" in sys.argv
        else 0.3
    )
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    # r7+ policy (SCALE.md): normalize by the LONG calibration when both
    # sides carry it — the short 50M figure swings ±25% across JVMs, the
    # 8B one repeats within ~1%.
    key = (
        "calibration_long_sec"
        if "calibration_long_sec" in old and "calibration_long_sec" in new
        else "calibration_sec"
    )
    cal_old, cal_new = old[key], new[key]
    print(
        f"calibration ({key}): old={cal_old}s new={cal_new}s "
        f"(host factor {cal_new / cal_old:.3f})"
    )
    common = sorted(set(old["queries"]) & set(new["queries"]))
    rows = []
    for name in common:
        t_old, t_new = old["queries"][name], new["queries"][name]
        if t_old <= 0:
            continue
        norm = (t_new / cal_new) / (t_old / cal_old)
        rows.append((norm, name, t_old, t_new))
    norms = [r[0] for r in rows]
    print(
        f"{len(rows)} common queries; median normalized ratio "
        f"{statistics.median(norms):.3f} "
        f"(p90 {sorted(norms)[int(0.9 * len(norms))]:.3f})"
    )
    flagged = [
        r for r in rows if r[0] > 1.3 and max(r[2], r[3]) >= floor
    ]
    print(f"\nflagged >1.3x normalized (cost >= {floor}s): {len(flagged)}")
    print("| query | old s | new s | normalized |")
    print("|---|---|---|---|")
    for norm, name, t_old, t_new in sorted(
        rows, key=lambda r: -r[0]
    )[: max(10, len(flagged))]:
        mark = " **FLAG**" if (norm, name, t_old, t_new) in flagged else ""
        print(f"| {name}{mark} | {t_old:.3f} | {t_new:.3f} | {norm:.2f} |")
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_new:
        print(f"\nnew this round ({len(only_new)}):")
        for name in only_new:
            print(f"| {name} | — | {new['queries'][name]:.3f} | new |")


if __name__ == "__main__":
    main()
