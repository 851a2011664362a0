#!/usr/bin/env python
"""Compare the r14 before/after BENCH_FULL artifacts (normalized view),
printing total, per-query movers, and the touched-query deltas."""

from __future__ import annotations

import json
import sys

before = json.load(open(sys.argv[1] if len(sys.argv) > 1
                        else "bench_out/BENCH_FULL_r14_before.json"))
after = json.load(open(sys.argv[2] if len(sys.argv) > 2
                       else "BENCH_FULL.json"))

bn, an = before["queries_norm"], after["queries_norm"]
print(f"total_norm before={before['value_norm']} after={after['value_norm']}")
print(f"cal_ref before={before['noise_model']['cal_ref']} "
      f"after={after['noise_model']['cal_ref']} | spread "
      f"before={before['noise_model']['cal_spread']} "
      f"after={after['noise_model']['cal_spread']}")
common = [k for k in bn if k in an]
ratios = sorted((an[k] / bn[k], k) for k in common if bn[k] >= 0.3)
med = ratios[len(ratios) // 2]
print(f"median norm ratio (>=0.3s before): {med[0]:.3f} ({med[1]})")
print("\ntouched queries:")
for k in ("gopher_repetition_rules", "boilerplate_span_scrub",
          "personalized_pagerank_copurchase",
          "label_propagation_communities", "k_core_decomposition"):
    print(f"  {k:40s} {bn[k]:7.3f} -> {an[k]:7.3f}  "
          f"(raw {before['queries'][k]:.3f} -> {after['queries'][k]:.3f})")
print("\ntop-10 improvements (norm, before>=0.5):")
for r, k in [x for x in ratios if bn[x[1]] >= 0.5][:10]:
    print(f"  {k:40s} {bn[k]:7.3f} -> {an[k]:7.3f}  x{r:.2f}")
print("\ntop-10 regressions (norm, before>=0.5):")
for r, k in [x for x in reversed(ratios) if bn[x[1]] >= 0.5][:10]:
    print(f"  {k:40s} {bn[k]:7.3f} -> {an[k]:7.3f}  x{r:.2f}")
