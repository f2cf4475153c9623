#!/usr/bin/env python3
"""Compare two controlled bench artifacts per query.

Usage: compare_bench.py OLD.json NEW.json [ratio_threshold] [min_old_sec]

Prints totals, canary fields, median min-ratio, and every query whose
NEW/OLD min ratio exceeds the threshold (default 1.3) with OLD min above
min_old_sec (default 0.3 s) — the regression rule the round verdicts use.
"""
import json
import statistics
import sys


def load(p):
    return json.loads(open(p).read())


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    print(f"old total {old['value']:.1f}s  new total {new['value']:.1f}s  "
          f"nq {old['nq']}→{new['nq']}")
    for k in ("canary_first", "canary_mid_cpu", "canary_last"):
        print(f"  old {k}: {old.get(k)}   new {k}: {new.get(k)}")
    oq = {k: v["min"] for k, v in old["queries"].items() if v["min"] > 0}
    nq = {k: v["min"] for k, v in new["queries"].items() if v["min"] > 0}
    common = sorted(set(oq) & set(nq))
    ratios = [nq[k] / oq[k] for k in common]
    print(f"common {len(common)}  median ratio {statistics.median(ratios):.3f}")
    regressions = [(nq[k] / oq[k], k) for k in common
                   if oq[k] > floor and nq[k] / oq[k] >= thr]
    print(f"regressions (ratio>={thr}, old>{floor}s): {len(regressions)}")
    for r, k in sorted(regressions, reverse=True):
        print(f"  {k}: {oq[k]:.2f} -> {nq[k]:.2f}  ({r:.2f}x)")
    improvements = sorted((nq[k] / oq[k], k) for k in common if oq[k] > 1.0)[:8]
    print("largest improvements (old>1s):")
    for r, k in improvements:
        print(f"  {k}: {oq[k]:.2f} -> {nq[k]:.2f}  ({r:.2f}x)")


if __name__ == "__main__":
    main()
