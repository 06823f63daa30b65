#!/usr/bin/env python3
"""Diff two committed bench-history captures (dev/bench_history/*.json).

Usage: python3 dev/bench_diff.py r12 r13 [threshold]

Prints the median per-query ratio, the common-query total movement, and
every query whose ratio exceeds `threshold` (default 1.5) in either
direction — annotated with the newer run's min..max spread when the
capture was min-of-N (SPARK_GRAFT_REPEAT>1), so a "regression" whose
spread straddles the old number reads as host noise, not code.
"""
import json
import statistics
import sys


def load(tag):
    with open(f"dev/bench_history/{tag}.json") as f:
        return json.load(f)


def main():
    old_tag, new_tag = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, new = load(old_tag), load(new_tag)
    qo, qn = old["queries"], new["queries"]
    mx = new.get("queries_max", {})
    common = sorted(k for k in qn if k in qo and qn[k] > 0 and qo[k] > 0)
    ratios = {k: qn[k] / qo[k] for k in common}
    med = statistics.median(ratios.values())
    print(f"{old_tag} -> {new_tag}: {len(common)} common queries, "
          f"median ratio {med:.3f}")
    print(f"common totals: {sum(qo[k] for k in common):.1f}s -> "
          f"{sum(qn[k] for k in common):.1f}s")
    added = sorted(k for k in qn if k not in qo)
    if added:
        print(f"new queries ({len(added)}): " +
              ", ".join(f"{k}={qn[k]:.2f}s" for k in added))
    removed = sorted(k for k in qo if k not in qn)
    if removed:
        print(f"removed queries ({len(removed)}): " + ", ".join(removed))
    flagged = [(r, k) for k, r in ratios.items() if r > thr or r < 1 / thr]
    for r, k in sorted(flagged, reverse=True):
        spread = f" (new spread {qn[k]:.2f}..{mx[k]:.2f}s)" if k in mx else ""
        noise = " [old value inside new spread -> host noise]" \
            if k in mx and qn[k] <= qo[k] <= mx[k] else ""
        print(f"  {r:5.2f}x  {k}: {qo[k]:.2f}s -> {qn[k]:.2f}s{spread}{noise}")
    if not flagged:
        print(f"no query moved more than {thr}x either way")


if __name__ == "__main__":
    main()
