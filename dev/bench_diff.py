#!/usr/bin/env python3
"""Diff committed bench-history captures (dev/bench_history/*.json).

Usage: python3 dev/bench_diff.py r13 r14a,r14b [threshold]

Either side may be a comma-separated list of tags from SEPARATE runs of
the same round (the r13 prescription: two full min-of-2 runs per round).
Per query each run contributes its min-of-N value; a side's BOX is
[min over runs, max over runs], further widened by the per-run
queries_max spread when present. A query is flagged only when its
best-to-best ratio exceeds `threshold` (default 1.5) AND the two boxes
do not overlap — cross-run host noise (this box swings single shots up
to ~4x and even min-of-2 values ~1.6x across runs) then reads as
overlap, not regression. Ratios and totals use each side's best (min
across runs) value.
"""
import json
import statistics
import sys


def load(tag):
    with open(f"dev/bench_history/{tag}.json") as f:
        return json.load(f)


def side(tags):
    """tag list -> (best value per query, box per query)."""
    runs = [load(t) for t in tags.split(",")]
    best, box = {}, {}
    for run in runs:
        qs, mx = run["queries"], run.get("queries_max", {})
        for k, v in qs.items():
            if v <= 0:
                continue
            best[k] = min(best.get(k, v), v)
            lo, hi = box.get(k, (v, v))
            box[k] = (min(lo, v), max(hi, v, mx.get(k, v)))
    return best, box


def main():
    old_tag, new_tag = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qo, bo = side(old_tag)
    qn, bn = side(new_tag)
    common = sorted(k for k in qn if k in qo)
    ratios = {k: qn[k] / qo[k] for k in common}
    med = statistics.median(ratios.values())
    print(f"{old_tag} -> {new_tag}: {len(common)} common queries, "
          f"median ratio {med:.3f}")
    print(f"common totals (best-of-runs): {sum(qo[k] for k in common):.1f}s"
          f" -> {sum(qn[k] for k in common):.1f}s")
    added = sorted(k for k in qn if k not in qo)
    if added:
        print(f"new queries ({len(added)}): " +
              ", ".join(f"{k}={qn[k]:.2f}s" for k in added))
    removed = sorted(k for k in qo if k not in qn)
    if removed:
        print(f"removed queries ({len(removed)}): " + ", ".join(removed))
    moved = [(r, k) for k, r in ratios.items() if r > thr or r < 1 / thr]
    flagged, noise = [], []
    for r, k in sorted(moved, reverse=True):
        (olo, ohi), (nlo, nhi) = bo[k], bn[k]
        overlap = nlo <= ohi and olo <= nhi
        line = (f"  {r:5.2f}x  {k}: {qo[k]:.2f}s ({olo:.2f}..{ohi:.2f}) -> "
                f"{qn[k]:.2f}s ({nlo:.2f}..{nhi:.2f})")
        (noise if overlap else flagged).append(
            line + (" [boxes overlap -> host noise]" if overlap else ""))
    for line in flagged + noise:
        print(line)
    if not moved:
        print(f"no query moved more than {thr}x either way")
    elif not flagged:
        print("every >threshold mover's boxes overlap -> host noise only")


if __name__ == "__main__":
    main()
