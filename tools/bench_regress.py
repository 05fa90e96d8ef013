#!/usr/bin/env python3
"""Round-over-round bench regression report from bench_history.jsonl.

Usage: python3 tools/bench_regress.py [historyPath] [--last N]

Compares the newest entry against the N-th-from-last (default: the
previous one). A query is flagged only when BOTH the ratio exceeds
1.3x AND the absolute delta exceeds 0.5 s — the host shows ±10-25%
whole-run noise windows (measured round 12: an r11-HEAD worktree re-run
inside a slow window reproduced a uniform ~1.24x on untouched queries),
so a pure-ratio threshold would cry wolf every congested run. The
median ratio is printed first: if it is itself >> 1, suspect the host
before the code.
"""
import sys, json, statistics

def main(argv):
    path = argv[1] if len(argv) > 1 and not argv[1].startswith("--") \
        else "bench_history.jsonl"
    back = 1
    if "--last" in argv:
        back = int(argv[argv.index("--last") + 1])
    hist = [json.loads(l) for l in open(path) if l.strip()]
    if len(hist) < back + 1:
        print(f"need >= {back + 1} entries, have {len(hist)}")
        return 1
    prev, cur = hist[-1 - back], hist[-1]
    pq, cq = prev["queries"], cur["queries"]
    common = sorted(set(pq) & set(cq))
    # calib_s is the run's pinned self-calibration probe (64M xxhash64
    # on 32 tasks, median-of-brackets): when both entries carry it,
    # normalize the current run onto the previous run's host window so
    # ratios measure CODE, not window speed. Raw numbers stay printed.
    norm = 1.0
    if prev.get("calib_s") and cur.get("calib_s"):
        norm = prev["calib_s"] / cur["calib_s"]
    ratios = [cq[k] * norm / pq[k] for k in common if pq[k] > 0]
    med = statistics.median(ratios)
    print(f"prev {prev['ts'][:19]} total {sum(pq.values()):.1f} s "
          f"({len(pq)} queries, calib {prev.get('calib_s', 'n/a')})")
    print(f"cur  {cur['ts'][:19]} total {sum(cq.values()):.1f} s "
          f"({len(cq)} queries, calib {cur.get('calib_s', 'n/a')})")
    if norm != 1.0:
        print(f"window normalization prev/cur calib = {norm:.3f} "
              f"(ratios below are calib-normalized)")
    print(f"median per-query ratio {med:.3f} "
          f"({'host-noise window likely' if med > 1.15 or med < 0.87 else 'comparable conditions'})")
    flagged = [(k, pq[k], cq[k] * norm) for k in common
               if pq[k] > 0 and cq[k] * norm / pq[k] > 1.3
               and cq[k] * norm - pq[k] > 0.5]
    flagged.sort(key=lambda r: -(r[2] - r[1]))
    if flagged:
        print(f"\n{len(flagged)} regressions (>1.3x AND >+0.5 s):")
        for k, p, c in flagged:
            print(f"  {k:30s} {p:6.2f} -> {c:6.2f}  ({c / p:.2f}x, +{c - p:.2f} s)")
    else:
        print("\nno regressions past the noise gate")
    new = sorted(set(cq) - set(pq))
    gone = sorted(set(pq) - set(cq))
    if new:
        print(f"new queries: {len(new)} "
              f"(+{sum(cq[k] for k in new):.1f} s): {', '.join(new)}")
    if gone:
        print(f"removed queries: {gone}")
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv))
