#!/usr/bin/env python3
"""Join graft.Overhead's {name: {t_empty, t_data}} probe with a DIFF
artifact into the small-query latency-attribution table (COVERAGE).

Usage: python3 tools/attribute_tail.py <overhead.json> <DIFF_rN.json>

Per query: plan_s = t_data - t_empty (the data-dependent part of the
Spark wall), ratio_wall = t_data / duckdb_s (what DIFF reports),
ratio_plan = plan_s / duckdb_s (what a plan audit should judge).
Verdict 'overhead' when ratio_plan < 2 — the 2x driver bar applied to
the plan alone.
"""
import sys, json

def main(overhead_path, diff_path):
    oh = json.load(open(overhead_path))
    diff = json.load(open(diff_path))["queries"]
    rows = []
    for name, t in oh.items():
        duck = diff.get(name, {}).get("duckdb_s")
        if duck is None:
            continue
        plan = max(0.0, t["t_data"] - t["t_empty"])
        rows.append((name, t["t_empty"], t["t_data"], plan, duck,
                     t["t_data"] / duck if duck else float("inf"),
                     plan / duck if duck else float("inf")))
    rows.sort(key=lambda r: -r[6])
    print("| query | t_empty s | t_data s | plan s | duckdb s | wall ratio | plan ratio | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    n_overhead = 0
    for name, e, d, p, duck, rw, rp in rows:
        verdict = "overhead" if rp < 2 else "plan >2x"
        n_overhead += verdict == "overhead"
        print(f"| {name} | {e:.2f} | {d:.2f} | {p:.2f} | {duck:.3f} | "
              f"{rw:.1f}x | {rp:.1f}x | {verdict} |")
    print(f"\n{n_overhead}/{len(rows)} attributed to fixed per-job overhead "
          f"(plan ratio < 2x); {len(rows) - n_overhead} need a plan look.")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
