#!/usr/bin/env python3
"""Round-close artifact gate (VERDICT r13 item 1).

The last two rounds closed with DIFF/bench artifacts lagging the final
HEAD's query surface (r12: 283 vs 276; r13: 299 vs 295) — widening
rounds keep re-creating the gap. This script REFUSES (exit 1) unless
every artifact covers exactly the query surface registered at HEAD:

  |SparkEntry.queries| == |CORRECTNESS keys| == DIFF.n_queries
                       == |BENCH queries| and all CORRECTNESS rows pass.

Usage:
  python3 tools/round_gate.py <CORRECTNESS.json> <BENCH.json> [DIFF.json]

The query surface at HEAD is read from a Verify run's oracle_sql.json
when present (exact), else counted from SparkEntry.scala's queries map
(the literal between `def queries` and its closing paren).
"""
import sys, json, re, os


def head_query_names():
    src = open(os.path.join(os.path.dirname(__file__), "..",
                            "src/main/scala/graft/SparkEntry.scala")).read()
    body = src.split("def queries", 1)[1].split("def oracleSql", 1)[0]
    return set(re.findall(r'"(q\d+[a-z0-9_]*)"\s*->', body))


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 2
    names = head_query_names()
    problems = []

    corr = json.load(open(argv[1]))
    corr_keys = set(corr)
    fails = [k for k, v in corr.items()
             if not (isinstance(v, dict)
                     and all(v.get(f) for f in
                             ("rows_match", "schema_match", "hash_match")))]
    if corr_keys != names:
        problems.append(
            f"CORRECTNESS covers {len(corr_keys)} != HEAD {len(names)}: "
            f"missing={sorted(names - corr_keys)[:5]} "
            f"extra={sorted(corr_keys - names)[:5]}")
    if fails:
        problems.append(f"CORRECTNESS failures: {sorted(fails)[:10]}")

    bench = json.load(open(argv[2]))
    bq = set(bench.get("queries", {})) | set(bench.get("failed", {}))
    if bq and bq != names:
        problems.append(
            f"BENCH covers {len(bq)} != HEAD {len(names)}: "
            f"missing={sorted(names - bq)[:5]}")
    if bench.get("failed"):
        problems.append(f"BENCH failed queries: {bench['failed']}")

    if len(argv) > 3:
        diff = json.load(open(argv[3]))
        nd = diff.get("n_queries", len(diff.get("queries", {})))
        if nd != len(names):
            problems.append(f"DIFF n_queries {nd} != HEAD {len(names)}")
        if diff.get("n_errors", 0):
            problems.append(f"DIFF errors: {diff['n_errors']}")
    else:
        problems.append("no DIFF artifact supplied — emit DIFF at this "
                        "HEAD before closing the round")

    if problems:
        print("ROUND GATE: REFUSED")
        for p in problems:
            print(f"  - {p}")
        return 1
    print(f"ROUND GATE: ok — {len(names)} queries covered by "
          f"CORRECTNESS, BENCH and DIFF at HEAD")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
