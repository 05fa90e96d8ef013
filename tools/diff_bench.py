#!/usr/bin/env python3
"""Per-query Spark-vs-DuckDB differential timing artifact (DIFF_rN.json).

Makes the suite-ratio audit reproducible instead of re-measured each
round: pairs the per-query Spark seconds from a graft.Bench run with
fresh DuckDB timings of the SAME oracle SQL on the SAME tables.

Usage:
  python3 tools/diff_bench.py <sfDir> <oracle_sql.json> <bench.json> <out.json>

  sfDir            testdata dir the bench ran against (e.g. /root/testdata/sf0.1)
  oracle_sql.json  written by graft.Verify (name -> DuckDB SQL)
  bench.json       graft.Bench output line (has "queries": {name: sec})
  out.json         DIFF artifact to write

DuckDB timing is best-of-2 per query at threads=32 (first run pays the
buffer-pool warm-up; the minimum is the capability number, matching
Bench's best-of-3 policy).
"""
import sys, json, os, time
import duckdb


def main(sf_dir, oracle_path, bench_path, out_path):
    oracles = json.load(open(oracle_path))
    bench = json.load(open(bench_path))
    spark_times = bench.get("queries", {})
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    queries = {}
    duck_total = spark_total = 0.0
    n_err = 0
    for name in sorted(oracles):
        best = None
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(oracles[name]).fetchall()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            except Exception as e:
                queries[name] = {"error": str(e).splitlines()[0]}
                n_err += 1
                best = None
                break
        if best is None:
            continue
        s = spark_times.get(name)
        row = {"spark_s": s, "duckdb_s": round(best, 4)}
        if s is not None and best > 0:
            row["ratio"] = round(s / best, 3)
            spark_total += s
            duck_total += best
        queries[name] = row
    out = {
        "sf": bench.get("sf"),
        "n_queries": len(queries),
        "n_errors": n_err,
        "spark_total_s": round(spark_total, 2),
        "duckdb_total_s": round(duck_total, 2),
        "aggregate_ratio": round(spark_total / duck_total, 3) if duck_total else None,
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: {len(queries)} queries, "
          f"aggregate ratio {out['aggregate_ratio']}")


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:5]))
