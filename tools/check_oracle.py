#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB differential check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query output parquet under <verifyOutDir>/<name>/, runs the
matching oracle SQL from oracle_sql.json against the raw testdata tables
and compares: row count, column names (sorted), and a hash of all values
(rows sorted, columns sorted by name).
"""
import sys, json, glob, os
import duckdb

def canon(con, rel_sql, label):
    df = con.execute(rel_sql).fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    # canonical rows: sort by all columns (stringified for stability)
    recs = [tuple(repr(v) for v in row) for row in df.itertuples(index=False)]
    recs.sort()
    import hashlib
    h = hashlib.md5(repr(recs).encode()).hexdigest()
    return cols, len(recs), h, recs

def main(sf_dir, out_dir):
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            # read ALL part files — a >1-partition output must not lose rows
            scols, sn, sh, srecs = canon(con, f"SELECT * FROM '{res_dir}/*.parquet'", "spark")
            ocols, on, oh, orecs = canon(con, oracles[name], "oracle")
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}"); n_fail += 1; continue
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}"); n_fail += 1
        elif sn != on:
            print(f"FAIL {name}: rows spark={sn} oracle={on}"); n_fail += 1
        elif sh != oh:
            diffs = [(a, b) for a, b in zip(srecs, orecs) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs: {diffs}"); n_fail += 1
        else:
            print(f"PASS {name} ({sn} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
