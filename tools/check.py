#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracles and diff. Dev tool only — not part of the
library. Usage: python3 tools/check.py <outDir> <sfDir> [query ...]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)."""
import sys, os, json, math
import duckdb

def canon(rows):
    out = []
    for r in rows:
        out.append(tuple(repr(v) for v in r))
    return sorted(out)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
                "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        got_rel = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        if name not in oracles:
            n = got_rel.fetchall()
            print(f"ROWS-ONLY {name}: rows={len(n)}")
            n_skip += 1
            continue
        try:
            exp_rel = con.sql(oracles[name])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got_cols = sorted(got_rel.columns)
        exp_cols = sorted(exp_rel.columns)
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns differ got={got_cols} exp={exp_cols}")
            n_fail += 1
            continue
        got = canon(con.sql(
            f"SELECT {', '.join(got_cols)} FROM got_rel").fetchall())
        exp = canon(con.sql(
            f"SELECT {', '.join(exp_cols)} FROM exp_rel").fetchall())
        if got == exp:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows got={len(got)} exp={len(exp)}")
            diff_g = [r for r in got if r not in set(exp)][:3]
            diff_e = [r for r in exp if r not in set(got)][:3]
            for r in diff_g:
                print(f"  got-only: {r}")
            for r in diff_e:
                print(f"  exp-only: {r}")
    print(f"== pass={n_pass} fail={n_fail} rows_only={n_skip}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
