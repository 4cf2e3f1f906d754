#!/usr/bin/env python3
"""Dev-side oracle parity checker (mirrors the driver's DuckDB compare).

Usage: python3 tools/check_parity.py /root/testdata/sf0.01 /tmp/verify_out

For each query dumped by graft.Verify, re-runs the oracle SQL in DuckDB
against the same parquet tables and compares (rows, schema-insensitive
column-name-sorted values) as multisets with exact equality.
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        exp = con.sql(oracle[name]).fetchdf()
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: schema {gcols} vs {ecols}"); n_fail += 1; continue
        g = got[gcols]; e = exp[ecols]
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        gs = sorted(map(repr, g.itertuples(index=False, name=None)))
        es = sorted(map(repr, e.itertuples(index=False, name=None)))
        if gs != es:
            bad = [(a, b) for a, b in zip(gs, es) if a != b][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}"); n_fail += 1; continue
        print(f"  PASS {name}: {len(g)} rows"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return n_fail

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
