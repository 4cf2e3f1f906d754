#!/usr/bin/env python3
"""Catalog value-domain audit (SURVEY §6 contract).

Catalog outputs may only use column types the driver's cross-engine
compare has PROVEN portable across Spark/parquet/pandas/DuckDB:

  int32 / int64, double (float64), string, bool,
  naive timestamp[us] / date32 (pass-through of source columns),
  decimal(18,2) (the fixed-point money domain).

Anything else — wide decimals (the round-8 q_table_checksum lesson:
DECIMAL(38,0) near 2^83 canonicalizes differently across compare
harnesses), float32, binary, nested list/struct/map, tz-aware
timestamps — is a finding: rows/schema can match while the value hash
diverges, or worse, diverges only in someone else's harness.

Usage: python3 tools/check_value_domain.py <verify_out_dir>
Exit 0 iff every column of every dumped query is in-domain.
"""
import glob
import os
import sys

import pyarrow.parquet as pq

ALLOWED = {"int32", "int64", "double", "string", "bool",
           "timestamp[us]", "date32[day]", "decimal128(18, 2)"}


def main(out_dir: str) -> int:
    bad = []
    n_cols = 0
    dirs = [d for d in sorted(glob.glob(os.path.join(out_dir, "*")))
            if os.path.isdir(d)]
    if not dirs:
        print(f"no query dumps under {out_dir}", file=sys.stderr)
        return 2
    for d in dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            bad.append((os.path.basename(d), "<no parquet written>", ""))
            continue
        for field in pq.read_schema(files[0]):
            n_cols += 1
            if str(field.type) not in ALLOWED:
                bad.append((os.path.basename(d), field.name, str(field.type)))
    for q, c, t in bad:
        print(f"OUT-OF-DOMAIN {q}.{c}: {t}")
    print(f"== {len(dirs)} queries, {n_cols} columns, "
          f"{len(bad)} out-of-domain")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
