#!/usr/bin/env python3
"""Sweep every oracle for silent DuckDB type promotions.

The driver hashes STRINGIFIED values, so a dtype divergence between the
Spark result and the DuckDB oracle (e.g. integer sum() -> HUGEINT ->
pandas float64 rendering "6.0" vs Spark int64 "6") is a hash mismatch
even when the values are numerically identical. This script catches the
class statically-ish: it maps each query's Spark output types (from
Verify's schema.json) to the pandas dtype KIND they parquet-load as, runs
each oracle SQL through DuckDB's .df(), and reports every column whose
kinds disagree. Exit 0 = zero mismatches.

Usage: python3 tools/dtype_sweep.py [sf_dir] [verify_out_dir]
Driver-side tooling only — not part of the Scala library.
"""
import duckdb, json, sys, os

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def spark_kind(t):
    """Spark catalogString -> pandas dtype.kind it loads back as."""
    t = t.lower()
    if t.startswith(("array", "map", "struct")) or t in ("string", "binary"):
        return "O"
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "i"
    if t in ("float", "double") or t.startswith("decimal"):
        return "f"
    if t == "boolean":
        return "b"
    if t in ("date", "timestamp", "timestamp_ntz"):
        return "M"
    return "?"

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    schemas = json.load(open(f"{out}/schema.json"))
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    mismatches = 0
    checked = 0
    for name, cols in sorted(schemas.items()):
        if name not in oracle:
            continue  # rows-only query, no oracle to diverge from
        try:
            duck = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            mismatches += 1
            continue
        duck_kinds = {c: duck[c].dtype.kind for c in duck.columns}
        for c, t in cols.items():
            checked += 1
            sk, dk = spark_kind(t), duck_kinds.get(c)
            if dk is None:
                print(f"[FAIL] {name}.{c}: missing from oracle result "
                      f"(oracle cols: {sorted(duck_kinds)})")
                mismatches += 1
            elif sk != dk:
                print(f"[FAIL] {name}.{c}: spark {t} (kind {sk}) vs "
                      f"oracle pandas {duck[c].dtype} (kind {dk})")
                mismatches += 1
    print(f"\n{checked} columns checked, {mismatches} dtype mismatches")
    sys.exit(1 if mismatches else 0)

if __name__ == "__main__":
    main()
