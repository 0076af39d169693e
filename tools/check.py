#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet, run each oracle SQL in DuckDB over the same sf dir, compare
(column-name-sorted, row-sorted, exact values). Driver-side tooling only —
not part of the Scala library."""
import duckdb, json, sys, os
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    results = sorted(d for d in os.listdir(out) if os.path.isdir(f"{out}/{d}"))
    fails = 0
    for dirname in results:
        name = dirname[:-8] if dirname.endswith(".parquet") else dirname
        spark_df = pd.read_parquet(f"{out}/{dirname}")
        if name not in oracle:
            print(f"[rows-only] {name}: rows={len(spark_df)} " +
                  ("OK" if len(spark_df) > 0 else "EMPTY!"))
            fails += 0 if len(spark_df) > 0 else 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            fails += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"[FAIL] {name}: columns {list(s.columns)} vs {list(d.columns)}")
            fails += 1
            continue
        if len(s) != len(d):
            print(f"[FAIL] {name}: rows {len(s)} vs {len(d)}")
            fails += 1
            continue
        # exact compare; the driver hashes stringified values, so a dtype
        # disagreement (e.g. DuckDB HUGEINT -> float64 vs Spark int64
        # stringifying "6.0" vs "6") is a FAILURE, not something to coerce
        mismatch = None
        for c in s.columns:
            sv, dv = s[c], d[c]
            try:
                if sv.dtype.kind != dv.dtype.kind:
                    mismatch = f"{c} (dtype {sv.dtype} vs {dv.dtype})"; break
                if sv.dtype.kind == 'f':
                    import numpy as np
                    if not np.allclose(sv.astype(float), dv.astype(float),
                                       rtol=0, atol=0, equal_nan=True):
                        mismatch = c; break
                else:
                    if not (sv.astype(str).values == dv.astype(str).values).all():
                        mismatch = c; break
            except Exception as e:
                mismatch = f"{c} ({e})"; break
        if mismatch:
            print(f"[FAIL] {name}: column {mismatch} differs")
            bad = s[c][~(s[c].astype(str).values == d[c].astype(str).values)] if not isinstance(mismatch, str) or '(' not in str(mismatch) else None
            idx = (s[c].astype(str).values != d[c].astype(str).values)
            print("  spark:", s[idx].head(3).to_dict('records'))
            print("  duck :", d[idx].head(3).to_dict('records'))
            fails += 1
        else:
            print(f"[ok] {name}: {len(s)} rows match")
    print(f"\n{len(results)-fails}/{len(results)} pass")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
