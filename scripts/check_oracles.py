#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate.

Usage: python3 scripts/check_oracles.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, and compares: row count, sorted column names, and a hash
of all values with columns sorted by name and rows sorted canonically —
the same shape the driver uses. Floats are rounded to 6 significant-ish
decimals before hashing to absorb engine rounding (the driver rounds too;
our oracle SQL already bakes explicit round() where it matters).
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            # + 0.0 normalizes -0.0 (formats as "-0.000000" otherwise)
            df[c] = df[c].round(6) + 0.0
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/**/*.parquet')"
                        if os.path.isdir(p) else
                        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    names = sorted(only or oracles.keys())
    for name in names:
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"{name}: MISSING spark output"); fails += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle)"); continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}"); fails += 1; continue
        s, o = canon(sdf), canon(odf)
        ok_rows = len(s) == len(o)
        ok_cols = list(s.columns) == list(o.columns)
        ok_hash = ok_rows and ok_cols and h(s) == h(o)
        status = "ok" if ok_hash else "FAIL"
        if not ok_hash:
            fails += 1
            print(f"{name}: {status} rows {len(s)}/{len(o)} cols {list(s.columns)}/{list(o.columns)}")
        else:
            print(f"{name}: {status} ({len(s)} rows)")
    print(f"== {fails} failures / {len(names)} checked")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
