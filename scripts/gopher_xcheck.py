#!/usr/bin/env python3
"""Cross-engine compare for ta_gopher's line rules on multi-line text.

Consumes the directory staged by graft.queries.GopherLineCrossCheck
(fixture parquet + Spark gopher result + the exact gopherSql the driver
oracle runs), executes the SQL in DuckDB over the SAME fixture, and
asserts row-level equality — EXACT on every column, including the
rounded double ratios (all quotients of integer-derived values; any
difference is an engine-semantics bug, not float noise).

Usage: gopher_xcheck.py STAGED_DIR OUT.json
"""
import sys, json
import duckdb

def main():
    staged, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{staged}/documents.parquet/*.parquet')")
    sql = open(f"{staged}/gopher_sql.txt").read()
    oracle = {r[0]: r for r in con.execute(sql).fetchall()}
    cols = [d[0] for d in con.description]
    spark = {r[0]: r for r in con.execute(
        f"SELECT {', '.join(cols)} FROM read_parquet('{staged}/spark_gopher.parquet/*.parquet')").fetchall()}

    assert set(oracle) == set(spark), \
        f"doc_id sets differ: {set(oracle) ^ set(spark)}"
    docs, mismatches = {}, 0
    for doc_id in sorted(oracle):
        diffs = {c: {"spark": s, "duckdb": o}
                 for c, s, o in zip(cols, spark[doc_id], oracle[doc_id])
                 if s != o}
        docs[str(doc_id)] = {"equal": not diffs, **({"diffs": diffs} if diffs else {})}
        mismatches += bool(diffs)

    # The fixture must actually exercise the rules: both verdicts present,
    # and at least one doc rejected by EACH line rule alone (constructed
    # ids 2/4 = bullets, 3 = ellipsis lines; both engines already agreed).
    passes = {d: r[cols.index("pass")] for d, r in oracle.items()}
    ratios = lambda d, c: oracle[d][cols.index(c)]
    nonvacuous = (
        0 in passes.values() and 1 in passes.values()
        and ratios(2, "bullet_line_ratio") > 0.9
        and ratios(3, "ellipsis_line_ratio") > 0.3
        and ratios(5, "bullet_line_ratio") == 0.9 and passes[5] == 1
        and ratios(6, "ellipsis_line_ratio") == 0.3 and passes[6] == 1)

    result = {"docs": len(docs), "mismatches": mismatches,
              "nonvacuous": nonvacuous, "columns": cols, "perDoc": docs}
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[gopher-xcheck] {len(docs)} docs, {mismatches} mismatches, "
          f"nonvacuous={nonvacuous} -> {out}")
    sys.exit(0 if mismatches == 0 and nonvacuous else 1)

if __name__ == "__main__":
    main()
