#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same sf tables, loads the Spark parquet result written by graft.Verify,
and compares row count, column names, and values (columns sorted by
name, rows sorted by all columns). Dev tooling only — the shipped
library is pure Scala/Spark.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, struct, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:200]}")
            n_fail += 1
            continue
        try:
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:120]}")
            n_fail += 1
            continue
        errs = []
        if sorted(exp.columns) != sorted(got.columns):
            errs.append(f"cols exp={sorted(exp.columns)} got={sorted(got.columns)}")
        elif len(exp) != len(got):
            errs.append(f"rows exp={len(exp)} got={len(got)}")
        else:
            cols = sorted(exp.columns)
            e = exp[cols].sort_values(cols).reset_index(drop=True)
            g = got[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                ev, gv = e[c], g[c]
                if str(ev.dtype) != str(gv.dtype):
                    errs.append(f"dtype[{c}] exp={ev.dtype} got={gv.dtype}")
                mismatch = 0
                first = None
                for i in range(len(ev)):
                    a, b = ev.iloc[i], gv.iloc[i]
                    if a is None or (isinstance(a, float) and math.isnan(a)):
                        ok = b is None or (isinstance(b, float) and math.isnan(b))
                    elif isinstance(a, float):
                        # Bit-exact: the driver hashes values, so -0.0
                        # vs +0.0 (== under IEEE) is a REAL mismatch —
                        # it hid the r2-r4 e1_features jerk_s drift.
                        ok = isinstance(b, float) and (
                            struct.pack("<d", a) == struct.pack("<d", b))
                    else:
                        ok = a == b
                    if not ok:
                        mismatch += 1
                        if first is None:
                            first = (i, a, b)
                if mismatch:
                    errs.append(f"val[{c}] {mismatch}/{len(ev)} first@{first}")
        if errs:
            print(f"FAIL {name}: " + "; ".join(errs[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
