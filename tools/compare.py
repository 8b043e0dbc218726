#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result, run the
matching oracle SQL (from oracle_sql.json) in DuckDB with the sfDir tables
registered as views, sort columns by name + rows, and compare cell values
(exact for non-floats, tiny-epsilon report for floats so we can see how close
hash-equality would be).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = n_noracle = 0
    missing = sorted(set(oracle) - set(names))
    for name in missing:
        n_fail += 1
        print(f"{name:28s} MISSING (query crashed in Verify?)")
    for name in names:
        spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            n_noracle += 1
            print(f"{name:28s} NO-ORACLE rows={len(spark_df)}")
            continue
        try:
            ora_df = con.sql(oracle[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"{name:28s} ORACLE-SQL-ERROR {e}")
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = ora_df[sorted(ora_df.columns)]
        if list(s.columns) != list(o.columns):
            n_fail += 1
            print(f"{name:28s} SCHEMA-MISMATCH spark={list(s.columns)} oracle={list(o.columns)}")
            continue
        if len(s) != len(o):
            n_fail += 1
            print(f"{name:28s} ROWS-MISMATCH spark={len(s)} oracle={len(o)}")
            continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        # The driver hashes stringified cells, so an int64-vs-float64 dtype
        # drift (e.g. DuckDB HUGEINT -> pandas float64 when the oracle forgets
        # CAST(... AS BIGINT)) hashes "742.0" vs "742" even though the values
        # coerce equal below. Treat numeric-kind drift as a failure to match
        # the driver's behavior (this is exactly what made tpch_q12 and
        # a15_cond_aggs driver-red in round 5).
        kind_drift = [
            (c, str(s[c].dtype), str(o[c].dtype)) for c in s.columns
            if {s[c].dtype.kind, o[c].dtype.kind} == {"i", "f"}]
        if kind_drift:
            n_fail += 1
            print(f"{name:28s} DTYPE-DRIFT {kind_drift}")
            continue
        bad = []
        for c in s.columns:
            sv, ov = s[c], o[c]
            for i in range(len(sv)):
                a, b = sv.iloc[i], ov.iloc[i]
                an = a is None or (isinstance(a, float) and math.isnan(a))
                bn = b is None or (isinstance(b, float) and math.isnan(b))
                if an and bn:
                    continue
                if an != bn:
                    bad.append((c, i, a, b, "null-mismatch"))
                elif isinstance(a, float) or isinstance(b, float):
                    if float(a) != float(b):
                        d = abs(float(a) - float(b))
                        bad.append((c, i, a, b, f"diff={d:.3e}"))
                elif a != b:
                    bad.append((c, i, a, b, "neq"))
                if len(bad) > 5:
                    break
            if len(bad) > 5:
                break
        if bad:
            n_fail += 1
            print(f"{name:28s} VALUE-MISMATCH rows={len(s)} first={bad[:3]}")
        else:
            n_pass += 1
            print(f"{name:28s} PASS rows={len(s)}")
    print(f"\npass={n_pass} fail={n_fail} no-oracle={n_noracle}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
