#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: check_correctness.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: load the Spark parquet result,
run the oracle SQL in DuckDB over the sfDir tables, sort columns by name and rows
by value, and compare cell-by-cell (exact).

As of round 5 EVERY query has a full oracle: q27/q29/q35 via md5/modular-
polynomial hashes, q28 via md5-derived +/-1 planes over 2^20-quantized
components (integer dots — no float accumulation order), and q33 via an
integer-exact k-means (floor-quantized points, truncated-integer-mean
centroids) whose five Lloyd iterations replay as unrolled SQL CTEs. The
INVARIANTS mechanism below remains for future non-oracle-able queries.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# name -> [(label, sql)]; sql sees the dump as `spark` + the base tables, and
# must return one row with a boolean `ok` (extra columns are printed as detail).
INVARIANTS: dict = {}
# (empty since round 5: every query now carries a full oracle. The mechanism
# stays for future queries whose exact output cannot be reproduced in SQL —
# entries are "name" -> [(label, sql)] where sql sees the dump as view `spark`
# plus the base tables and returns one row with boolean `ok`.)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = canon(duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            n_fail += 1
            continue
        status = []
        if list(spark_df.columns) != list(duck_df.columns):
            status.append(f"columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            status.append(f"rows {len(spark_df)} vs {len(duck_df)}")
        else:
            # dtype-tolerant exact value compare
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                try:
                    eq = (a == b) | (a.isna() & b.isna())
                except Exception:
                    eq = a.astype(str) == b.astype(str)
                if not eq.all():
                    bad = (~eq).idxmax()
                    status.append(f"col {c} row {bad}: {a[bad]!r} vs {b[bad]!r}")
                    break
                if str(a.dtype) != str(b.dtype):
                    status.append(f"dtype {c}: {a.dtype} vs {b.dtype} (values equal)")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    # no-oracle queries: run semantic invariants over the dump + base tables
    for name, checks in sorted(INVARIANTS.items()):
        if name in oracle:
            continue
        try:
            con.sql(f"CREATE OR REPLACE VIEW spark AS SELECT * FROM '{out_dir}/{name}/*.parquet'")
            n_rows = con.sql("SELECT count(*) FROM spark").fetchone()[0]
        except Exception as e:
            print(f"FAIL {name}: dump load error: {e}")
            n_fail += 1
            continue
        for label, sql in checks:
            try:
                row = con.sql(sql).df().iloc[0]
            except Exception as e:
                print(f"FAIL {name} [invariant: {label}]: exec error: {e}")
                n_fail += 1
                continue
            detail = ", ".join(f"{k}={row[k]}" for k in row.index if k != "ok")
            suffix = f" ({detail})" if detail else ""
            if bool(row["ok"]):
                print(f"PASS {name} [invariant: {label}]{suffix}")
                n_pass += 1
            else:
                print(f"FAIL {name} [invariant: {label}]{suffix}")
                n_fail += 1
        print(f"INFO {name}: {n_rows} rows, {len(checks)} invariants checked")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
