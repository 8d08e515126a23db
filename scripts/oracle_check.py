#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (DEV TOOL ONLY — the
library itself is pure Scala/Spark; this script just pre-validates that
each SparkEntry query hash-matches its DuckDB oracle before the driver
does the same at sf0.01).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql).df()
            got = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            w, g = canon(want), canon(got)
            if list(w.columns) != list(g.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != "
                      f"{list(w.columns)}")
                n_bad += 1
                continue
            if len(w) != len(g):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_bad += 1
                continue
            # dtype kinds must agree: the driver hashes rendered values,
            # so an oracle float64 (e.g. DuckDB window-SUM -> HUGEINT ->
            # pandas float) vs Spark int64 hash-mismatches even when the
            # values compare equal below. Fail loudly here.
            kind_bad = [c for c in w.columns
                        if {w[c].dtype.kind, g[c].dtype.kind} == {"i", "f"}]
            if kind_bad:
                for c in kind_bad:
                    print(f"FAIL {name}: dtype mismatch on '{c}' "
                          f"(oracle {w[c].dtype} vs spark {g[c].dtype}) — "
                          f"CAST the mirror (HUGEINT renders as float64)")
                n_bad += 1
                continue
            # exact compare, NaN == NaN; object cols compared as str
            diff_cols = []
            for c in w.columns:
                a, b = w[c], g[c]
                try:
                    eq = (a.eq(b) | (a.isna() & b.isna())).all()
                except Exception:
                    eq = a.astype(str).equals(b.astype(str))
                if not eq:
                    diff_cols.append(c)
            if diff_cols:
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    m = ~(w[c].eq(g[c]) | (w[c].isna() & g[c].isna()))
                    print("  oracle:", w[c][m].head(3).tolist())
                    print("  spark :", g[c][m].head(3).tolist())
                n_bad += 1
            else:
                print(f"OK   {name} ({len(w)} rows)")
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"\n{len(oracle) - n_bad}/{len(oracle)} queries match")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
