"""Local replica of the driver's correctness gate: run every
queries()[name] on Spark and oracle_sql()[name] on DuckDB at the given
sf dir; compare row-count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize: floats rounded, everything to str, rows sorted
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import oracle_sql, queries
    from rxtls_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"  {name}: rows-only ({len(sdf)} rows)")
            if len(sdf) == 0:
                failures.append((name, "0 rows"))
            continue
        odf = con.execute(oracles[name]).fetchdf()
        s, o = normalize_frame(sdf), normalize_frame(odf)
        status = []
        if list(s.columns) != list(o.columns):
            status.append(f"cols {list(s.columns)} != {list(o.columns)}")
        elif len(s) != len(o):
            status.append(f"rowcount {len(s)} != {len(o)}")
        elif not s.equals(o):
            diff = (s != o).any(axis=1)
            status.append(
                f"values differ in {int(diff.sum())} rows; first:\n"
                f"spark: {s[diff].head(3).to_dict('records')}\n"
                f"duck:  {o[diff].head(3).to_dict('records')}"
            )
        if status:
            failures.append((name, "; ".join(status)))
            print(f"  {name}: MISMATCH — {status[0][:400]}")
        else:
            print(f"  {name}: OK ({len(s)} rows)")

    print(f"\n{len(failures)} failures")
    for n, msg in failures:
        print(f"FAIL {n}: {msg[:500]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
