"""Local replica of the driver's correctness gate.

Runs every queries() entry that has an oracle_sql() at a given SF dir, runs
the DuckDB oracle on the same parquet tables, sorts columns by name and rows
by all columns, and compares values exactly — the same criteria the driver
hashes.  Prints one line per query plus first-diff details on mismatch.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # align integer flavors (int32/int64/uint) so dtype noise doesn't
        # mask a value comparison; floats stay float64 for exact compare
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: repr(v))
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from clj_orc_spark.session import get_spark

    spark = get_spark(app_name="check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if name not in oracles or (only and name not in only):
            continue
        sdf = fn(spark, sf).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        schema_ok = sorted(sdf.columns) == sorted(odf.columns)
        rows_ok = len(sdf) == len(odf)
        values_ok = False
        if schema_ok and rows_ok:
            a, b = normalize(sdf), normalize(odf)
            values_ok = a.equals(b)
            if not values_ok:
                neq = (a != b) & ~(a.isna() & b.isna())
                print(f"[FAIL values] {name}")
                for c in a.columns:
                    if neq[c].any():
                        i = int(neq[c].idxmax())
                        print(f"  col={c} row={i}: spark={a[c][i]!r} "
                              f"oracle={b[c][i]!r} "
                              f"(dtypes {a[c].dtype}/{b[c].dtype})")
        else:
            print(f"[FAIL shape] {name}: rows {len(sdf)}/{len(odf)} "
                  f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        ok = schema_ok and rows_ok and values_ok
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name} ({len(sdf)} rows)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
