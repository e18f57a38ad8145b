"""Run every queries() entry that has NO oracle_sql() — the rows-only
driver queries check_oracles.py skips — and assert each returns ≥0 rows
with a stable schema, mirroring the driver's weaker gate.

Usage: python scripts/smoke_rows_only.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as e
    from clj_orc_spark.session import get_spark

    spark = get_spark(app_name="smoke-rows-only")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if name in oracles:
            continue
        try:
            df = fn(spark, sf)
            rows = df.limit(1000).collect()
            print(f"PASS {name} ({len(rows)}+ rows, "
                  f"{len(df.schema.fields)} cols)")
        except Exception as exc:  # noqa: BLE001 — report, keep going
            failures += 1
            print(f"FAIL {name}: {type(exc).__name__}: {exc}")
    # the driver also smoke-runs entry()
    try:
        n = len(e.entry(spark).limit(10).collect())
        print(f"PASS entry ({n}+ rows)")
    except Exception as exc:  # noqa: BLE001
        failures += 1
        print(f"FAIL entry: {type(exc).__name__}: {exc}")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
