"""Quick staging loop for the r7 wave: run every EXT4 entry against its
DuckDB oracle (driver-compare semantics) and the plan linter.

    PYTHONPATH=.:tests python tools/stage_check_r7.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path[:0] = [".", "tests"]

from magi_etl_spark.session import get_spark  # noqa: E402
from oracle_harness import compare, duckdb_connection  # noqa: E402


def main() -> int:
    from magi_etl_spark.plans import lint
    from magi_etl_spark.queries.extensions_r7 import (
        EXT4_ORACLE,
        EXT4_QUERIES,
    )

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="stage-check-r7")
    con = duckdb_connection(sf)
    failures = 0
    for name, fn in EXT4_QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            errs = [f for f in lint(df) if f.severity == "error"]
            if errs:
                print(f"LINT {name} {[f.rule for f in errs]}")
                failures += 1
            oracle = EXT4_ORACLE.get(name)
            if oracle is None:
                print(f"ROWS {name} {df.count()} rows (no oracle)")
                continue
            ok, msg = compare(df, con, oracle)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        print(("PASS" if ok else "FAIL"), name, msg[:400])
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
