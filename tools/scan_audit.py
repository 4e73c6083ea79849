"""Compiled-plan scan audit: flag queries whose physical plan re-derives
the same input many times (the q256-friedman / setjoin / q139-funnel
defect class: a lazy frame referenced by N downstream frames compiles
to N copies of its subtree, re-scanning the corpus per reference —
invisible at sf0.1 walls, a real multiplier at 100 TB).

Usage:
    python tools/scan_audit.py [--sf-dir DIR] [--top N] [--threshold K]

Prints one line per query sorted by parquet-scan count descending, and
exits non-zero if any query exceeds ``--threshold`` scans (default: no
gate, report only).  AQE's runtime ReusedExchange recovers SOME of the
duplication (measured: 10 of 20 scans on the pre-fix q256), so the
compiled count is an upper bound — treat entries above ~8 as audit
candidates, not automatic defects: per-candidate column profiles
(q181's catalog report) and genuinely-different-table scans are
by-design.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.001"
    top = 40
    threshold = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--sf-dir":
            sf_dir = argv[i + 1]
        elif a == "--top":
            top = int(argv[i + 1])
        elif a == "--threshold":
            threshold = int(argv[i + 1])

    from magi_etl_spark.queries import QUERIES
    from magi_etl_spark.session import get_spark

    spark = get_spark(app_name="magi-scan-audit")
    rows = []
    for name, fn in QUERIES.items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # report, keep auditing
            print(f"ERR {name}: {e}", file=sys.stderr)
            continue
        rows.append(
            (plan.count("Scan parquet"), plan.count("Exchange"), name)
        )
    rows.sort(reverse=True)
    for scans, exchanges, name in rows[:top]:
        print(f"{scans:3d} scans {exchanges:3d} exchanges  {name}")
    if threshold is not None:
        over = [n for s, _, n in rows if s > threshold]
        if over:
            print(f"OVER THRESHOLD ({threshold}): {over}", file=sys.stderr)
            sys.exit(1)
    spark.stop()


if __name__ == "__main__":
    main()
