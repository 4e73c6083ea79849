"""Full-registry DuckDB parity sweep at an arbitrary scale factor.

The driver gate compares at sf0.01 and the local suite at sf0.001; this
tool runs the SAME comparison at any catalog (default sf0.1) over the
registered queries, the staged registries, or both.  Round-8 lesson: a
summation-order last-ulp in q146's double ``AVG`` rounded differently
only at sf0.1 — green at both smaller scales — so scale-divergent float
arithmetic is a real class, and one cheap sweep per round catches it
before a driver ever could.

Usage:
    python tools/parity_sweep.py [--sf-dir DIR] [--scope registered|staged|all]
                                 [--only qA,qB,...]

``--only`` restricts the sweep to a comma-separated list of query names
(substring prefix match on the qNN id) — the optimization-round loop
re-verifies each touched query at every scale factor without paying for
the full registry.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _staged() -> dict[str, tuple]:
    out: dict[str, tuple] = {}
    from magi_etl_spark.queries import QUERIES

    for mod, q, o in [
        ("magi_etl_spark.queries.extensions_r6", "EXT3_QUERIES", "EXT3_ORACLE"),
        ("magi_etl_spark.queries.extensions_r7", "EXT4_QUERIES", "EXT4_ORACLE"),
        ("magi_etl_spark.queries.extensions_r8", "EXT5_QUERIES", "EXT5_ORACLE"),
        ("magi_etl_spark.queries.extensions_r9", "EXT6_QUERIES", "EXT6_ORACLE"),
        ("magi_etl_spark.queries.extensions_r10", "EXT7_QUERIES", "EXT7_ORACLE"),
        ("magi_etl_spark.queries.extensions_r11", "EXT8_QUERIES", "EXT8_ORACLE"),
        ("magi_etl_spark.queries.extensions_r12", "EXT9_QUERIES", "EXT9_ORACLE"),
        ("magi_etl_spark.queries.extensions_r13", "EXT10_QUERIES", "EXT10_ORACLE"),
        ("magi_etl_spark.queries.extensions_r14", "EXT11_QUERIES", "EXT11_ORACLE"),
        ("magi_etl_spark.queries.extensions_r15", "EXT12_QUERIES", "EXT12_ORACLE"),
    ]:
        try:
            m = __import__(mod, fromlist=[q, o])
        except ImportError:
            continue
        for name, fn in getattr(m, q).items():
            if name not in QUERIES:
                out[name] = (fn, getattr(m, o)[name])
    return out


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    scope = "all"
    only: list[str] | None = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--sf-dir":
            sf_dir = argv[i + 1]
        elif a == "--scope":
            scope = argv[i + 1]
        elif a == "--only":
            only = [s.strip() for s in argv[i + 1].split(",") if s.strip()]

    from oracle_harness import compare, duckdb_connection

    from magi_etl_spark.queries import ORACLE, QUERIES
    from magi_etl_spark.session import get_spark

    todo: dict[str, tuple] = {}
    if scope in ("registered", "all"):
        todo.update({n: (QUERIES[n], ORACLE.get(n)) for n in QUERIES})
    if scope in ("staged", "all"):
        todo.update(_staged())
    if only:
        todo = {
            n: v
            for n, v in todo.items()
            if any(n == o or n.startswith(o) for o in only)
        }

    spark = get_spark(app_name="magi-parity-sweep")
    con = duckdb_connection(sf_dir)
    fails: list[str] = []
    t0 = time.time()
    for name, (fn, sql) in sorted(todo.items()):
        try:
            if sql is None:
                ok, msg = fn(spark, sf_dir).count() >= 0, "rows-only"
            else:
                ok, msg = compare(fn(spark, sf_dir), con, sql)
        except Exception as e:  # noqa: BLE001 — a sweep reports, never aborts
            ok, msg = False, f"err: {e}"
        if not ok:
            fails.append(name)
            print(f"FAIL {name} {msg[:400]}", flush=True)
    print(
        f"DONE scope={scope} sf_dir={sf_dir}: {len(todo)} queries, "
        f"{len(fails)} failures, {time.time() - t0:.0f}s"
    )
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
