"""Dump ``.explain("formatted")`` for named queries to files.

Usage:
    python tools/explain_dump.py --out plans/r15 --suffix _before q178 q211 ...

Writes ``<out>/<query>_<suffix>.txt`` with the formatted physical plan —
the optimization-round evidence files (``plans/r15/<q>_before.txt`` /
``_after.txt``).  Plans are captured COLD (fresh DataFrame, no runs), so
checkpoint/persist barriers inside operators appear exactly as a first
execution would compile them.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = "plans/r15"
    suffix = ""
    names: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--out":
            out_dir = argv[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = argv[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1

    from magi_etl_spark.queries import QUERIES
    from magi_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="magi-explain-dump")
    os.makedirs(os.path.join(REPO, out_dir), exist_ok=True)
    for want in names:
        matches = [n for n in QUERIES if n == want or n.startswith(want)]
        if not matches:
            print(f"SKIP {want}: no registered query matches", flush=True)
            continue
        for name in matches:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(REPO, out_dir, f"{name}{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
