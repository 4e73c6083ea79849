"""A/B probe for the r14 eager-localCheckpoint replan (r14 VERDICT
"What's wrong" #1): the four queries whose plans intentionally changed
(q139 funnel, q195 similarity_join, q210 common_runs, q215
weighted_jaccard) regressed in the committed idle-artifact comparison,
but the in-session "before" walls were taken on a loaded host, so the
claimed improvements were not like-for-like.  This tool settles it:

- ARM A = the shape as committed (eager localCheckpoint).
- ARM B = the pre-r14 shape, reproduced exactly by patching
  ``DataFrame.localCheckpoint`` to identity for the rep (the r14 edits
  ONLY added checkpoint calls; removing them restores the old plan).
- Reps interleaved ABAB... in ONE session so JVM warmup, parquet
  footer caches, and host drift hit both arms equally; per-rep 1-min
  load is recorded so a loaded rep is visible in the artifact.

Usage: python tools/ab_probe.py [reps_per_arm]   (default 3)
Writes one JSON line per query:
{"query": ..., "a_walls": [...], "b_walls": [...], "a_best": s,
 "b_best": s, "ratio_best": a/b, "loads": [...]}
and a trailing summary line.  ratio_best > 1 means the checkpointed
shape is SLOWER at this sf on this host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "q139_funnel",
    "q195_similarity_join",
    "q210_common_runs",
    "q215_weighted_jaccard",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import DataFrame

    from magi_etl_spark.queries import QUERIES as REG
    from magi_etl_spark.session import get_spark

    spark = get_spark(app_name="magi-ab-probe")
    real_ckpt = DataFrame.localCheckpoint

    def run(name: str, patched: bool) -> float:
        if patched:
            DataFrame.localCheckpoint = (  # type: ignore[method-assign]
                lambda self, eager=True: self
            )
        try:
            t0 = time.monotonic()
            REG[name](spark, sf).collect()
            return time.monotonic() - t0
        finally:
            DataFrame.localCheckpoint = real_ckpt  # type: ignore[method-assign]

    results = []
    for name in QUERIES:
        run(name, patched=False)  # warmup rep, discarded
        a_walls, b_walls, loads = [], [], []
        for _ in range(reps):
            loads.append(round(os.getloadavg()[0], 2))
            a_walls.append(round(run(name, patched=False), 3))
            loads.append(round(os.getloadavg()[0], 2))
            b_walls.append(round(run(name, patched=True), 3))
        row = {
            "query": name,
            "a_walls_checkpointed": a_walls,
            "b_walls_plain": b_walls,
            "a_best": min(a_walls),
            "b_best": min(b_walls),
            "ratio_best": round(min(a_walls) / min(b_walls), 3),
            "loads_1min": loads,
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(
        json.dumps(
            {
                "probe": "ab_checkpoint",
                "sf_dir": sf,
                "reps_per_arm": reps,
                "summary": {
                    r["query"]: r["ratio_best"] for r in results
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
