"""Two-point (8x/32x) probe WITH OUTPUT-PAIR ACCOUNTING for the
operator families that are deliberately quadratic under wholesale
replication (every copy is an exact duplicate of its siblings, so the
QUALIFYING PAIR SET itself grows ~n^2 per duplicate family):

- ``winnow_pairs``  — q193/q194 winnowing fingerprints -> shared-
  fingerprint candidate pairs (operators/winnow.py)
- ``simjoin``       — q195 exact set-similarity join at J >= 1/2
  (operators/setjoin.py, prefix-filtered)

The plain N-vs-1 runtime ratio is meaningless for these (the correct
answer is n^2 bigger than the input growth); the honest metric is
runtime normalized by OUTPUT PAIRS PRODUCED, which should stay flat or
fall as the per-pair fixed costs amortize.  The r8 verdict (item 6)
asked for the 32x point with the same accounting the 8x run already
carried, closing these families to the kcore/labelprop two-point
standard.

Usage: python tools/pair_probe.py [n1 n2 ...]   (default: 1 8 32)
Writes one JSON line:
{"probe": "pair_accounting", "points": {"1": {...}, "8": {...}, ...}}
where each point records per-family wall seconds and output pair count.
"""

from __future__ import annotations

import json
import os
import sys
import time
from fractions import Fraction

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from magi_etl_spark.session import get_spark  # noqa: E402
from magi_etl_spark.tables import load_table  # noqa: E402
from tools.scale_probe import replicate  # noqa: E402


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 8, 32]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="magi-pair-probe")
    docs1 = load_table(spark, sf, "documents")

    from magi_etl_spark.operators.setjoin import shingle_sets, similarity_join
    from magi_etl_spark.operators.winnow import (
        fingerprint_pairs,
        winnow_fingerprints,
    )

    points: dict[str, dict] = {}
    for n in ns:
        docs = (
            docs1 if n == 1 else replicate(docs1, ["doc_id"], n, 10_000_000)
        ).persist()
        n_docs = docs.count()  # also materializes the persist
        pt: dict[str, float | int] = {"n_docs": n_docs}
        for label, build in (
            ("winnow_pairs", lambda d=docs: fingerprint_pairs(
                winnow_fingerprints(d))),
            ("simjoin", lambda d=docs: similarity_join(
                shingle_sets(d), Fraction(1, 2))),
        ):
            # ONE timed count() pass: for these families the wall is the
            # pair join itself, and a count materializes every pair
            # through the full verification path — a second noop pass
            # would double a multi-ten-minute 32x job for no evidence
            t0 = time.perf_counter()
            pairs = build().count()
            wall = round(time.perf_counter() - t0, 3)
            pt[f"{label}_sec"] = wall
            pt[f"{label}_pairs"] = pairs
            us_per_pair = 1e6 * wall / max(pairs, 1)
            pt[f"{label}_us_per_pair"] = round(us_per_pair, 3)
            print(
                f"# x{n} {label}: {wall:.3f}s, {pairs} pairs, "
                f"{us_per_pair:.1f} us/pair (load {os.getloadavg()[0]:.2f})",
                file=sys.stderr,
            )
        points[str(n)] = pt
        docs.unpersist()
    print(json.dumps({"probe": "pair_accounting", "sf": sf, "points": points}))


if __name__ == "__main__":
    main()
