"""Registry-order invariants for the external correctness gate.

The driver oracle-checks only the FIRST ``GATE_WINDOW`` registered
queries, so ordering mistakes silently un-verify operators (round 2
shipped 26 queries the gate never saw).  This encodes the rotation rule
from COVERAGE.md as a test: any query with no green driver row in ANY
recorded round must sit inside the window."""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_verified() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rows = json.load(open(path))
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only checks
                and not row.get("err")
            ):
                seen.add(name)
    return seen


def test_never_verified_queries_are_inside_the_gate_window():
    from magi_etl_spark.queries import GATE_WINDOW, QUERIES

    names = list(QUERIES)
    window = set(names[:GATE_WINDOW])
    verified = _driver_verified()
    never = [n for n in names if n not in verified]
    outside = [n for n in never if n not in window]
    assert not outside, (
        f"queries with no driver row in any recorded round are outside "
        f"the first-{GATE_WINDOW} gate window: {outside}"
    )


def test_every_query_has_an_oracle_or_is_documented_rows_only():
    from magi_etl_spark.queries import ORACLE, QUERIES

    missing = [n for n in QUERIES if n not in ORACLE]
    # rows-only checks are allowed but must stay a deliberate, short list
    assert len(missing) <= 3, f"queries without a DuckDB oracle: {missing}"
