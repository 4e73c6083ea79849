"""Property-based tests for the warehouse-ETL operators: random change
logs / value sequences evaluated by the Spark operators must agree with
straightforward single-threaded Python references."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

log_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),        # key
        st.integers(min_value=0, max_value=20),       # ts
        st.sampled_from(["a", "b", "c", None]),       # attr
    ),
    min_size=1,
    max_size=25,
)


def _ref_scd2(rows):
    """Single-threaded reference: sort per key by (ts, seq), collapse
    consecutive null-safe-equal attrs, emit validity intervals."""
    out = {}
    by_key: dict[int, list] = {}
    for seq, (k, ts, attr) in enumerate(rows):
        by_key.setdefault(k, []).append((ts, seq, attr))
    for k, evs in by_key.items():
        evs.sort()
        versions = []
        for ts, seq, attr in evs:
            if not versions or versions[-1][0] != attr:
                versions.append([attr, ts, None])
        for i in range(len(versions) - 1):
            versions[i][2] = versions[i + 1][1]
        for v, (attr, frm, to) in enumerate(versions, start=1):
            out[(k, v)] = (attr, frm, to)
    return out


@given(rows=log_rows)
@settings(**_SETTINGS)
def test_scd2_intervals_matches_reference(spark, rows):
    from magi_etl_spark.operators.scd2 import scd2_intervals

    df = spark.createDataFrame(
        [(k, ts, i, attr) for i, (k, ts, attr) in enumerate(rows)],
        "k long, ts long, seq long, attr string",
    )
    got = {
        (r.k, r.version): (r.attr, r.valid_from, r.valid_to)
        for r in scd2_intervals(df, ["k"], "attr", "ts", ["seq"]).collect()
    }
    assert got == _ref_scd2(rows)


@given(rows=log_rows)
@settings(**_SETTINGS)
def test_apply_cdc_matches_reference(spark, rows):
    from magi_etl_spark.operators.upsert import apply_cdc

    df = spark.createDataFrame(
        [
            (k, ts, i, "D" if attr is None else "U", attr)
            for i, (k, ts, attr) in enumerate(rows)
        ],
        "k long, ts long, seq long, op string, attr string",
    )
    got = {
        r.k: r.attr
        for r in apply_cdc(
            df, ["k"], "ts", "op", tiebreak_cols=["seq"]
        ).collect()
    }
    latest: dict[int, tuple[tuple[int, int], str | None]] = {}
    for seq, (k, ts, attr) in enumerate(rows):
        if k not in latest or (ts, seq) > latest[k][0]:
            latest[k] = ((ts, seq), attr)
    # None attr was encoded as a delete op: key absent from final state
    expected = {k: a for k, (_, a) in latest.items() if a is not None}
    assert got == expected


@given(
    values=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=1, max_size=60
    ),
    parts=st.integers(min_value=1, max_value=9),
)
@settings(**_SETTINGS)
def test_ranked_prefix_sum_property(spark, values, parts):
    from magi_etl_spark.operators.prefix import ranked_prefix_sum

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v long"
    )
    got = sorted(
        (r.rank, r.id, r.cum, r.total)
        for r in ranked_prefix_sum(
            df,
            [F.col("v").desc(), F.col("id")],
            "v",
            num_partitions=parts,
            include_total=True,
        ).collect()
    )
    order = sorted(range(len(values)), key=lambda i: (-values[i], i))
    cum = 0
    expected = []
    for rank, i in enumerate(order, start=1):
        cum += values[i]
        expected.append((rank, i, cum, sum(values)))
    assert got == expected
