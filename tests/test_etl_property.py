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


# --- r4 extension operators ------------------------------------------------

split_specs = st.lists(
    st.tuples(st.text("abc", min_size=1, max_size=3), st.integers(1, 10)),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)


@given(specs=split_specs, n=st.integers(10, 60))
@settings(**_SETTINGS)
def test_split_assign_is_disjoint_exhaustive_and_stable(spark, specs, n):
    from magi_etl_spark.operators.mixing import split_assign

    total = sum(w for _, w in specs)
    splits = {name: w / total for name, w in specs}
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    a = {r["k"]: r["split"] for r in split_assign(df, "k", splits).collect()}
    b = {r["k"]: r["split"] for r in split_assign(df, "k", splits).collect()}
    assert a == b                       # pure function of (seed, key)
    assert set(a) == set(range(n))      # exhaustive: every row labeled
    assert set(a.values()) <= set(splits)  # only declared labels


@given(
    counts=st.dictionaries(
        st.text("xyz", min_size=1, max_size=3),
        st.integers(1, 100_000),
        min_size=1,
        max_size=6,
    ),
    alpha=st.floats(0.0, 1.5, allow_nan=False),
    target=st.integers(1, 1_000_000),
)
@settings(**_SETTINGS)
def test_temperature_weights_invariants(counts, alpha, target):
    from magi_etl_spark.operators.sampling import temperature_weights

    w = temperature_weights(counts, alpha, target_rows=target)
    assert set(w) == set(counts)
    assert all(v >= 0 for v in w.values())
    # expected output size is exactly the target
    assert abs(sum(w[d] * counts[d] for d in counts) - target) < 1e-6 * target + 1e-9
    # ordering: alpha < 1 never up-weights a LARGER source above a
    # smaller one (weights are antitone in n_d for alpha <= 1)
    if alpha <= 1.0:
        pairs = sorted(counts.items(), key=lambda t: t[1])
        for (da, na), (db, nb) in zip(pairs, pairs[1:]):
            if na < nb:
                assert w[da] >= w[db] - 1e-12


@given(
    keys=st.lists(st.text("ab", min_size=0, max_size=4), min_size=2, max_size=30),
    window=st.integers(1, 5),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_sorted_neighborhood_property(spark, keys, window):
    from magi_etl_spark.operators.joins import sorted_neighborhood_pairs

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, "id", F.col("name"), window=window, num_partitions=3
        ).collect()
    }
    ordered = sorted(rows, key=lambda t: (t[1], t[0]))
    want = {
        (ordered[i][0], ordered[j][0])
        for i in range(len(ordered))
        for j in range(i + 1, min(i + window + 1, len(ordered)))
    }
    assert got == want
