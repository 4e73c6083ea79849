"""Invariants the q162-q166 oracles can't express: KN conditional
row-stochasticity, grid-quantile bucket-width accuracy and
q-monotonicity, shard-size bounds and contiguity, A-priori triple
consistency with pairwise support, and path determinism under ties."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_kneser_ney_conditional_sums_to_one(spark):
    """For every left token, sum_r p(r | l) over the model vocabulary
    must be exactly 1 — the property the discount/continuation split is
    engineered to preserve."""
    from magi_etl_spark.operators.ngram_lm import doc_bigrams

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug"),
            (3, "a cat and a dog"),
        ],
        "doc_id long, text string",
    )
    d = 0.75
    bg = doc_bigrams(docs)
    model = bg.groupBy("l", "r").agg(F.count(F.lit(1)).alias("c_lr"))
    left = model.groupBy("l").agg(
        F.sum("c_lr").alias("c_l"), F.count(F.lit(1)).alias("n1p_l")
    )
    cont = model.groupBy("r").agg(F.count(F.lit(1)).alias("n1p_r"))
    tot = model.count()
    # p(r|l) summed over ALL r in the continuation vocabulary: the
    # discounted observed mass plus the backoff mass times sum(pcont)=1
    full = (
        model.join(left, "l")
        .crossJoin(cont.agg(F.sum("n1p_r").alias("_check")).select("_check"))
    )
    assert full.select(F.max("_check")).first()[0] == tot  # pcont sums to 1
    per_l = (
        model.join(left, "l")
        .groupBy("l", "c_l", "n1p_l")
        .agg(F.sum(F.greatest(F.col("c_lr") - d, F.lit(0.0))).alias("obs"))
        .select(
            "l",
            (
                F.col("obs") / F.col("c_l")
                + (d * F.col("n1p_l") / F.col("c_l")) * F.lit(1.0)
            ).alias("mass"),
        )
    )
    for row in per_l.collect():
        assert abs(row["mass"] - 1.0) < 1e-9, row


def test_kneser_ney_scores_match_manual_tiny_corpus(spark):
    from magi_etl_spark.operators.ngram_lm import kneser_ney_logprob_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in kneser_ney_logprob_scores(docs, discount=0.75).collect()
    }
    # model: (a,b):3 (b,a):1 (b,c):1; c_a=3 n1p_a=1; c_b=2 n1p_b=2
    # pcont: a:1/3, b:1/3, c:1/3 (3 bigram types, each r has 1 context)
    import math

    p_ab = (3 - 0.75) / 3 + (0.75 * 1 / 3) * (1 / 3)
    p_ba = (1 - 0.75) / 2 + (0.75 * 2 / 2) * (1 / 3)
    p_bc = p_ba
    exp1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    exp2 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["mean_kn_logprob"] - exp1) < 1e-9
    assert abs(out[2]["mean_kn_logprob"] - exp2) < 1e-9


def test_grid_quantiles_accuracy_and_monotonicity(spark):
    from magi_etl_spark.operators.sketches import grid_quantiles

    # uniform integers 0..999: true p50=500, p90=900 within one bucket
    rows = [("g", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = {
        r["q"]: r["est"]
        for r in grid_quantiles(
            df, ["grp"], "v", [0.1, 0.5, 0.9], lo=0.0, hi=1000.0, n_bins=100
        ).collect()
    }
    width = 10.0
    assert abs(out[0.5] - 500.0) <= width
    assert abs(out[0.9] - 900.0) <= width
    assert out[0.1] <= out[0.5] <= out[0.9]  # monotone in q


def test_grid_quantiles_clamps_out_of_range(spark):
    from magi_etl_spark.operators.sketches import grid_quantiles

    df = spark.createDataFrame(
        [("g", -50.0), ("g", 5.0), ("g", 500.0)], "grp string, v double"
    )
    out = grid_quantiles(
        df, ["grp"], "v", [0.5], lo=0.0, hi=10.0, n_bins=10
    ).collect()
    # all mass is inside [lo, hi): the estimate cannot escape the grid
    assert 0.0 <= out[0]["est"] <= 10.0


def test_shard_by_size_bounds_and_contiguity(spark):
    from magi_etl_spark.operators.shards import shard_by_size

    rows = [("s", i, (i * 37) % 900 + 100) for i in range(200)]
    df = spark.createDataFrame(rows, "src string, fid long, bytes long")
    out = shard_by_size(df, ["src"], "bytes", "fid", 2000)
    per = (
        out.groupBy("shard_id")
        .agg(F.sum("bytes").alias("tot"))
        .orderBy("shard_id")
        .collect()
    )
    ids = [r["shard_id"] for r in per]
    assert ids == list(range(len(ids)))  # contiguous from 0
    max_row = 999
    for r in per[:-1]:  # every full shard lands within one row of target
        assert 2000 - max_row <= r["tot"] <= 2000 + max_row, r


def test_frequent_triples_consistent_with_pair_support(spark):
    from magi_etl_spark.operators.association import frequent_triples

    rows = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11), (2, 12),
        (3, 10), (3, 11), (3, 13),
        (4, 13), (4, 14),
    ]
    df = spark.createDataFrame(rows, "bk long, it long")
    out = frequent_triples(df, "bk", "it", min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["item_c"], r["n_co"]) == (10, 11, 12, 2)


def test_top_event_paths_order_and_tiebreak(spark):
    from magi_etl_spark.operators.behavior import top_event_paths

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        # user 1: same-ts tie broken by event_id
        (1, 1, t0, "b"), (2, 1, t0, "a"), (3, 1, t0 + dt.timedelta(hours=1), "c"),
        # user 2 same day: a distinct path
        (4, 2, t0, "a"), (5, 2, t0 + dt.timedelta(hours=1), "c"),
        # user 2 next day: repeats user 1's shape? no — its own
        (6, 2, t0 + dt.timedelta(days=1), "a"),
        (7, 2, t0 + dt.timedelta(days=1, hours=1), "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = top_event_paths(df, max_steps=8, k=10).collect()
    assert [(r["path"], r["n_user_days"]) for r in out] == [
        ("a>c", 2),
        ("b>a>c", 1),
    ]


def test_top_event_paths_caps_steps(spark):
    from magi_etl_spark.operators.behavior import top_event_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, t0 + dt.timedelta(minutes=i), "e") for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = top_event_paths(df, max_steps=3, k=5).collect()
    assert out[0]["path"] == "e>e>e"


def test_phrase_search_overlaps_and_single_token(spark):
    import pytest

    from magi_etl_spark.operators.phrase import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "batch batch batch end"),     # overlapping: 2 matches
            (2, "batch end batch"),            # non-adjacent: 0
            (3, "Batch  BATCH!"),              # case/punct normalized: 1
            (4, "no hits here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "batch batch").collect()}
    assert out == {1: 2, 3: 1}
    single = {r["doc_id"]: r["n_matches"]
              for r in phrase_search(docs, "batch").collect()}
    assert single == {1: 3, 2: 2, 3: 2}
    with pytest.raises(ValueError):
        phrase_search(docs, "   ")


def test_phrase_search_three_words(spark):
    from magi_etl_spark.operators.phrase import phrase_search

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b x c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "a b c").collect()}
    assert out == {1: 2}
