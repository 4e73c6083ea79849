"""Property-based MetricQuery testing (SURVEY.md §5.2.3): random
dims/metrics/filter-trees evaluated by the Spark engine must agree with a
straightforward pandas evaluator on the same small dataset."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from magi_etl_spark.config import FilterGroup, MetricQueryConfig
from magi_etl_spark.metrics import AttributeSpec, MetricDataset, MetricSpec
from magi_etl_spark.query import metric_query

ROWS = [
    # (uid, color, shape, tags, score)
    (1, "Red", "circle", ["a", "b"], 10),
    (2, "blue", "square", ["b"], 5),
    (3, "Blue", "circle", [], 2),
    (4, "green", "square", ["c", "a"], 7),
    (5, "red", "triangle", ["c"], 1),
    (6, "RED", "circle", ["a"], 4),
    (7, "blue", "triangle", ["b", "c"], 9),
    (8, "green", "circle", ["a", "b", "c"], 3),
]
PDF = pd.DataFrame(ROWS, columns=["uid", "color", "shape", "tags", "score"])

COLORS = ["red", "blue", "green", "purple"]
TAGS = ["a", "b", "c", "z"]


@st.composite
def filter_groups(draw, depth: int = 2):
    attr = draw(st.sampled_from(["color", "tag", None]))
    values = (
        draw(st.lists(st.sampled_from(COLORS if attr == "color" else TAGS), max_size=3))
        if attr
        else []
    )
    subgroups = (
        draw(st.lists(filter_groups(depth=depth - 1), max_size=2)) if depth > 0 else []
    )
    return FilterGroup(
        attribute=attr,
        values=values,
        logical_operator=draw(st.sampled_from(["or", "and"])),
        exclude=draw(st.booleans()),
        subgroups=subgroups,
    )


def eval_group_pandas(g: FilterGroup, row) -> bool:
    clause = None
    if g.values:
        if g.attribute == "color":
            hits = [row["color"].lower() == v.lower() for v in g.values]
        else:
            hits = [v.lower() in row["tags"] for v in g.values]
        clause = any(hits) if g.logical_operator == "or" else all(hits)
        if g.exclude:
            clause = not clause
    if g.subgroups:
        subs = [eval_group_pandas(s, row) for s in g.subgroups]
        sub = any(subs) if g.logical_operator == "or" else all(subs)
        clause = (clause and sub) if clause is not None else sub
    return True if clause is None else clause


def pandas_metric_query(cfg: MetricQueryConfig) -> pd.DataFrame:
    df = PDF[
        PDF.apply(
            lambda row: all(
                eval_group_pandas(g, row) for g in cfg.filter_groups if not g.is_empty()
            ),
            axis=1,
        )
    ]
    if "tag" in cfg.dimensions:
        df = df[df.tags.map(len) > 0].explode("tags").rename(columns={"tags": "tag"})
    group_cols = list(cfg.dimensions)
    agg = df.groupby(group_cols, dropna=False).agg(
        users=("uid", "nunique"), total_score=("score", "sum")
    ).reset_index()
    if cfg.min_count and cfg.min_metric:
        agg = agg[agg[cfg.min_metric] >= cfg.min_count]
    return agg


@pytest.fixture(scope="module")
def dataset(spark):
    sdf = spark.createDataFrame(
        ROWS, "uid int, color string, shape string, tags array<string>, score int"
    )
    return MetricDataset(
        name="props",
        load=lambda s, d: sdf,
        attributes={
            "color": AttributeSpec("color", lambda: F.col("color")),
            "shape": AttributeSpec("shape", lambda: F.col("shape")),
            "tag": AttributeSpec("tag", lambda: F.col("tags"), unnest=True),
        },
        metrics={
            "users": MetricSpec("users", lambda: F.countDistinct("uid")),
            "total_score": MetricSpec("total_score", lambda: F.sum("score")),
        },
    )


@given(
    dims=st.sampled_from([["color"], ["shape"], ["color", "shape"], ["tag"], ["tag", "color"]]),
    groups=st.lists(filter_groups(), max_size=2),
    min_count=st.sampled_from([None, 1, 2, 5]),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_metric_query_matches_pandas(dataset, dims, groups, min_count):
    cfg = MetricQueryConfig(
        dataset="props",
        dimensions=dims,
        metrics=["users", "total_score"],
        filter_groups=groups,
        min_metric="users" if min_count else None,
        min_count=min_count,
    )
    got = {
        tuple(r[d] for d in dims) + (r["users"], r["total_score"])
        for r in metric_query(None, "", cfg, dataset=dataset).collect()
    }
    expected_df = pandas_metric_query(cfg)
    expected = {
        tuple(row[d] for d in dims) + (row["users"], row["total_score"])
        for _, row in expected_df.iterrows()
    }
    assert got == expected
