"""Unit tests for the engine core: filter-tree compiler, config hashing,
AnchorCalendar, result cache."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.calendar import AnchorCalendar
from magi_etl_spark.cache import ResultCache
from magi_etl_spark.config import FilterGroup, MetricQueryConfig
from magi_etl_spark.filters import compile_filter_tree
from magi_etl_spark.metrics import AttributeSpec


ATTRS = {
    "color": AttributeSpec("color", lambda: F.col("color")),
    "tags": AttributeSpec("tags", lambda: F.col("tags"), unnest=True),
}


def _rows(spark, groups):
    df = spark.createDataFrame(
        [
            (1, "Red", ["a", "b"]),
            (2, "blue", ["b", "c"]),
            (3, "green", []),
            (4, "RED", ["c"]),
        ],
        "id int, color string, tags array<string>",
    )
    out = df.where(compile_filter_tree(groups, ATTRS)).select("id").collect()
    return sorted(r.id for r in out)


def test_scalar_leaf_case_insensitive(spark):
    assert _rows(spark, [FilterGroup(attribute="color", values=["red"])]) == [1, 4]


def test_or_and_exclude(spark):
    assert _rows(
        spark,
        [FilterGroup(attribute="color", values=["red", "blue"], logical_operator="or")],
    ) == [1, 2, 4]
    assert _rows(
        spark, [FilterGroup(attribute="color", values=["red"], exclude=True)]
    ) == [2, 3]


def test_array_membership_leaf(spark):
    # filter value lowercased; column values compared as-is (reference parity)
    assert _rows(spark, [FilterGroup(attribute="tags", values=["B"])]) == [1, 2]


def test_nested_subgroups_and_semantics(spark):
    # (color in red/blue) AND (NOT tags contains c)
    g = FilterGroup(
        attribute="color",
        values=["red", "blue"],
        logical_operator="or",
        subgroups=[FilterGroup(attribute="tags", values=["c"], exclude=True)],
    )
    assert _rows(spark, [g]) == [1]


def test_empty_groups_skipped(spark):
    assert _rows(spark, [FilterGroup()]) == [1, 2, 3, 4]


def test_config_cache_key_stable_and_canonical():
    a = MetricQueryConfig(dimensions=["x"], metrics=["m"])
    b = MetricQueryConfig(metrics=["m"], dimensions=["x"])
    assert a.cache_key() == b.cache_key()
    c = MetricQueryConfig(dimensions=["y"], metrics=["m"])
    assert a.cache_key() != c.cache_key()
    rt = MetricQueryConfig.from_dict(a.to_dict())
    assert rt.cache_key() == a.cache_key()


def test_anchor_calendar_fields():
    cal = AnchorCalendar("2025-02-28")  # a Friday
    assert cal.latest_date == dt.date(2025, 2, 27)
    assert cal.current_quarter == 1 and cal.last_quarter == 4
    assert cal.latest_complete_month_start == dt.date(2025, 1, 1)
    assert cal.latest_complete_month_end == dt.date(2025, 1, 31)
    assert cal.current_month_start == dt.date(2025, 2, 1)
    assert cal.current_month_end == dt.date(2025, 2, 28)
    # ISO week: 2025-02-28 is Friday; current week starts Monday 02-24
    assert cal.current_week_start == dt.date(2025, 2, 24)
    assert cal.latest_complete_week_start == dt.date(2025, 2, 17)
    assert cal.latest_complete_week_end == dt.date(2025, 2, 23)
    assert cal.mom == dt.date(2025, 1, 28)
    assert cal.yoy == dt.date(2024, 2, 28)
    # month-end clamping (Mar 31 -> Feb 28)
    assert AnchorCalendar("2025-03-31").mom == dt.date(2025, 2, 28)
    assert cal.rolling_window(30) == (dt.date(2025, 1, 29), dt.date(2025, 2, 27))
    assert cal.benchmark_days() == [
        dt.date(2025, 2, 20),
        dt.date(2025, 2, 13),
        dt.date(2025, 2, 6),
        dt.date(2025, 1, 30),
    ]


def test_result_cache_ttl_and_singleflight(spark, tmp_path):
    now = [1000.0]
    cache = ResultCache(str(tmp_path), ttl_seconds=100, clock=lambda: now[0])
    calls = []

    def compute():
        calls.append(1)
        return spark.range(3)

    df1 = cache.get_or_compute(spark, "k1", compute)
    assert df1.count() == 3 and len(calls) == 1
    # hit: no recompute
    df2 = cache.get_or_compute(spark, "k1", compute)
    assert df2.count() == 3 and len(calls) == 1
    # expired: recompute
    now[0] += 200
    cache.get_or_compute(spark, "k1", compute)
    assert len(calls) == 2
    # force refresh
    cache.get_or_compute(spark, "k1", compute, force_refresh=True)
    assert len(calls) == 3
    # stale lock is broken (lock TTL semantics): held since t=0, now far
    # past the 1h lock TTL -> the new caller takes over and computes
    now[0] = 10_000.0
    lock = tmp_path / "k2.lock"
    lock.write_text("0")
    cache.get_or_compute(spark, "k2", compute)
    assert len(calls) == 4
    # TTL housekeeping: k1 (created ~1200) is expired at t=10000, k2 fresh
    evicted = cache.evict_expired()
    assert "k1" in evicted and "k2" not in evicted
    assert cache.lookup(spark, "k1") is None
    assert cache.lookup(spark, "k2") is not None
