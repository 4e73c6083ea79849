"""Z-order layout: same rows back, and per-file parquet statistics are
tight on EVERY clustering column (that's what lets the scan pruner skip
files for filters on any of them), unlike a single-column sort where the
other column's spans stay global."""

from __future__ import annotations

from pyspark.sql import functions as F

from magi_etl_spark.operators.zorder import (
    file_stats_ranges,
    write_zordered,
    zorder_key,
)
from magi_etl_spark.tables import load_table


def _avg_span_fraction(ranges, global_min, global_max):
    gspan = global_max - global_min
    spans = [(mx - mn) / gspan for mn, mx in ranges]
    return sum(spans) / len(spans)


def test_zorder_write_roundtrip_and_clustering(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    zpath = str(tmp_path / "z")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)

    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    key = lambda r: (r.l_orderkey, r.l_partkey, r.l_suppkey)  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(map(key, li.collect()))

    # single-column sort baseline: tight on the sort column only
    spath = str(tmp_path / "s")
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).collect()[0]
    pk_mn, pk_mx, sk_mn, sk_mx = stats

    z = file_stats_ranges(zpath, ["l_partkey", "l_suppkey"])
    s = file_stats_ranges(spath, ["l_partkey", "l_suppkey"])
    assert len(z["l_partkey"]) >= 4  # multiple files, each with stats

    z_pk = _avg_span_fraction(z["l_partkey"], pk_mn, pk_mx)
    z_sk = _avg_span_fraction(z["l_suppkey"], sk_mn, sk_mx)
    s_sk = _avg_span_fraction(s["l_suppkey"], sk_mn, sk_mx)

    # z-order: BOTH columns' per-file spans well under the global span
    assert z_pk < 0.65 and z_sk < 0.65, (z_pk, z_sk)
    # the linear sort leaves the non-sort column unclustered (~full span)
    assert s_sk > 0.9, s_sk
    # and z-order clusters the secondary column far better than the
    # single-column sort does
    assert z_sk < s_sk / 2


def test_zorder_key_width_guard(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    import pytest

    with pytest.raises(ValueError, match="63 bits"):
        zorder_key(li, ["l_partkey", "l_suppkey"], bits=32)
