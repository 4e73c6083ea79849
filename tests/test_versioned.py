"""Versioned parquet tables: atomic commit, time travel, crash
visibility, vacuum retention."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_versions_accumulate_and_time_travel(spark, tmp_path):
    from magi_etl_spark.operators.versioned import (
        current_version,
        list_versions,
        read_version,
        write_version,
    )

    t = str(tmp_path / "tbl")
    assert current_version(t) is None
    v1 = write_version(spark.range(5).withColumn("tag", F.lit("a")), t)
    v2 = write_version(spark.range(9).withColumn("tag", F.lit("b")), t)
    assert (v1, v2) == (1, 2)
    assert current_version(t) == 2 and list_versions(t) == [1, 2]
    assert read_version(spark, t).count() == 9          # current
    old = read_version(spark, t, version=1)
    assert old.count() == 5                              # time travel
    assert {r["tag"] for r in old.collect()} == {"a"}


def test_reader_never_sees_a_partial_commit(spark, tmp_path):
    from magi_etl_spark.operators.versioned import (
        current_version,
        read_version,
        write_version,
    )

    t = str(tmp_path / "tbl")
    write_version(spark.range(3), t)
    # simulate a writer that crashed AFTER writing data, BEFORE the
    # manifest/rename: data directory exists, no manifest
    os.makedirs(os.path.join(t, "data", "v000002"))
    assert current_version(t) == 1
    assert read_version(spark, t).count() == 3
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, version=2)
    # the next successful writer claims version 2 cleanly
    assert write_version(spark.range(7), t) == 2
    assert read_version(spark, t).count() == 7


def test_vacuum_retention_and_orphans(spark, tmp_path):
    from magi_etl_spark.operators.versioned import (
        list_versions,
        read_version,
        vacuum,
        write_version,
    )

    t = str(tmp_path / "tbl")
    for n in (2, 4, 6, 8):
        write_version(spark.range(n), t)
    os.makedirs(os.path.join(t, "data", "orphan"))  # crashed writer junk
    dropped = vacuum(t, keep_last=2)
    assert dropped == [1, 2]
    assert list_versions(t) == [3, 4]
    assert read_version(spark, t, version=4).count() == 8
    assert read_version(spark, t, version=3).count() == 6
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, version=1)
    assert not os.path.exists(os.path.join(t, "data", "v000001"))
    assert not os.path.exists(os.path.join(t, "data", "orphan"))
    with pytest.raises(ValueError):
        vacuum(t, keep_last=0)
