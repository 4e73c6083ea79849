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
    # default age threshold protects a YOUNG unreferenced directory —
    # it could be a concurrent writer's in-flight commit (r4 ADVICE)
    dropped = vacuum(t, keep_last=2)
    assert dropped == [1, 2]
    assert os.path.exists(os.path.join(t, "data", "orphan"))
    assert os.path.exists(os.path.join(t, "data", "v000001"))
    # past the retention window (tests force age 0) the junk goes
    dropped = vacuum(t, keep_last=2, min_age_seconds=0)
    assert dropped == []
    assert list_versions(t) == [3, 4]
    assert read_version(spark, t, version=4).count() == 8
    assert read_version(spark, t, version=3).count() == 6
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, version=1)
    assert not os.path.exists(os.path.join(t, "data", "v000001"))
    assert not os.path.exists(os.path.join(t, "data", "orphan"))
    with pytest.raises(ValueError):
        vacuum(t, keep_last=0)


def test_append_version_shares_files_and_txn_idempotence(spark, tmp_path):
    from magi_etl_spark.operators.versioned import (
        append_version,
        list_versions,
        read_version,
        vacuum,
        write_version,
    )

    t = str(tmp_path / "tbl")
    write_version(spark.range(10), t)
    v2 = append_version(spark.range(100, 105), t, txn_id="b1")
    assert v2 == 2
    assert read_version(spark, t).count() == 15  # base + append
    # replayed transaction: no new version, same contents
    assert append_version(spark.range(100, 105), t, txn_id="b1") == 2
    assert list_versions(t) == [1, 2]
    assert read_version(spark, t).count() == 15
    # a NEW transaction appends normally
    assert append_version(spark.range(200, 202), t, txn_id="b2") == 3
    assert read_version(spark, t).count() == 17
    # replay check survives an INTERLEAVED maintenance commit (r4
    # ADVICE: latest-only inspection double-appended here): optimize
    # commits v4, then a crash-recovered replay of b2 must still no-op
    from magi_etl_spark.operators.versioned import optimize_versioned

    assert optimize_versioned(spark, t, ["id"], n_files=2) == 4
    assert append_version(spark.range(200, 202), t, txn_id="b2") == 4
    assert read_version(spark, t).count() == 17
    # vacuum must NOT delete v1's data: v3's manifest references it
    dropped = vacuum(t, keep_last=3, min_age_seconds=0)
    assert dropped == [1]
    assert read_version(spark, t).count() == 17


def test_streaming_appends_become_versions(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from magi_etl_spark.operators.versioned import (
        current_version,
        read_version,
    )
    from magi_etl_spark.streaming.events_stream import (
        run_foreach_batch_versioned,
    )

    src = tmp_path / "src"
    src.mkdir()
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    def land(name, ids):
        pq.write_table(pa.table({"id": pa.array(ids, pa.int64())}), src / name)

    land("a.parquet", [1, 2, 3])
    stream = spark.readStream.schema("id long").parquet(str(src))
    run_foreach_batch_versioned(stream, tbl, ckpt)
    v_after_first = current_version(tbl)
    assert v_after_first >= 1
    assert sorted(r.id for r in read_version(spark, tbl).collect()) == [1, 2, 3]

    land("b.parquet", [4, 5])
    run_foreach_batch_versioned(stream, tbl, ckpt)
    assert current_version(tbl) == v_after_first + 1
    assert sorted(r.id for r in read_version(spark, tbl).collect()) == [1, 2, 3, 4, 5]
    # time travel to the pre-second-batch snapshot
    old = read_version(spark, tbl, version=v_after_first)
    assert sorted(r.id for r in old.collect()) == [1, 2, 3]
    # re-running with no new data commits nothing
    run_foreach_batch_versioned(stream, tbl, ckpt)
    assert current_version(tbl) == v_after_first + 1


def test_optimize_rewrites_layout_not_contents(spark, tmp_path):
    from magi_etl_spark.operators.versioned import (
        history,
        optimize_versioned,
        read_version,
        vacuum,
        write_version,
    )
    from pyspark.sql import functions as F2

    t = str(tmp_path / "tbl")
    df = spark.range(2000).select(
        (F2.col("id") % 97).alias("a"),
        (F2.col("id") * 31 % 89).alias("b"),
        F2.col("id").alias("payload"),
    )
    write_version(df, t)
    v = optimize_versioned(spark, t, ["a", "b"], n_files=4)
    assert v == 2
    before = sorted(r["payload"] for r in read_version(spark, t, 1).collect())
    after = sorted(r["payload"] for r in read_version(spark, t, 2).collect())
    assert before == after  # contents identical, layout changed
    h = history(t)
    assert [e["op"] for e in h] == ["write", "optimize"]
    assert h[1]["n_files"] == 4
    # optimize output is self-contained: vacuuming v1 keeps v2 readable
    vacuum(t, keep_last=1)
    assert sorted(r["payload"] for r in read_version(spark, t).collect()) == before
