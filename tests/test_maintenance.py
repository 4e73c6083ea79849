"""Small-file compaction and schema-drift union (operators/maintenance.py)."""

import glob

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.maintenance import compact_parquet, evolve_union


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.rand(7).alias("v")
    )
    df.repartition(40).write.parquet(path)  # 40 small files
    before_files = len(glob.glob(f"{path}/*.parquet"))
    assert before_files == 40
    before = sorted(r.id for r in spark.read.parquet(path).collect())

    n = compact_parquet(spark, path, target_file_bytes=512 * 1024)
    after_files = len(glob.glob(f"{path}/*.parquet"))
    assert after_files == n < before_files
    assert not glob.glob(f"{path}.compacting") and not glob.glob(f"{path}.old")
    after = sorted(r.id for r in spark.read.parquet(path).collect())
    assert after == before


def test_evolve_union_widens_and_fills(spark):
    a = spark.createDataFrame([(1, 10)], "id int, v int")
    b = spark.createDataFrame([(2, 2.5, "x")], "id int, v double, note string")
    c = spark.createDataFrame([(3,)], "id bigint")
    out = evolve_union([a, b, c])
    assert dict(out.dtypes) == {"id": "bigint", "v": "double", "note": "string"}
    rows = {r.id: r for r in out.collect()}
    assert rows[1].v == 10.0 and rows[1].note is None
    assert rows[2].v == 2.5 and rows[2].note == "x"
    assert rows[3].v is None and rows[3].note is None


def test_evolve_union_rejects_incompatible(spark):
    a = spark.createDataFrame([(1,)], "x int")
    b = spark.createDataFrame([("s",)], "x string")
    with pytest.raises(ValueError, match="incompatible"):
        evolve_union([a, b])


def test_expectations_suite(spark):
    from pyspark.sql import functions as F

    from magi_etl_spark.operators.expectations import (
        check_suite,
        expect_accepted_values,
        expect_condition,
        expect_in_range,
        expect_not_null,
        expect_referential,
        expect_unique,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", -5.0),     # range violation
            (2, "c", 20.0),     # duplicate key with previous
            (None, "z", 30.0),  # null key + unaccepted status
            (5, None, 40.0),    # null status
        ],
        "k long, status string, amount double",
    )
    parent = spark.createDataFrame([(1,), (2,)], "k long")

    assert {r.status for r in expect_not_null(df, ["k", "status"]).collect()} == {"z", None}
    assert {r.status for r in expect_unique(df, ["k"]).collect()} == {"b", "c"}
    assert {r.status for r in expect_in_range(df, "amount", lo=0, hi=35).collect()} == {"b", None}
    assert {r.amount for r in expect_referential(df, parent, ["k"]).collect()} == {30.0, 40.0}
    assert {r.amount for r in expect_accepted_values(df, "status", ["a", "b", "c"]).collect()} == {30.0, 40.0}
    assert expect_condition(df, F.col("amount") > 0).count() == 1

    summary = {
        r.check: (r.violations, r.passed)
        for r in check_suite(
            {
                "k_not_null": lambda: expect_not_null(df, ["k"]),
                "k_unique": lambda: expect_unique(df, ["k"]),
                "amount_positive": lambda: expect_condition(df, F.col("amount") > 0),
                "clean": lambda: expect_in_range(df, "amount", lo=-100),
            }
        ).collect()
    }
    assert summary == {
        "k_not_null": (1, False),
        "k_unique": (2, False),
        "amount_positive": (1, False),
        "clean": (0, True),
    }


def test_incremental_read_watermark(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from magi_etl_spark.operators.maintenance import incremental_read

    src = tmp_path / "inc_src"
    src.mkdir()
    state = str(tmp_path / "wm.json")

    def write(name, ids):
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64())}), src / name
        )

    def read():
        return spark.read.parquet(str(src))

    write("a.parquet", [1, 2, 3])
    df1, commit1 = incremental_read(read, "id", state)
    assert sorted(r.id for r in df1.collect()) == [1, 2, 3]
    commit1()

    # same call again before new data: empty batch, watermark survives
    df2, commit2 = incremental_read(read, "id", state)
    assert df2.count() == 0
    commit2()  # no-op on empty

    write("b.parquet", [2, 4, 5])  # id 2 is OLD data re-delivered
    df3, commit3 = incremental_read(read, "id", state)
    assert sorted(r.id for r in df3.collect()) == [4, 5]
    commit3()
    df4, _ = incremental_read(read, "id", state)
    assert df4.count() == 0


def test_backfill_partitions_resumes_after_crash(tmp_path):
    from magi_etl_spark.operators.maintenance import backfill_partitions

    state = str(tmp_path / "backfill.json")
    writes: list = []

    def build(day):
        return f"frame-{day}"

    def write(df, day):
        if day == "2024-01-03" and not any(w == day for w in writes):
            writes.append(day)  # the write itself happened...
            raise RuntimeError("executor lost")  # ...but the job died
        writes.append(day)

    days = ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    import pytest

    with pytest.raises(RuntimeError):
        backfill_partitions(days, build, write, state)
    # days 1-2 are committed; day 3 crashed mid-write, day 4 never ran
    ran = backfill_partitions(days, build, write, state)
    assert ran == ["2024-01-03", "2024-01-04"]  # 3 re-runs (idempotent write)
    assert writes.count("2024-01-01") == 1 and writes.count("2024-01-02") == 1
    assert writes.count("2024-01-03") == 2  # crashed once, replayed once
    # a third invocation is a no-op
    assert backfill_partitions(days, build, write, state) == []


def test_backfill_partitions_fresh_start_ignores_state(tmp_path):
    from magi_etl_spark.operators.maintenance import backfill_partitions

    state = str(tmp_path / "bf.json")
    ran1 = backfill_partitions([1, 2], lambda k: k, lambda df, k: None, state)
    assert ran1 == [1, 2]
    # resume=False re-executes everything (a deliberate full rebuild)
    ran2 = backfill_partitions(
        [1, 2], lambda k: k, lambda df, k: None, state, resume=False
    )
    assert ran2 == [1, 2]
