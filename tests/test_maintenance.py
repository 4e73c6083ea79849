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
