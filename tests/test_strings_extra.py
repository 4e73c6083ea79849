from __future__ import annotations

from pyspark.sql import functions as F

from magi_etl_spark.functions.strings import auto_num_format, quoted_in_list, stringify


def test_auto_num_format(spark):
    df = spark.createDataFrame(
        [(950.0,), (1_500.0,), (2_300_000.0,), (7_100_000_000.0,), (1.2e12,)], "v double"
    )
    got = [r[0] for r in df.select(auto_num_format(F.col("v"))).collect()]
    assert got == ["950.0", "1.5K", "2.3M", "7.1B", "1.2T"]


def test_stringify_preserves_null(spark):
    df = spark.createDataFrame([(1.5,), (None,)], "v double")
    got = [r[0] for r in df.select(stringify(F.col("v"))).collect()]
    assert got == ["1.5", None]  # true NULL, never the string 'nan'


def test_quoted_in_list_escapes():
    assert quoted_in_list(["a", "b'c"]) == "'a', 'b''c'"
