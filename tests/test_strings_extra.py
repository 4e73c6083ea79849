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


def test_normalize_text_paths(spark):
    from pyspark.sql import functions as F

    from magi_etl_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "  Hello,\tWORLD!!  (test)  "),
            (2, "keep\x01control\x1fout\x7f"),
            (3, "tabs\t\tand\n\nnewlines"),
        ],
        "id long, text string",
    )
    full = {
        r.id: r.n
        for r in df.select(
            "id", normalize_text(F.col("text"), strip_punct=True).alias("n")
        ).collect()
    }
    assert full[1] == "hello world test"
    assert full[2] == "keepcontrolout"
    assert full[3] == "tabs and newlines"
    # punctuation preserved when not stripping
    soft = df.where(F.col("id") == 1).select(
        normalize_text(F.col("text")).alias("n")
    ).collect()[0].n
    assert soft == "hello, world!! (test)"


def test_pii_patterns_on_synthetic(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "contact bob.smith+x@example.co.uk or 10.0.0.1 ref 123456"),
         (2, "no pii here"),
         (3, "a@b.io and c@d.org, also 1.2.3.4 and 192.168.0.255 pin 007")],
        "doc_id long, text string",
    )
    from magi_etl_spark.queries.text import q70_pii_scan  # reuse patterns

    def n(pat):
        return F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))

    got = {r.doc_id: r for r in df.select(
        "doc_id",
        n(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+").alias("em"),
        n(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+").alias("ip"),
        n(r"[0-9][0-9][0-9]+").alias("dr"),
    ).collect()}
    assert (got[1].em, got[1].ip, got[1].dr) == (1, 1, 1)
    assert (got[2].em, got[2].ip, got[2].dr) == (0, 0, 0)
    # digit runs >= 3 digits: 192, 168, 255, 007
    assert (got[3].em, got[3].ip, got[3].dr) == (2, 2, 4)
