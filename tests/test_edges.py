"""Connector-edge tests: sources with injected transports, sinks, and
concurrent fan-out."""

from __future__ import annotations

import json
import zipfile

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.concurrency import run_concurrent
from magi_etl_spark.sinks import (
    AmplitudeLookupTable,
    render_report,
    slack_blocks,
    write_csv,
    zip_results,
)
from magi_etl_spark.sources import (
    coerce_numeric,
    dryrun_path,
    read_csv,
    read_rest,
    read_search_console,
    read_sheet,
)


def test_read_rest_shape(spark):
    payload = {
        "overlaps": [
            ("gaming", "anime", 1200, "2025-01-01", "2025-01-31"),
            ("gaming", "tv", 300, "2025-01-01", "2025-01-31"),
        ]
    }
    df = read_rest(
        spark,
        fetch=lambda: payload,
        records_key="overlaps",
        schema="community_name string, overlap_community string, overlap_users long,"
        " start_date string, end_date string",
    )
    assert df.count() == 2
    assert df.schema["overlap_users"].dataType.simpleString() == "bigint"


def test_read_search_console_pagination_and_key_split(spark):
    """3-page offset pagination (2 + 2 + empty) and keys-list split into
    typed dimension columns, mirroring reference connectors.py:489-534."""
    pages = [
        {
            "rows": [
                {"keys": ["/wiki/A", "2025-03-01", "heroes"],
                 "clicks": 10.0, "impressions": 100.0, "ctr": 0.1, "position": 1.5},
                {"keys": ["/wiki/B", "2025-03-01", "villains"],
                 "clicks": 5.0, "impressions": 50.0, "ctr": 0.1, "position": 2.0},
            ]
        },
        {
            "rows": [
                {"keys": ["/wiki/C", "2025-03-02", "heroes"],
                 "clicks": 7.0, "impressions": 70.0, "ctr": 0.1, "position": 3.0},
                {"keys": ["/wiki/D", "2025-03-02", "lore"],
                 "clicks": 2.0, "impressions": 40.0, "ctr": 0.05, "position": 9.9},
            ]
        },
        {},  # empty page terminates the loop
    ]
    seen_payloads = []

    def fetch_page(payload):
        seen_payloads.append(payload)
        return pages[min(len(seen_payloads) - 1, len(pages) - 1)]

    df = read_search_console(
        spark,
        fetch_page,
        start_date="2025-03-01",
        end_date="2025-03-02",
        dimensions=("page", "date", "query"),
        row_limit=2,
    )
    assert [p["startRow"] for p in seen_payloads] == [0, 2, 4]
    assert all(p["rowLimit"] == 2 for p in seen_payloads)
    assert df.columns == ["page", "date", "query", "clicks", "impressions", "ctr", "position"]
    assert df.schema["date"].dataType.simpleString() == "date"
    rows = {r.page: r for r in df.collect()}
    assert len(rows) == 4
    assert rows["/wiki/C"].query == "heroes"
    assert rows["/wiki/D"].date.isoformat() == "2025-03-02"
    assert rows["/wiki/A"].clicks == 10.0


def test_read_search_console_empty_first_page(spark):
    df = read_search_console(
        spark,
        lambda payload: {"rows": []},
        start_date="2025-03-01",
        end_date="2025-03-01",
        dimensions=("date", "country"),
        row_limit=100,
    )
    assert df.count() == 0
    assert df.columns == ["date", "country", "clicks", "impressions", "ctr", "position"]


def test_read_sheet_header_promotion_and_coercion(spark):
    grid = [
        ["Metric", "Jan", "Feb"],
        ["pageviews", "1,234", "2,500"],
        ["users", "400", ""],
    ]
    df = read_sheet(spark, lambda: grid)
    assert df.columns == ["Metric", "Jan", "Feb"]
    out = coerce_numeric(df, ["Jan", "Feb"]).collect()
    vals = {r.Metric: (r.Jan, r.Feb) for r in out}
    assert vals["pageviews"] == (1234.0, 2500.0)
    assert vals["users"] == (400.0, None)  # empty cell -> NULL, not 'nan'


def test_csv_roundtrip_and_dryrun(spark, tmp_path):
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    p = str(tmp_path / "out.csv")
    write_csv(df, p, single_file=True)
    back = read_csv(spark, p, schema="id long, v long")
    assert {(r.id, r.v) for r in back.collect()} == {(i, 2 * i) for i in range(5)}
    assert dryrun_path(str(tmp_path), "missing") is None


def test_zip_results(spark, tmp_path):
    dfs = {"a": spark.range(3), "b": spark.range(2).withColumn("x", F.lit("y"))}
    zp = zip_results(dfs, str(tmp_path / "results.zip"))
    with zipfile.ZipFile(zp) as zf:
        assert sorted(zf.namelist()) == ["a.csv", "b.csv"]
        assert zf.read("a.csv").decode().splitlines()[0] == "id"


def test_slack_blocks_shape(spark, tmp_path):
    df = spark.createDataFrame(
        [("w1", 100), ("w2", 50), ("w3", 10)], "wiki string, users int"
    )
    blocks = slack_blocks(df, "Trending", ["wiki", "users"], top_n=2, order_by="users")
    assert blocks[0]["type"] == "header"
    assert len(blocks) == 3  # header + 2 rows
    assert blocks[1]["fields"][0]["text"] == "*wiki*: w1"
    path = render_report({"trending": df}, str(tmp_path / "report.json"))
    assert "Trending"[:5].lower() in json.load(open(path))["trending"][0]["text"]["text"].lower()


def test_amplitude_lookup_table_crud(spark):
    calls = []

    def fake_post(method, url, body):
        calls.append((method, url, body))
        if method == "GET":
            return (404 if "missing" in url else 200), ""
        return 200, "ok"

    sink = AmplitudeLookupTable("https://api.example/v1", "key", fake_post)
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    assert not sink.exists("missing_table")
    sink.upsert("missing_table", df)  # -> create (POST)
    assert calls[-1][0] == "POST" and b"k,v" in calls[-1][2]
    sink.upsert("existing", df)  # -> update (PATCH)
    assert calls[-1][0] == "PATCH"
    sink.delete("existing")
    assert calls[-1][0] == "DELETE"


def test_run_concurrent(spark, sf_dir):
    from magi_etl_spark.queries import QUERIES

    jobs = {
        "q01": lambda: QUERIES["q01_pricing_summary"](spark, sf_dir),
        "q12": lambda: QUERIES["q12_conditional_agg"](spark, sf_dir),
    }
    out = run_concurrent(spark, jobs, materialize=lambda df: df.count())
    assert out["q01"] > 0 and out["q12"] > 0


def test_table_diff_and_summary(spark):
    from magi_etl_spark.operators.reconcile import diff_summary, table_diff

    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (3, "z", None), (4, "w", 40)],
        "k long, s string, v int",
    )
    b = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 99), (3, "z", None), (5, "q", 50)],
        "k long, s string, v int",
    )
    got = {r.k: r.status for r in table_diff(a, b, ["k"]).collect()}
    # 1 matches (dropped), 3 matches incl. NULL handling, 2 mismatch
    assert got == {2: "mismatch", 4: "only_a", 5: "only_b"}
    counts = {r.status: r.n for r in diff_summary(table_diff(a, b, ["k"])).collect()}
    assert counts == {"mismatch": 1, "only_a": 1, "only_b": 1}
    # NULL must not collide with empty string or the literal tag
    c = spark.createDataFrame([(3, "z", None)], "k long, s string, v int")
    d = spark.createDataFrame([(3, "z", None)], "k long, s string, v int")
    assert table_diff(c, d, ["k"]).count() == 0
    e = spark.createDataFrame([(3, "", None)], "k long, s string, v int")
    assert table_diff(c, e, ["k"]).count() == 1
    # separator injection: ('a|b','c') vs ('a','b|c') must NOT collide
    f = spark.createDataFrame([(3, "a|b", "c")], "k long, s string, t string")
    g = spark.createDataFrame([(3, "a", "b|c")], "k long, s string, t string")
    assert table_diff(f, g, ["k"]).count() == 1


def test_write_partitioned_dynamic_overwrite(spark, tmp_path):
    """Dynamic partition overwrite replaces ONLY the partitions present
    in the incoming frame (the idempotent backfill contract); static
    mode would drop the sibling partitions."""
    from pyspark.sql import functions as F

    from magi_etl_spark.sinks import write_partitioned

    path = str(tmp_path / "pt")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10), ("2024-01-02", 2, 20), ("2024-01-03", 3, 30)],
        "day string, k long, v long",
    )
    write_partitioned(base, path, ["day"])
    refill = spark.createDataFrame(
        [("2024-01-02", 2, 99)], "day string, k long, v long"
    )
    write_partitioned(refill, path, ["day"])
    got = {
        (str(r.day), r.k): r.v for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("2024-01-01", 1): 10,
        ("2024-01-02", 2): 99,  # replaced
        ("2024-01-03", 3): 30,  # untouched
    }
    # conf is restored (scoped override, not a session-wide flip)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC").lower()
        == "static"
    )
    # re-running the same backfill is a no-op on content
    write_partitioned(refill.withColumn("v", F.lit(99).cast("long")), path, ["day"])
    assert {
        (str(r.day), r.k): r.v for r in spark.read.parquet(path).collect()
    } == got
