from __future__ import annotations

from magi_etl_spark.pipelines.forecast import forecast_extract
from magi_etl_spark.sources import read_csv


def test_forecast_extract_roundtrip(spark, tmp_path):
    grids = {
        "pageviews": lambda: [
            ["Series", "W1", "W2", "W3"],
            ["forecast", "1,000", "1,100", "1,210"],
            ["actual", "990", "1,150", ""],
        ],
        "users": lambda: [["Series", "W1"], ["forecast", "42"]],
    }
    paths = forecast_extract(spark, grids, str(tmp_path))
    back = read_csv(spark, paths["pageviews"])
    rows = {r["Series"]: (r["W1"], r["W2"], r["W3"]) for r in back.collect()}
    assert rows["forecast"] == (1000.0, 1100.0, 1210.0)
    assert rows["actual"][2] is None  # empty cell stays NULL through the sink
    assert read_csv(spark, paths["users"]).count() == 1
