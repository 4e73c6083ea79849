"""ForecastTracker pipeline (reference ``dash_app/tasks.py:1602-1718``):
pure extract — spreadsheet A1 ranges -> typed tables -> CSV sink.  The
sheet transport is injected (``sources.read_sheet``); range names mirror
the reference's metric/period grid."""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from magi_etl_spark.sinks import write_csv
from magi_etl_spark.sources import coerce_numeric, read_sheet


def forecast_extract(
    spark: SparkSession,
    ranges: dict[str, Callable[[], Sequence[Sequence[str]]]],
    out_dir: str,
    numeric_from_col: int = 1,
) -> dict[str, str]:
    """Extract every named range: header promotion, thousands-separator
    numeric coercion for all but the label column, one CSV per range."""
    paths: dict[str, str] = {}
    for name, fetch in ranges.items():
        df: DataFrame = read_sheet(spark, fetch)
        df = coerce_numeric(df, df.columns[numeric_from_col:])
        path = os.path.join(out_dir, name)
        write_csv(df, path, single_file=True)
        paths[name] = path
    return paths
