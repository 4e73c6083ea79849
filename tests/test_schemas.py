from __future__ import annotations

import pytest

from magi_etl_spark import schemas
from magi_etl_spark.tables import load_table
from tests.magi_fixtures import generate_all


def test_generic_tables_match_declared_schemas(spark, sf_dir):
    for name, schema in [
        ("lineitem", schemas.LINEITEM),
        ("events", schemas.EVENTS),
        ("documents", schemas.DOCUMENTS),
        ("embeddings", schemas.EMBEDDINGS),
    ]:
        got = load_table(spark, sf_dir, name).schema
        assert [f.name for f in got.fields] == [f.name for f in schema.fields], name
        for gf, ef in zip(got.fields, schema.fields):
            assert gf.dataType.simpleString() == ef.dataType.simpleString(), (
                f"{name}.{gf.name}"
            )


def test_magi_fixtures_conform(spark, tmp_path):
    paths = generate_all(str(tmp_path / "magi"))
    for name, schema in schemas.MAGI_SCHEMAS.items():
        df = spark.read.parquet(paths[name])
        conformed = schemas.conform(df, schema)
        assert conformed.schema == schema
        assert conformed.count() == df.count()


def test_conform_rejects_missing_columns(spark):
    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError, match="missing columns.*user_name"):
        schemas.conform(df, schemas.DIMENSION_USERS)


def test_metric_query_rejects_unknown_names(spark, sf_dir):
    from magi_etl_spark.config import MetricQueryConfig
    from magi_etl_spark.query import metric_query

    with pytest.raises(ValueError, match="unsupported attribute"):
        metric_query(spark, sf_dir, MetricQueryConfig(dataset="events", dimensions=["nope"]))
    with pytest.raises(ValueError, match="unsupported metric"):
        metric_query(
            spark, sf_dir, MetricQueryConfig(dataset="events", metrics=["nope"])
        )
