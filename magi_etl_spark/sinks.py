"""Sinks (SURVEY.md §2.1 S12-S15): columnar/CSV writers, zip-of-CSVs
export, Slack Block Kit rendering, Amplitude lookup-table CRUD — the
formatting/plumbing is real and tested; network edges take injectable
transports."""

from __future__ import annotations

import io
import json
import os
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame

from magi_etl_spark.functions.strings import auto_num_format  # noqa: F401  (display helper)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """CSV sink (reference S12 ``store_result``, ``tasks.py:891-911``).
    ``single_file`` coalesces for human-facing exports; leave False for
    data-scale writes."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic: bool = True,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet with DYNAMIC partition overwrite:
    an incremental backfill replaces only the partitions present in
    ``df`` and leaves every other partition untouched — the idempotent
    re-run primitive for date-partitioned warehouse tables (static
    overwrite mode would drop the whole table first; at 100 TB that is
    the difference between rewriting one day and rewriting three years).
    The conf is scoped to this write and restored afterwards, so a
    session-level static setting is not silently flipped."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "dynamic" if dynamic else "static")
        df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed table (hash-bucketed by ``bucket_col``); managed by
    default, external when ``path`` is given (callers that must control
    the storage location, e.g. a scratch dir instead of the session
    warehouse — the bucket spec lives in the catalog either way).

    The 100 TB join strategy: two tables bucketed on the same key with the
    same bucket count join WITHOUT a shuffle — the exchange disappears
    from the plan (asserted in tests/test_bucketing.py).  Bucket pruning
    also serves point lookups on the bucket key."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def slack_blocks_grouped(
    df: DataFrame,
    title: str,
    group_col: str,
    columns: list[str],
    top_n_per_group: int = 5,
    order_by: str | None = None,
) -> list[dict]:
    """Block Kit report grouped into per-category sections (the reference
    groups its Slack trending report by vertical, ``tasks.py:2191-2193``):
    header, then one context + rows block set per group value."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    # Always cap per-group BEFORE collect — this is a driver-edge sink and
    # must never pull an unbounded DataFrame; without an explicit order the
    # cap keeps the first rows per group in the frame's own ordering.
    order = F.desc(order_by) if order_by else F.monotonically_increasing_id()
    w = W.partitionBy(group_col).orderBy(order)
    df = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_n_per_group)
        .drop("_rn")
    )
    # Slack renders at most 50 blocks; bound the group count too.
    rows = df.limit(50 * max(1, top_n_per_group)).collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(str(r[group_col]), []).append(r)
    blocks: list[dict] = [
        {"type": "header", "text": {"type": "plain_text", "text": title[:150]}}
    ]
    for group in sorted(by_group):
        blocks.append(
            {"type": "context", "elements": [{"type": "mrkdwn", "text": f"*{group}*"}]}
        )
        for r in by_group[group][:top_n_per_group]:
            blocks.append(
                {
                    "type": "section",
                    "fields": [
                        {"type": "mrkdwn", "text": f"*{c}*: {r[c]}"} for c in columns
                    ][:10],
                }
            )
    return blocks


def zip_results(dfs: dict[str, DataFrame], zip_path: str, max_rows: int = 100_000) -> str:
    """Zip-of-CSVs download (reference S14, ``dash_app/callbacks.py:77-97``):
    driver-side export of small result sets; ``max_rows`` guards against
    accidentally collecting a fact table."""
    os.makedirs(os.path.dirname(zip_path) or ".", exist_ok=True)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, df in dfs.items():
            pdf = df.limit(max_rows).toPandas()
            buf = io.StringIO()
            pdf.to_csv(buf, index=False)
            zf.writestr(f"{name}.csv", buf.getvalue())
    return zip_path


def slack_blocks(
    df: DataFrame,
    title: str,
    columns: list[str],
    top_n: int = 5,
    order_by: str | None = None,
) -> list[dict]:
    """Top-N table as Slack Block Kit JSON (reference S15
    ``send_slack_message``, ``tasks.py:2169-2536``): header block + one
    section per row with mrkdwn fields.  Pure function — the caller posts
    the payload."""
    from pyspark.sql import functions as F

    if order_by:
        df = df.orderBy(F.desc(order_by))
    rows = df.limit(top_n).collect()
    blocks: list[dict] = [
        {"type": "header", "text": {"type": "plain_text", "text": title[:150]}}
    ]
    for r in rows:
        fields = [
            {"type": "mrkdwn", "text": f"*{c}*: {r[c]}"} for c in columns
        ]
        blocks.append({"type": "section", "fields": fields[:10]})
    if not rows:
        blocks.append(
            {"type": "section", "text": {"type": "mrkdwn", "text": "_no rows_"}}
        )
    return blocks


class AmplitudeLookupTable:
    """Lookup-table CRUD sink (reference S10, ``connectors.py:538-608``):
    DataFrame -> CSV body -> REST calls, with the HTTP transport injected
    (``post(method, url, data) -> (status, body)``)."""

    def __init__(self, base_url: str, api_key: str, post: Callable[[str, str, bytes], tuple[int, str]]):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.post = post

    def _csv_body(self, df: DataFrame, max_rows: int = 100_000) -> bytes:
        buf = io.StringIO()
        df.limit(max_rows).toPandas().to_csv(buf, index=False)
        return buf.getvalue().encode()

    def exists(self, name: str) -> bool:
        status, _ = self.post("GET", f"{self.base_url}/lookup_table/{name}", b"")
        return status == 200

    def create(self, name: str, df: DataFrame) -> str:
        status, body = self.post(
            "POST", f"{self.base_url}/lookup_table/{name}", self._csv_body(df)
        )
        if status >= 300:
            raise RuntimeError(f"create failed: {status} {body}")
        return body

    def update(self, name: str, df: DataFrame) -> str:
        status, body = self.post(
            "PATCH", f"{self.base_url}/lookup_table/{name}", self._csv_body(df)
        )
        if status >= 300:
            raise RuntimeError(f"update failed: {status} {body}")
        return body

    def delete(self, name: str) -> str:
        status, body = self.post("DELETE", f"{self.base_url}/lookup_table/{name}", b"")
        if status >= 300:
            raise RuntimeError(f"delete failed: {status} {body}")
        return body

    def upsert(self, name: str, df: DataFrame) -> str:
        return self.update(name, df) if self.exists(name) else self.create(name, df)


def render_report(dfs: dict[str, DataFrame], json_path: str, top_n: int = 5) -> str:
    """Materialize a multi-table Block Kit report to JSON on disk (the
    testable half of the Slack edge)."""
    payload = {
        name: slack_blocks(df, title=name, columns=df.columns[:5], top_n=top_n)
        for name, df in dfs.items()
    }
    os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
    with open(json_path, "w") as f:
        json.dump(payload, f, indent=2)
    return json_path
