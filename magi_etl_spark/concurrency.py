"""Concurrent query fan-out (reference S2 ``run_multiple_queries``,
``connectors.py:255-365``).

The reference submits N Athena queries and polls every 5 s; on Spark the
scheduler itself multiplexes jobs, so fan-out is just N driver threads
sharing one SparkSession — each thread tagged into a FAIR scheduler pool
so a long query can't starve short ones.  No polling loop exists: actions
block until done.
"""

from __future__ import annotations

from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession


def run_concurrent(
    spark: SparkSession,
    jobs: dict[str, Callable[[], DataFrame]],
    materialize: Callable[[DataFrame], object] | None = None,
    max_workers: int = 8,
    pool: str = "fanout",
) -> dict[str, object]:
    """Run each job's build+action on its own thread; returns
    {name: materialized result}.  ``materialize`` defaults to collecting
    the rows (callers wanting a write pass ``lambda df: df.write...``)."""
    mat = materialize or (lambda df: df.collect())

    def run(name: str):
        sc = spark.sparkContext
        sc.setLocalProperty("spark.scheduler.pool", pool)
        sc.setJobDescription(f"fanout:{name}")
        try:
            return mat(jobs[name]())
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = {name: ex.submit(run, name) for name in jobs}
        return {name: f.result() for name, f in futures.items()}
