"""SparkSession factory.

The reference delegates execution to AWS Athena (reference
``connectors.py:182-253``); here Spark itself is the engine, so session
configuration is where its "cluster" posture lives.  Defaults are tuned for
correctness tests on ``local[*]`` but chosen to scale: AQE on (runtime
partition coalescing + skew-join splitting), explicit shuffle partitioning,
Arrow for any pandas interchange, UTC session timezone so calendar logic is
deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "magi-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    On a real cluster, ``master``/memory come from spark-submit and these
    builder calls are inert; locally they make ``local[N]`` behave like a
    small cluster (parallel shuffles, AQE re-planning).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    master = master or os.environ.get("SPARK_MASTER") or (f"local[{cpus}]" if cpus else "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.scheduler.mode", "FAIR")  # concurrent fan-out pools
        .config(
            "spark.scheduler.allocation.file",
            os.path.join(os.path.dirname(__file__), "fairscheduler.xml"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # let Python DataSources (sources/pyds.py) receive pushed filters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEMORY", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
