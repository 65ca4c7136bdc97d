"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for correctness against the DuckDB oracle
(UTC session timezone, ANSI off so MySQL-ish permissive casts hold)
and for 100 TB-scale behavior (AQE on with skew-join handling,
partition coalescing, broadcast threshold sized for dimension
tables). On the local[32] test harness the shuffle partition count
matches core count; on a real cluster these remain sane starting
points because AQE re-plans partition counts at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # --- oracle comparability ---
    "spark.sql.session.timeZone": "UTC",
    # --- adaptive execution: runtime re-planning at any scale ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- shuffle sizing: ~cores locally; AQE coalesces upward on clusters ---
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # dimension tables (region/nation/supplier/part at test SF) broadcast
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for every pandas_udf / applyInPandas exchange
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: pushdown + pruning are defaults, keep them pinned
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # keep partition files reasonably sized at large SF
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.ui.enabled": "false",
}


def get_spark(app_name: str = "galaxy_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``master`` defaults to local[$SPARK_GRAFT_CPUS] when no cluster
    master is configured; on a real deployment pass None and rely on
    spark-submit.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    # Driver heap must be set BEFORE the driver JVM launches — a
    # builder.config("spark.driver.memory", ...) at getOrCreate is
    # silently ignored in a locally-launched PySpark process (the JVM
    # already exists by then). Under spark-submit the submitter owns
    # the heap and PYSPARK_SUBMIT_ARGS is preset, so this is a no-op.
    from pyspark import SparkContext
    if (SparkContext._active_spark_context is None
            and "PYSPARK_SUBMIT_ARGS" not in os.environ):
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--driver-memory {mem} pyspark-shell")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
