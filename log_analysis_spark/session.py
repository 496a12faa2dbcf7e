"""SparkSession factory with scale-oriented defaults.

The reference is single-threaded with a threading TODO
(/root/reference/src/zeek/zeek_log.rs:405-406, README.md:43); here
parallelism, AQE, and Arrow are first-class session configs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the sandbox (local[N], 128 GiB single JVM) but chosen as the
# per-executor settings we would ship to a 1000-executor cluster:
#  - AQE coalesces small shuffle partitions and splits skewed ones at runtime
#  - Arrow makes pandas-UDF exchange columnar (the only Python hot path)
#  - shuffle.partitions matches core count locally; on a real cluster this
#    is sized to ~2-3x total cores and AQE coalesces down.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    # keep catalog artifacts (bucketed tables) out of the repo cwd
    "spark.sql.warehouse.dir": "/tmp/spark-warehouse",
}


def get_spark(
    app_name: str = "log-analysis-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    On a real cluster the same code ships via ``spark-submit --py-files``
    and ``master`` is left to the submitter.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
