"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for the sandbox (local[$SPARK_GRAFT_CPUS], 128 GiB) but
chosen to hold on a multi-executor cluster: AQE on (coalesce + skew join),
Arrow on for every pandas UDF, shuffle partition count sized to cores locally
and overridable via env for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "sparkdoc",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting are the first line of
        # defense against the long-tail document-size skew (SURVEY §7.3.4).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # Arrow for all pandas UDF traffic. 16k rows/batch ≈ 400 median docs
        # (or ~27 worst-case 60-page docs) per Python call — raw-node rows are
        # ~1 KB so a batch stays ~16 MB; the old 2048 made extract pay per-batch
        # Arrow overhead ~8x more often for no memory benefit.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        # Keep scan partitions reasonable for wide parquet at 100 TB.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Effective only when THIS process builds the driver JVM (python
        # jobs/x.py, pyspark, tests). Under `spark-submit` the driver is
        # already running before get_spark() executes and this is silently
        # ignored — pass `--driver-memory 16g` on the spark-submit line
        # (the jobs' docstrings say so).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # bucketed-table warehouse (io.write_bucketed_table — the Iceberg
        # hash-distribution-mode analog); kept out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/sparkdoc-warehouse"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
