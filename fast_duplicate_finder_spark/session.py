"""SparkSession factory with scale-appropriate defaults.

Local mode is the sandbox proxy for a multi-executor cluster; the config
below (AQE, skew join, Arrow) is exactly what we would ship to a 1000-executor
``spark-submit --py-files`` run, minus cluster-only knobs.
"""

from __future__ import annotations

import os
import pathlib

from pyspark.sql import SparkSession

# Repo root (parent of the package dir) — executors' Python workers must be
# able to import this package to deserialize pandas-UDF closures. On a real
# cluster this is `spark-submit --py-files fdf.zip`; in local mode we
# propagate PYTHONPATH to the worker processes.
_PKG_ROOT = str(pathlib.Path(__file__).resolve().parent.parent)


def get_spark(
    app_name: str = "fast_duplicate_finder_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 8)
    py_path = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_PKG_ROOT}{os.pathsep}{py_path}" if py_path else _PKG_ROOT
        )
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Python workers: 512m default causes kill/respawn (fork-storm) churn
        # under the Arrow kernels; on a cluster this maps to
        # spark.executor.pyspark.memory sizing
        .config("spark.python.worker.memory", "2g")
    )
    # shuffle/spill files on RAM-backed tmpfs when available: virtio disk
    # syscalls in this sandbox dominate kernel time at high parallelism
    # (measured 40% sys during shuffle-heavy stages); a real cluster uses
    # fast local SSDs for the same role
    if os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
