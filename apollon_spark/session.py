"""SparkSession factory tuned for the engine.

Local mode is a single JVM; on a real cluster the same configs apply,
with ``spark.sql.shuffle.partitions`` sized to ~2-3x total cores and AQE
coalescing down at runtime.
"""
from __future__ import annotations

import os
import pathlib

from pyspark.sql import SparkSession

# Repo root — shipped via --py-files on a real cluster; in local mode the
# forked Python workers need it on PYTHONPATH to unpickle our UDFs.
_PKG_ROOT = str(pathlib.Path(__file__).resolve().parent.parent)


def get_spark(
    app_name: str = "apollon_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    Args:
        app_name: Spark application name.
        cpus: parallelism for local mode (int or "*" ). Defaults to
            ``$SPARK_GRAFT_CPUS`` or all cores.
        shuffle_partitions: defaults to max(2*cores, 32) locally. On a
            cluster this would be ~2-3x total executor cores; AQE
            coalesces small partitions at runtime either way.
        extra_conf: additional config overrides.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    n_cores = os.cpu_count() or 8 if cpus in ("*", None) else int(cpus)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * n_cores, 32)

    existing = os.environ.get("PYTHONPATH", "")
    if _PKG_ROOT not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{_PKG_ROOT}{os.pathsep}{existing}" if existing else _PKG_ROOT)

    # One BLAS thread per Python worker: task-level parallelism comes
    # from Spark; letting every worker spin up a full OpenBLAS/OMP
    # thread pool oversubscribes the box and destroys scaling.
    worker_env = {
        "OMP_NUM_THREADS": "1",
        "OPENBLAS_NUM_THREADS": "1",
        "MKL_NUM_THREADS": "1",
        "NUMEXPR_NUM_THREADS": "1",
        # glibc tuning for the vectorized-UDF allocation pattern (large
        # short-lived numpy buffers every Arrow batch): without these,
        # every free() trims the heap and the next batch re-faults the
        # same pages — ~8 minor faults per segment, and the kernel
        # fault path contends badly at high worker counts (measured
        # 10x sys-time inflation at 32 workers, 67x fault reduction
        # with the thresholds set).
        "MALLOC_MMAP_THRESHOLD_": "268435456",
        "MALLOC_TRIM_THRESHOLD_": "536870912",
        "MALLOC_TOP_PAD_": "134217728",
        "MALLOC_ARENA_MAX": "2",
    }
    for var, val in worker_env.items():
        os.environ.setdefault(var, val)

    # SPARK_GRAFT_MASTER: run against a real cluster (e.g. a standalone
    # master URL) instead of in-process local mode. cpus then means the
    # TOTAL executor cores the job should assume for sizing.
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # big Arrow batches amortize the Python<->JVM boundary for the
        # pandas-UDF feature kernels (each batch = many whole docs)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # parquet scans: allow splitting large files across tasks
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    # on a real cluster the workers don't inherit the driver env
    for var, val in worker_env.items():
        builder = builder.config(f"spark.executorEnv.{var}", val)
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread_compact(df, min_ratio: int = 1):
    """Round-robin repartition a DataFrame IF it has fewer partitions
    than ``min_ratio * defaultParallelism`` — the compact-input guard
    for CPU-heavy per-doc stages (EM, cdim, fused onsets): one small
    parquet file is ONE scan partition, which would serialize the
    whole stage into a single task. At real scale inputs carry at
    least cores-many partitions and this is a no-op, preserving the
    zero-shuffle plan."""
    par = df.sparkSession.sparkContext.defaultParallelism * min_ratio
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
