"""SparkSession construction with engine-appropriate defaults."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> str:
    """Ship marlin_spark to executors (the `spark-submit --py-files` analog
    for interactively-built sessions). Without this, pandas_udf closures
    referencing the package fail to unpickle on workers unless the driver
    happens to run from the repo root."""
    import marlin_spark

    pkg_dir = os.path.dirname(os.path.abspath(marlin_spark.__file__))
    if not os.path.isdir(pkg_dir):
        # already running from a --py-files zip: workers get it from
        # spark-submit, nothing to ship
        return ""
    tmp = tempfile.mkdtemp(prefix="marlin_spark_ship_")
    zip_path = shutil.make_archive(
        os.path.join(tmp, "marlin_spark"), "zip", os.path.dirname(pkg_dir), "marlin_spark"
    )
    spark.sparkContext.addPyFile(zip_path)
    return zip_path


def get_spark(
    app_name: str = "marlin_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a session with AQE + Arrow enabled.

    In production this runs under ``spark-submit --py-files marlin_spark.zip``
    against a real cluster; locally ``master`` defaults to ``local[N]`` from
    $SPARK_GRAFT_CPUS. Shuffle partitions default to 2x cores locally —
    at cluster scale set it to O(2-3x total executor cores).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    master = master or os.environ.get("SPARK_MASTER") or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(master[master.find("[") + 1 : -1]) if "[" in master else cpus
        shuffle_partitions = max(8, 2 * (os.cpu_count() if "*" in master else n))
    local_dir = os.environ.get("SPARK_LOCAL_DIRS") or (
        "/dev/shm/spark_local" if os.path.isdir("/dev/shm") else None
    )
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches: ~2x on the numpy block builder vs the
        # 10k default (fewer python round-trips + pandas allocations)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config(
            "spark.ui.enabled",
            os.environ.get("MARLIN_SPARK_UI", "false"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if local_dir:
        # shuffle/spill on tmpfs: models cluster-local NVMe; one shared
        # VM disk would otherwise serialize every shuffle in local mode
        b = b.config("spark.local.dir", local_dir)
    if not os.environ.get("MARLIN_NO_ALLOC_TUNE"):
        # python workers inherit these from the executor JVM at exec()
        # time, before their first allocation (see _alloc.py)
        from marlin_spark._alloc import EXECUTOR_ENV

        for k, v in EXECUTOR_ENV.items():
            b = b.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
