"""SparkSession factory tuned for the datacube/ML workload.

Scale posture: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (every ML stage crosses the Python boundary in
vectorized batches), and shuffle partitions sized from the environment so
the same code runs local[32] in tests and 1000-executor clusters in
production without edits.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "openeo-ml-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def configure_for_inference(spark: SparkSession, batch_size: int) -> None:
    """1 Arrow batch = 1 model batch — the Spark analog of the reference's
    1-chunk-per-batch rechunk (data_model.py:647-664, 1056-1057)."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
