"""Partitioning helpers.

``spread`` exists because the driver's tables are single parquet files
-> one input split -> any CPU-bound operator downstream runs on ONE
core. One cheap round-robin shuffle of the (small) side buys
full-cluster parallelism; at real scale inputs arrive pre-split and the
call costs one extra exchange of an already-shuffled stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism * factor)
