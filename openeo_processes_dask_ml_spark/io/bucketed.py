"""Bucketed-table sink: pre-shuffled storage for co-located joins.

At 100 TB the dominant join cost is the shuffle of both sides. Writing
the fact tables bucketed on the join key (`DataFrameWriter.bucketBy` +
`saveAsTable`) pays that shuffle ONCE at ingest; every later
equi-join or aggregation on the bucket key reads co-located buckets
and Catalyst plans a sort-merge join with NO Exchange on either side
(verified in tests by asserting the physical plan is Exchange-free).

This is the Spark-native analogue of the reference engine's
hash-partitioned table layout: the bucketing metadata lives in the
session catalog, so `spark.table(name)` recovers the distribution
without re-shuffling. Bucket counts should be sized so one bucket of
the largest table fits an executor core's working memory (e.g. 100 TB
/ 4096 buckets ~ 25 GB per bucket pre-compression — size up
accordingly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets lets the sort-merge join skip its
    sort as well — the join degenerates to a zip of pre-sorted runs."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the same keys/count. With
    ``spark.sql.sources.bucketing.enabled`` (default true) the plan
    contains no Exchange: each task reads bucket i of both sides."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan shuffles — the negative assertion for
    co-located joins."""
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()
