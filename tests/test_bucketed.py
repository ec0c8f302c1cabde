"""Bucketed sink: the co-located join must not shuffle."""

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.io.bucketed import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.range(0, 1000).select(
            F.col("id").alias("o_id"), (F.col("id") % 50).alias("cust")
        )
        cust = spark.range(0, 50).select(
            F.col("id").alias("cust"), (F.col("id") * 10).alias("score")
        )
        write_bucketed(orders, "b_orders", ["cust"], n_buckets=4, sort_cols=["cust"])
        write_bucketed(cust, "b_cust", ["cust"], n_buckets=4, sort_cols=["cust"])
        joined = bucketed_join(spark, "b_orders", "b_cust", ["cust"])
        assert joined.count() == 1000
        assert not plan_has_exchange(joined), (
            "bucketed join must read co-located buckets without a shuffle"
        )
        # aggregation on the bucket key is also exchange-free pre-agg:
        agg = spark.table("b_orders").groupBy("cust").agg(F.count("*").alias("n"))
        assert not plan_has_exchange(agg)
        # sanity: the same join on unbucketed frames DOES shuffle
        plain = orders.join(cust, "cust")
        assert plan_has_exchange(plain)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")
