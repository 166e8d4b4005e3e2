"""Bucketed tables: pre-shuffled storage layout for co-located joins.

Bucketing is the write-once-join-many optimization: both tables are
hash-partitioned into the same number of buckets on the join key AT
WRITE TIME, so every later join/aggregation on that key reads
co-located buckets and skips the shuffle entirely. At 100 TB this is
the difference between an exabyte of lifetime shuffle traffic and none —
the layout decision the engine must support, hence this pinned test.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from tests.conftest import SF_SMALL
from tests.test_plans import plan_of, shuffle_exchanges


def test_bucketed_join_skips_shuffle(spark):
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    # At sf0.001 the broadcast join would win and ignore bucketing; turn
    # it off so the test exercises the big-big (sort-merge) path where
    # bucketing matters.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("orders_bucketed"),
            col("l_orderkey") == col("o_orderkey"),
        )
        p = plan_of(joined)
        assert shuffle_exchanges(p) == 0, p  # both sides read pre-bucketed
        assert "SelectedBucketsCount" in p, p
        # same rows as the shuffled join over the raw tables
        plain = li.join(orders, col("l_orderkey") == col("o_orderkey"))
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_agg_skips_shuffle(spark):
    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .saveAsTable("li_bucketed_agg")
    )
    try:
        agg = spark.table("li_bucketed_agg").groupBy("l_orderkey").count()
        p = plan_of(agg)
        assert shuffle_exchanges(p) == 0, p  # grouping key == bucket key
        assert agg.count() == li.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
