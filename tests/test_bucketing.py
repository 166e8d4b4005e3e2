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


def test_bucketed_snapshot_diff_skips_shuffle(spark):
    """SCALE.md's snapshot_diff lever, proven: two snapshot states
    written bucketed on doc_id full-outer-join with ZERO exchanges —
    the versioned-corpus-store layout turns the diff into a co-located
    bucket zip. (Full outer can never broadcast, so without bucketing
    the doc_id shuffle is unavoidable — this is the only lever.)"""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.curation import (
        _DIFF_ADDED_MOD,
        _DIFF_ADDED_RES,
        _DIFF_EDITED_MOD,
        _DIFF_EDITED_RES,
        _DIFF_REMOVED_MOD,
        _DIFF_REMOVED_RES,
    )

    d = table(spark, SF_SMALL, "documents")
    # same snapshot derivation as the operator (constants imported, not
    # restated), INCLUDING the edited slice's older text revision — the
    # counts compare below
    prev = d.filter(col("doc_id") % _DIFF_ADDED_MOD != _DIFF_ADDED_RES).select(
        col("doc_id").alias("p_doc_id"),
        F.md5(
            F.when(
                col("doc_id") % _DIFF_EDITED_MOD == _DIFF_EDITED_RES,
                F.concat(col("text"), F.lit(" [v1]")),
            ).otherwise(col("text"))
        ).alias("p_hash"),
    )
    cur = d.filter(col("doc_id") % _DIFF_REMOVED_MOD != _DIFF_REMOVED_RES).select(
        "doc_id", F.md5("text").alias("c_hash")
    )
    spark.sql("DROP TABLE IF EXISTS snap_prev")
    spark.sql("DROP TABLE IF EXISTS snap_cur")
    prev.write.mode("overwrite").bucketBy(8, "p_doc_id").sortBy(
        "p_doc_id"
    ).saveAsTable("snap_prev")
    cur.write.mode("overwrite").bucketBy(8, "doc_id").sortBy(
        "doc_id"
    ).saveAsTable("snap_cur")
    try:
        diff = spark.table("snap_cur").join(
            spark.table("snap_prev"),
            col("doc_id") == col("p_doc_id"),
            "full_outer",
        )
        p = plan_of(diff)
        assert shuffle_exchanges(p) == 0, p
        assert "SelectedBucketsCount" in p, p
        # classification agrees with the unbucketed operator's counts
        from cqlcopy_spark.plans.registry import all_queries

        got = diff.select(
            F.when(col("p_doc_id").isNull(), "added")
            .when(col("doc_id").isNull(), "removed")
            .when(col("c_hash") != col("p_hash"), "changed")
            .otherwise("unchanged")
            .alias("status")
        ).groupBy("status").count()
        want = (
            all_queries()["snapshot_diff"](spark, SF_SMALL)
            .groupBy("status")
            .agg(F.sum("n_docs").alias("count"))
        )
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in want.collect()
        }
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_prev")
        spark.sql("DROP TABLE IF EXISTS snap_cur")
