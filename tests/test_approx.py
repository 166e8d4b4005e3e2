"""Sketch aggregates must land within their documented error bounds of
the exact operators they substitute for at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM


def test_approx_distinct_within_rsd(spark):
    approx = {
        r["o_orderpriority"]: r["approx_customers"]
        for r in all_queries()["agg_approx"](spark, SF_MEDIUM).collect()
    }
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in table(spark, SF_MEDIUM, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(0.05 * n, 2), (k, approx[k], n)


def test_approx_median_within_tolerance(spark):
    approx = {
        r["o_orderpriority"]: r["approx_median_price"]
        for r in all_queries()["agg_approx"](spark, SF_MEDIUM).collect()
    }
    exact = {
        r["o_orderpriority"]: r["m"]
        for r in table(spark, SF_MEDIUM, "orders")
        .groupBy("o_orderpriority")
        .agg(F.expr("percentile(o_totalprice, 0.5)").alias("m"))
        .collect()
    }
    for k, m in exact.items():
        assert abs(approx[k] - m) / m < 0.05, (k, approx[k], m)
