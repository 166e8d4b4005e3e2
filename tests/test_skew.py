"""Salted join / salted aggregation must be EXACTLY equivalent to their
plain counterparts — salting redistributes work, never changes results."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.functions.portable import dsum
from cqlcopy_spark.functions.skew import salted_join, salted_sum
from tests.conftest import SF_SMALL


def _canon(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_salted_join_equals_plain_join(spark):
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    orders = table(spark, SF_SMALL, "orders").select(
        col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, on=["l_orderkey"])
    salted = salted_join(
        li, orders, on=["l_orderkey"], probe_unique_col="l_linenumber", n_salts=8
    )
    import pandas as pd

    pd.testing.assert_frame_equal(_canon(plain), _canon(salted))


def test_salted_join_replicates_build_not_probe(spark):
    li = table(spark, SF_SMALL, "lineitem")
    orders = table(spark, SF_SMALL, "orders").select(
        col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    salted = salted_join(
        li, orders, on=["l_orderkey"], probe_unique_col="l_linenumber", n_salts=8
    )
    assert salted.count() == li.join(orders, on=["l_orderkey"]).count()


def test_salted_sum_bitwise_equals_dsum(spark):
    li = table(spark, SF_SMALL, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        dsum(col("l_extendedprice")).alias("total")
    )
    salted = salted_sum(
        li,
        key="l_returnflag",
        value=col("l_extendedprice"),
        alias="total",
        unique_col="l_orderkey",
        n_salts=8,
    )
    a = {r["l_returnflag"]: r["total"] for r in plain.collect()}
    b = {r["l_returnflag"]: r["total"] for r in salted.collect()}
    assert a == b  # exact float equality: decimal addition is associative
