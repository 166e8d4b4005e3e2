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


def test_stop_gram_cap_bounds_adversarial_candidates(spark):
    """A boilerplate 3-gram shared by every document would alone generate
    D²/2 candidate pairs (Σ df(g)² blow-up); the stop-gram df-cap must
    drop it from the inverted index while true duplicate pairs — which
    share RARE grams too — still surface with their filtered-universe
    Jaccard. And on a corpus with no gram over the cap, the filter must
    be a no-op (oracle-parity invariant)."""
    from cqlcopy_spark.operators.dedup import _ngram_jaccard_pairs

    # 7 boilerplate tokens + 1 unique: 5 of 6 grams shared between any
    # two boilerplate docs → pairwise J = 5/7 ≥ 0.5 when grams count
    boiler = "click here to subscribe now please today"
    docs = [(i, f"{boiler} unique{i}") for i in range(40)]
    # two exact clones: share rare grams, must be found
    docs.append((100, "alpha beta gamma delta epsilon"))
    docs.append((101, "alpha beta gamma delta epsilon"))
    d = spark.createDataFrame(docs, "doc_id long, text string")

    capped = _ngram_jaccard_pairs(d, df_cap=10).collect()
    pairs = {(r["d1"], r["d2"]) for r in capped}
    assert (100, 101) in pairs
    jac = {(r["d1"], r["d2"]): r["jaccard"] for r in capped}[(100, 101)]
    assert jac == 1.0
    # the 40 boilerplate docs share ONLY over-cap grams → no pair among
    # them survives (the C(40,2)=780 candidate explosion never happens)
    assert not any(a < 40 and b < 40 for a, b in pairs)

    # no-op below the cap: same corpus, cap above every df
    uncapped = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in _ngram_jaccard_pairs(d, df_cap=10_000).collect()
    }
    # boilerplate-only pairs now appear (shared grams count), clones too
    assert (100, 101, 1.0) in uncapped
    assert len(uncapped) > len(pairs)
