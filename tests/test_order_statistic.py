"""order_statistic_select — multi-level external-quickselect fuzz.

The registered op is fully oracle-checked; this fuzz drives the
factored kernel with tiny (buckets, cap) knobs so several narrowing
levels (and the float-degenerate tie branch) actually execute, and
compares every k against plain sorted()[k-1].
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import SF_SMALL


@pytest.mark.parametrize("seed", [11, 77])
def test_select_kth_matches_sorted_reference(spark, seed):
    from cqlcopy_spark.operators.analytics import _select_kth

    rng = random.Random(seed)
    # heavy duplicates + skewed magnitudes + negatives: boundary-dense
    pool = (
        [rng.uniform(-5, 5) for _ in range(30)]
        + [0.0, -1.25, 3.5]
        + [rng.uniform(1e6, 1e6 + 1) for _ in range(5)]
    )
    data = [rng.choice(pool) for _ in range(800)]
    ref = sorted(data)

    vals = spark.createDataFrame([(v,) for v in data], "val double").persist()
    lo, hi = min(data), max(data)
    # cap 50 / 8 buckets forces >= 2 narrowing levels on 800 rows
    for k in [1, 2, len(data) // 3, (len(data) + 1) // 2, len(data) - 1, len(data)]:
        got = _select_kth(vals, k, lo, hi, buckets=8, cap=50)
        assert got == ref[k - 1], (k, got, ref[k - 1])
    vals.unpersist()


def test_select_kth_massive_tie_degenerate_branch(spark):
    """All rows equal except two outliers: every narrowing level lands
    in the same bucket until the width underflows — the distinct-value
    histogram branch must resolve the selection exactly."""
    from cqlcopy_spark.operators.analytics import _select_kth

    data = [7.25] * 500 + [-1.0, 99.0]
    ref = sorted(data)
    vals = spark.createDataFrame([(v,) for v in data], "val double").persist()
    for k in (1, 2, 300, 501, 502):
        got = _select_kth(vals, k, min(data), max(data), buckets=4, cap=10)
        assert got == ref[k - 1], (k, got)
    vals.unpersist()


def test_order_statistic_op_matches_sorted_fixture(spark):
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.plans.registry import all_queries

    out = {r["stat"]: r for r in all_queries()["order_statistic_select"](spark, SF_SMALL).collect()}
    vals = sorted(
        r["l_extendedprice"]
        for r in table(spark, SF_SMALL, "lineitem").select("l_extendedprice").collect()
    )
    n = len(vals)
    assert out["p50"]["n"] == n and out["p90"]["n"] == n
    assert out["p50"]["value"] == vals[(n + 1) // 2 - 1]
    assert out["p90"]["value"] == vals[(9 * n + 9) // 10 - 1]


def test_empty_input_matches_oracle_degenerate_rows(spark, tmp_path):
    """r12 ADVICE: an all-NULL / empty value column made n == 0 and
    float(None) TypeError'd before the collect-cap guard. The guard
    must mirror the ORACLE's degenerate relation — DuckDB's scalar
    subqueries still emit one row per stat with k = 0, n = 0 and a
    NULL value on empty input (r13 review: an empty frame here would
    rows-mismatch the oracle)."""
    from cqlcopy_spark.operators.analytics import order_statistic_select

    sf = str(tmp_path / "sf_empty")
    src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    src.limit(0).write.parquet(f"{sf}/lineitem.parquet")

    out = order_statistic_select(spark, sf)
    assert out.columns == ["stat", "k", "n", "value"]
    assert [tuple(r) for r in out.collect()] == [
        ("p50", 0, 0, None),
        ("p90", 0, 0, None),
    ]
