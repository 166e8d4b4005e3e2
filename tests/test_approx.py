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


def test_quantile_sketch_error_bound_and_exact_counts(spark):
    """sketch_quantiles_merge: the merged summary's count is EXACT (the
    HLL-union-is-exact analogue — per-shard weights sum to n_s by
    construction) and every reported quantile's TRUE rank lies within
    rank_err_bound of its target rank ceil(p·N)."""
    import duckdb

    rows = all_queries()["sketch_quantiles_merge"](spark, SF_MEDIUM).collect()
    con = duckdb.connect()
    exact_n = dict(
        con.execute(
            f"SELECT event_type, count(*) FROM '{SF_MEDIUM}/events.parquet' "
            "GROUP BY 1"
        ).fetchall()
    )
    assert len(rows) == len(exact_n)
    for r in rows:
        assert r["n"] == exact_n[r["event_type"]]
        for p in (0.5, 0.9, 0.99):
            est = r[f"p{int(p * 100)}"]
            # the estimate's TIE RUN of ranks must intersect the target
            # window (count(<=est) alone overcounts across duplicates —
            # the property fuzz in test_sketch_property.py found this)
            lo_rank, hi_rank = con.execute(
                f"SELECT count(*) FILTER (value < ?) + 1, "
                f"count(*) FILTER (value <= ?) "
                f"FROM '{SF_MEDIUM}/events.parquet' WHERE event_type = ?",
                [est, est, r["event_type"]],
            ).fetchone()
            import math

            target = math.ceil(p * r["n"])
            b = r["rank_err_bound"]
            assert lo_rank <= target + b and hi_rank >= target - b, (
                r["event_type"], p, est, lo_rank, hi_rank, target, b,
            )


def test_quantile_sketch_bound_holds_under_any_resharding(spark):
    """Mergeability contract: re-partitioning the same rows into a
    DIFFERENT number of shards changes the summaries and (slightly) the
    estimates, but the rank-error bound N/k + S must hold for every
    sharding — that's what makes shard→day→global rollups safe."""
    import math

    import duckdb

    from cqlcopy_spark.operators.analytics import _QSK_K, _quantile_summary

    e = table(spark, SF_MEDIUM, "events").select("event_type", "event_id", "value")
    con = duckdb.connect()
    for s in (1, 4, 16):
        rows = _quantile_summary(e, _QSK_K, s).collect()
        for r in rows:
            for p in (0.5, 0.99):
                est = r[f"p{int(p * 100)}"]
                lo_rank, hi_rank = con.execute(
                    f"SELECT count(*) FILTER (value < ?) + 1, "
                    f"count(*) FILTER (value <= ?) "
                    f"FROM '{SF_MEDIUM}/events.parquet' WHERE event_type = ?",
                    [est, est, r["event_type"]],
                ).fetchone()
                target = math.ceil(p * r["n"])
                b = r["rank_err_bound"]
                assert lo_rank <= target + b and hi_rank >= target - b, (s, r)


def test_heavy_hitters_bounds_contain_truth_under_any_resharding(spark):
    """sketch_heavy_hitters: for every reported item and EVERY sharding,
    the true count lies in [est, upper_bound] (est is a certain lower
    bound — kept per-shard counts are exact; upper adds the drop
    thresholds of shards that lost the item). s=1 degenerates to exact
    top-k: est == true and upper == est."""
    import duckdb

    from cqlcopy_spark.operators.analytics import _HH_K, _heavy_hitters

    e = table(spark, SF_MEDIUM, "events").select("event_id", "user_id")
    con = duckdb.connect()
    exact = dict(
        con.execute(
            f"SELECT user_id, count(*) FROM '{SF_MEDIUM}/events.parquet' "
            "GROUP BY 1"
        ).fetchall()
    )
    for s in (1, 4, 16):
        rows = _heavy_hitters(e, _HH_K, s, 10).collect()
        assert len(rows) == 10
        for r in rows:
            true = exact[r["user_id"]]
            assert r["est"] <= true <= r["upper_bound"], (s, r, true)
            if s == 1:
                assert r["est"] == true == r["upper_bound"]
