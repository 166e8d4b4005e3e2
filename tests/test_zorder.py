"""zorder_layout: the multi-dimension data-skipping claim, quantified.

A Z-ordered file covers a narrow range of BOTH clustering dimensions;
a single-dimension sort gives perfect ranges on its sort key and
near-full-extent ranges on the other. These tests pin the actual
numbers, so the operator's 100 TB story (min/max stats prune point
queries on either dimension) is measured, not asserted.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM

QUERIES = all_queries()
_FULL = 65535.0


def _avg_spans(rows):
    s1 = sum((r["d1_max"] - r["d1_min"]) / _FULL for r in rows) / len(rows)
    s2 = sum((r["d2_max"] - r["d2_min"]) / _FULL for r in rows) / len(rows)
    return s1, s2


def test_zorder_files_cover_narrow_ranges_on_both_dims(spark):
    rows = QUERIES["layout_zorder_stats"](spark, SF_MEDIUM).collect()
    assert len(rows) > 8  # the prefix bucketing actually splits files
    s1, s2 = _avg_spans(rows)
    # both dimensions clustered at once — the whole point of Z-order
    assert s1 < 0.35, s1
    assert s2 < 0.35, s2


def test_zorder_prunes_point_queries_better_than_linear_sort(spark):
    """Point-query pruning on the NON-SORT dimension: with a linear
    (d2-sorted) layout nearly every file's d1 range straddles any
    probe; with Z-order only a small fraction do. Files are equalized
    by count (ntile over the z/linear order) so the comparison is
    layout-only."""
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.operators.formats import _Z_BITS

    top = (1 << _Z_BITS) - 1
    raw = table(spark, SF_MEDIUM, "events").select(
        "event_id",
        col("user_id").alias("r1"),
        F.floor(
            F.unix_micros(col("ts").cast("timestamp")) / F.lit(3_600_000_000)
        ).alias("r2"),
    )
    ext = raw.agg(
        F.min("r1").alias("lo1"),
        F.greatest(F.max("r1") - F.min("r1"), F.lit(1)).alias("sp1"),
        F.min("r2").alias("lo2"),
        F.greatest(F.max("r2") - F.min("r2"), F.lit(1)).alias("sp2"),
    )
    d = raw.crossJoin(F.broadcast(ext)).select(
        F.floor((col("r1") - col("lo1")) * top / col("sp1")).alias("d1"),
        F.floor((col("r2") - col("lo2")) * top / col("sp2")).alias("d2"),
    )
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z + F.shiftleft(F.shiftright(col("d1"), i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(col("d2"), i).bitwiseAND(1), 2 * i + 1)

    n_files = 32

    def file_stats(order_col):
        from pyspark.sql.window import Window

        w = Window.orderBy(order_col)
        return (
            d.withColumn("f", F.ntile(n_files).over(w))
            .groupBy("f")
            .agg(F.min("d1").alias("mn"), F.max("d1").alias("mx"))
            .collect()
        )

    probes = [4096 * i + 17 for i in range(16)]

    def hit_fraction(stats):
        hits = sum(
            1 for r in stats for p in probes if r["mn"] <= p <= r["mx"]
        )
        return hits / (len(stats) * len(probes))

    z_frac = hit_fraction(file_stats(z))
    linear_frac = hit_fraction(file_stats(col("d2")))
    # Z-order: a d1 point query touches a minority of files; a d2-sorted
    # layout leaves d1 unclustered so nearly every file matches
    assert z_frac < 0.5 * linear_frac, (z_frac, linear_frac)
    assert linear_frac > 0.8, linear_frac
