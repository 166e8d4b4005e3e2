"""timeseries_interpolate semantics on a hand-computed series: linear
fill between bracketing hourly closes, exact at observed points, no
rows outside each user's [first, last] hour span, and the per-hour
observed point is the CLOSE (latest (ts, event_id)) pick.
"""

from __future__ import annotations

import datetime

from cqlcopy_spark.plans.registry import all_queries

QUERIES = all_queries()


def _ts(h, m=0):
    return datetime.datetime(2024, 3, 1, h, m)


def test_interpolate_hand_computed(spark, tmp_path):
    sf = str(tmp_path / "sf")
    rows = [
        # user 1: observed at hours 0, 3, 4 — gap 1..2 interpolated on
        # the 10 -> 40 segment; hour 0 has TWO events, close (ts 0:45)
        # must win the pick
        (1, _ts(0, 30), 1, "a", 99.0, "{}"),
        (2, _ts(0, 45), 1, "a", 10.0, "{}"),
        (3, _ts(3, 0), 1, "a", 40.0, "{}"),
        (4, _ts(4, 0), 1, "a", 8.0, "{}"),
        # user 2: single observed hour — one row, no interpolation
        (5, _ts(7, 15), 2, "b", 5.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    got = {
        (r["user_id"], r["hour"].hour): (r["observed"], r["ivalue"])
        for r in QUERIES["timeseries_interpolate"](spark, sf).collect()
    }
    assert got == {
        (1, 0): (1, 10.0),
        (1, 1): (0, 10.0 + (40.0 - 10.0) * (1.0 / 3.0)),
        (1, 2): (0, 10.0 + (40.0 - 10.0) * (2.0 / 3.0)),
        (1, 3): (1, 40.0),
        (1, 4): (1, 8.0),
        (2, 7): (1, 5.0),
    }
