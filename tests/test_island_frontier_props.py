"""Property tests (SURVEY.md §5) for the order-sensitive composition
operators added with the profiling batch: interval-union islands,
nearest-direction as-of, and the Pareto skyline. The fixtures exercise
one realized input; hypothesis searches the structural corner space —
containment chains, zero-length intervals, equal timestamps, dominance
ties — against brute-force reference implementations.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ---------------------------------------------------------------------------
# reference implementations (quadratic, obviously-correct)
# ---------------------------------------------------------------------------


def _ref_islands(intervals: list[tuple[int, int]]) -> list[tuple[int, int, int]]:
    """Closed-interval union by sweep: (start, end, n_members) islands."""
    out: list[tuple[int, int, int]] = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            ps, pe, n = out[-1]
            out[-1] = (ps, max(pe, e), n + 1)
        else:
            out.append((s, e, 1))
    return out


def _ref_skyline(pts: list[tuple[int, float, int]]) -> set[int]:
    """ids of points not dominated on (min price, max size)."""
    keep = set()
    for i, p, s in pts:
        dominated = any(
            (q <= p and t >= s and (q < p or t > s)) for _, q, t in pts
        )
        if not dominated:
            keep.add(i)
    return keep


# ---------------------------------------------------------------------------
# intervals_merge core (same expressions as the operator, synthetic rows)
# ---------------------------------------------------------------------------

_iv = st.tuples(
    st.integers(min_value=0, max_value=50),
    st.integers(min_value=0, max_value=30),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_iv, min_size=1, max_size=14))
def test_interval_islands_match_sweep(spark, ivs):
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col
    from pyspark.sql.window import Window

    rows = [(1, i, s, s + d) for i, (s, d) in enumerate(ivs)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, s_us long, e_us long"
    )
    order = ["s_us", "e_us", "event_id"]
    prev = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    new_i = F.when(F.max("e_us").over(prev) >= col("s_us"), 0).otherwise(1)
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    got = (
        df.withColumn("new_i", new_i)
        .withColumn("island_id", F.sum("new_i").over(run))
        .groupBy("user_id", "island_id")
        .agg(
            F.min("s_us").alias("start_us"),
            F.max("e_us").alias("end_us"),
            F.count("*").alias("n"),
        )
        .orderBy("island_id")
        .collect()
    )
    want = _ref_islands([(s, e) for _, _, s, e in rows])
    assert [(r["start_us"], r["end_us"], r["n"]) for r in got] == want
    # islands are disjoint with gaps between them
    for a, b in zip(got, got[1:]):
        assert b["start_us"] > a["end_us"]


# ---------------------------------------------------------------------------
# skyline core (operator expressions on synthetic parts)
# ---------------------------------------------------------------------------

_pt = st.tuples(
    st.integers(min_value=0, max_value=6),  # price in small colliding domain
    st.integers(min_value=0, max_value=6),  # size
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_pt, min_size=1, max_size=12))
def test_skyline_matches_dominance_scan(spark, pts):
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col
    from pyspark.sql.window import Window

    rows = [(i, float(p), s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "p_partkey long, p_retailprice double, p_size int")
    pmax = df.groupBy("p_retailprice").agg(F.max("p_size").alias("pmax"))
    prev = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    thresh = pmax.withColumn("prev_max", F.max("pmax").over(prev))
    keep = (col("p_size") == col("pmax")) & (
        col("prev_max").isNull() | (col("p_size") > col("prev_max"))
    )
    got = {
        r["p_partkey"]
        for r in df.join(F.broadcast(thresh), "p_retailprice").filter(keep).collect()
    }
    assert got == _ref_skyline(rows)


# ---------------------------------------------------------------------------
# nearest as-of invariants on the fixture output
# ---------------------------------------------------------------------------


def test_asof_nearest_fixture_invariants(spark):
    """Every matched purchase points at a real view; distance to the
    match is minimal over all views of that user; ties at equal
    distance resolve to the prior ('b') side."""
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.plans.registry import all_queries

    from tests.conftest import SF_SMALL

    out = all_queries()["join_asof_nearest"](spark, SF_SMALL).collect()
    from pyspark.sql import functions as F

    e = table(spark, SF_SMALL, "events")
    views = {}
    for r in (
        e.filter(F.col("event_type") == "view")
        .select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .collect()
    ):
        views.setdefault(r["user_id"], []).append(r["us"])
    matched = 0
    for r in out:
        vs = views.get(r["user_id"], [])
        if r["near_us"] is None:
            assert not vs
            continue
        matched += 1
        assert r["near_us"] in vs
        best = min(abs(v - r["us"]) for v in vs)
        assert abs(r["near_us"] - r["us"]) == best
        if r["direction"] == "f":
            # a backward view at the same distance would have won
            assert all(
                r["us"] - v != best for v in vs if v <= r["us"]
            )
    assert matched > 0
