"""join_asof_tolerance — staleness-bound contracts on top of join_asof
(value semantics are fully oracle-checked; these pin the composition)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_tolerance_composes_on_asof(spark):
    from cqlcopy_spark.operators.temporal_joins import _ASOF_TOL_US
    from cqlcopy_spark.plans.registry import all_queries

    qs = all_queries()
    base = {r["event_id"]: r for r in qs["join_asof"](spark, SF_SMALL).collect()}
    tol = qs["join_asof_tolerance"](spark, SF_SMALL).collect()

    assert len(tol) == len(base)  # left semantics: every probe row survives
    n_live = 0
    for r in tol:
        b = base[r["event_id"]]
        if r["gap_us"] is not None:
            n_live += 1
            assert 0 <= r["gap_us"] <= _ASOF_TOL_US
            assert r["view_ts"] == b["view_ts"]
            assert r["view_value"] == b["view_value"]
        else:
            # stale or never-matched: all three match columns NULL
            assert r["view_ts"] is None and r["view_value"] is None
            if b["view_ts"] is not None:
                gap = (b["ts"] - b["view_ts"]).total_seconds() * 1_000_000
                assert gap > _ASOF_TOL_US
    assert 0 < n_live < len(tol), "fixture must split live/stale"
