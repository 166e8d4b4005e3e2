"""Runtime bloom-filter join pruning — the 100 TB semi-join-reduction
lever (SCALE.md): when a selective dimension side feeds a shuffle join,
Spark injects a bloom_filter_agg on the creation side and a
might_contain predicate into the fact side's scan stage, so fact rows
that cannot match die before the exchange. Local SFs sit under the
default 10 GB application-side threshold, so the pin lowers it to 0 —
the production default would fire on its own at 100 TB. Conf-override
pins clearCache() first (CLAUDE.md: a cached InMemoryRelation splices
its OLD physical plan into the new build) and restore every conf."""

from __future__ import annotations

from contextlib import contextmanager

from tests.conftest import SF_MEDIUM


@contextmanager
def _conf(spark, **kv):
    keys = {k.replace("__", "."): v for k, v in kv.items()}
    old = {}
    for k, v in keys.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    spark.catalog.clearCache()
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


from test_plans import plan_of as _plan  # one plan-rendering helper


def _selective_join(spark):
    from cqlcopy_spark.catalog import table

    li = table(spark, SF_MEDIUM, "lineitem")
    o = table(spark, SF_MEDIUM, "orders").filter("o_orderpriority = '1-URGENT'")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )


def test_runtime_bloom_filter_prunes_fact_side(spark):
    with _conf(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold="0",
    ):
        p = _plan(_selective_join(spark))
        assert "bloom_filter_agg" in p, p
        assert "might_contain" in p, p
        with_bloom = _selective_join(spark).collect()

    # disabled → no injection, identical results (the filter is an
    # optimization, never a semantics change)
    with _conf(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__optimizer__runtime__bloomFilter__enabled="false",
    ):
        p = _plan(_selective_join(spark))
        assert "bloom_filter_agg" not in p and "might_contain" not in p, p
        without_bloom = _selective_join(spark).collect()

    assert sorted(map(tuple, with_bloom)) == sorted(map(tuple, without_bloom))
