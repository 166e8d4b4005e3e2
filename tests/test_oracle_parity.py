"""Differential test: every registered query with an oracle must match
DuckDB exactly at sf0.001 (driver runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from cqlcopy_spark.plans.registry import all_oracles, all_queries
from tests.conftest import SF_SMALL
from tests.oracle_harness import compare, run_oracle

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    want = run_oracle(ORACLES[name], SF_SMALL)
    problems = compare(df, want)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
