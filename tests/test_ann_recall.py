"""ANN recall floors: the approximate similarity paths must actually
find a usable fraction of the true neighbors. Both pipelines are fully
deterministic (hash-derived planes / seeded k-means), so these are
stable assertions, not flaky statistical ones."""

from __future__ import annotations

import pytest

from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM

QUERIES = all_queries()


def _pairs(spark, name):
    return {(r["q_id"], r["n_id"]) for r in QUERIES[name](spark, SF_MEDIUM).collect()}


@pytest.mark.parametrize(
    "ann,floor",
    [("similarity_ann_lsh", 0.2), ("similarity_ann_ivf", 0.2)],
)
def test_ann_recall_floor(spark, ann, floor):
    exact = _pairs(spark, "similarity_topk")
    approx = _pairs(spark, ann)
    recall = len(exact & approx) / len(exact)
    assert recall >= floor, f"{ann} recall@{5}={recall:.2f} < {floor}"
