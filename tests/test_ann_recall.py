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


def test_blocked_embedding_dedup_recall_and_precision(spark):
    """Cell-blocked near-dup must be a strict SUBSET of the exact
    block-pair answer (within-cell cosines are exact — no false pairs)
    with recall above the floor its 2-cell multi-assignment buys.
    Deterministic end-to-end, so these are stable assertions."""
    exact = {
        (r["v1"], r["v2"])
        for r in QUERIES["dedup_embedding_cosine"](spark, SF_MEDIUM).collect()
    }
    blocked = {
        (r["v1"], r["v2"])
        for r in QUERIES["dedup_embedding_blocked"](spark, SF_MEDIUM).collect()
    }
    assert blocked <= exact  # precision 1.0 by construction
    recall = len(blocked & exact) / len(exact)
    assert recall >= 0.5, f"recall={recall:.2f}"
