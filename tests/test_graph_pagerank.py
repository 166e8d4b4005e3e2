"""graph_pagerank numeric contract: the distributed loop must agree
with a pure-Python PageRank on the same edge list to float tolerance
(the driver's check is rows-only — this test is the real gate, same
pattern as the BPE trainer's reference parity)."""

from __future__ import annotations

import pytest

from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

DAMPING = 0.85
ITERATIONS = 8


def _ref_pagerank(edges: list[tuple[str, str, int]]) -> dict[str, float]:
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    out_w: dict[str, float] = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(ITERATIONS):
        contrib: dict[str, float] = {}
        for s, d, w in edges:
            contrib[d] = contrib.get(d, 0.0) + pr[s] * (w / out_w[s])
        pr = {v: (1 - DAMPING) / n + DAMPING * contrib.get(v, 0.0) for v in nodes}
    return pr


@pytest.fixture(scope="module")
def spark_result(spark):
    from cqlcopy_spark.operators.graph import link_edges

    got = {
        r["node"]: r["pr"]
        for r in all_queries()["graph_pagerank"](spark, SF_SMALL).collect()
    }
    edges = [
        (r["src"], r["dst"], r["weight"])
        for r in link_edges(spark, SF_SMALL).collect()
    ]
    return got, edges


def test_pagerank_matches_reference(spark_result):
    got, edges = spark_result
    want = _ref_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_pagerank_is_a_distribution(spark_result):
    got, _ = spark_result
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)
    assert all(p > 0 for p in got.values())


def test_pagerank_rank_spread(spark_result):
    """The synthetic graph is NOT regular — ranks must actually spread,
    otherwise the loop degenerated to the teleport floor."""
    got, _ = spark_result
    assert max(got.values()) > 1.3 * min(got.values())
