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


def test_pagerank_verify_empty_on_honest_ranks(spark):
    """graph_pagerank_verify must emit ZERO violations for the real op
    output (this is the relation the driver hash-compares against the
    empty oracle)."""
    out = all_queries()["graph_pagerank_verify"](spark, SF_SMALL)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["kind", "node", "metric"]


@pytest.mark.parametrize(
    "corrupt, expect_kind",
    [
        # scaling the whole vector breaks mass conservation
        (lambda F, pr: pr.withColumn("pr", F.col("pr") * 1.5), "mass_not_one"),
        # zeroing one node drops it under the teleport floor
        (
            lambda F, pr: pr.withColumn(
                "pr",
                F.when(F.col("node") == "src0", F.lit(0.0)).otherwise(F.col("pr")),
            ),
            "below_teleport_floor",
        ),
        # dropping a node breaks node-set parity
        (lambda F, pr: pr.filter(F.col("node") != "src0"), "missing_node"),
        # renaming a node to an off-graph id is an extra + a missing
        (
            lambda F, pr: pr.withColumn(
                "node",
                F.when(F.col("node") == "src0", F.lit("ghost")).otherwise(
                    F.col("node")
                ),
            ),
            "extra_node",
        ),
    ],
)
def test_pagerank_verify_liveness(spark, corrupt, expect_kind):
    """Planted corruptions must turn the verify relation NON-empty with
    the expected violation kind — proving the invariants can actually
    fire (the same liveness discipline as similarity_ann_verify's)."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.graph import (
        _pagerank_violations,
        graph_pagerank,
    )

    pr = graph_pagerank(spark, SF_SMALL)
    out = _pagerank_violations(spark, SF_SMALL, corrupt(F, pr))
    kinds = {r["kind"] for r in out.collect()}
    assert expect_kind in kinds, kinds


def test_pagerank_empty_graph_guard(spark, tmp_path):
    """An EMPTY link graph (zero documents) must yield the empty rank
    vector and an empty violations relation — not ZeroDivisionError
    from the 1/n teleport term (r8 ADVICE). A claimed nonempty vector
    over the empty graph must still violate (every node is extra)."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.graph import (
        _pagerank_violations,
        graph_pagerank,
        graph_pagerank_verify,
    )

    sf = str(tmp_path / "sf_empty")
    spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")

    pr = graph_pagerank(spark, sf)
    assert pr.count() == 0
    assert [f.name for f in pr.schema.fields] == ["node", "pr"]
    assert graph_pagerank_verify(spark, sf).count() == 0

    fake = spark.createDataFrame([("ghost", 1.0)], "node string, pr double")
    kinds = {r["kind"] for r in _pagerank_violations(spark, sf, fake).collect()}
    assert kinds == {"extra_node"}
