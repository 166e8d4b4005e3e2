"""similarity_ivfpq (composed IVF + residual-PQ ADC) semantics: the
verify twin is empty on the real fixture, recall holds a floor vs the
exact top-k, a planted near-duplicate of a query is retrieved at rank 1
(it lands in the query's own nearest cell — always probed — with
near-identical residual codes), and the composed index respects the
per-query output contract."""

from __future__ import annotations

import random

from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM

QUERIES = all_queries()


def test_ivfpq_verify_empty(spark):
    """Zero refine-exactness violations — the driver's empty-relation
    contract. Checker liveness for the shared _ann_violations is pinned
    in tests/test_ann_recall.py."""
    assert QUERIES["similarity_ivfpq_verify"](spark, SF_MEDIUM).count() == 0


def test_ivfpq_recall_floor(spark):
    exact = {
        (r.q_id, r.n_id)
        for r in QUERIES["similarity_topk"](spark, SF_MEDIUM).collect()
    }
    approx = {
        (r.q_id, r.n_id)
        for r in QUERIES["similarity_ivfpq"](spark, SF_MEDIUM).collect()
    }
    recall = len(exact & approx) / len(exact)
    # measured 0.40 on this fixture: near-random embeddings through BOTH
    # approximations (nprobe=2/16 cell misses AND 4-bit residual codes) —
    # the same floor the single-approximation ANN variants pin
    assert recall >= 0.2, f"ivfpq recall={recall:.2f} < 0.2"


def test_ivfpq_planted_neighbor_rank1(spark, tmp_path):
    from cqlcopy_spark.operators.similarity import _N_QUERIES

    rng = random.Random(88014)
    rows = []
    queries = []
    for q in range(_N_QUERIES):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        queries.append(v)
        rows.append((q, v, 0))
    for q, v in enumerate(queries):  # planted near-dup: tiny perturbation
        rows.append((100 + q, [x + rng.uniform(-1e-3, 1e-3) for x in v], 0))
    for i in range(200, 500):  # background corpus
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)], 0))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )

    out = QUERIES["similarity_ivfpq"](spark, str(tmp_path)).collect()
    rank1 = {r.q_id: r.n_id for r in out if r.rank == 1}
    for q in range(_N_QUERIES):
        assert rank1.get(q) == 100 + q, (q, rank1.get(q))
    per_q = {}
    for r in out:
        per_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
        assert len(ranks) <= 5


def test_ivfpq_candidates_only_from_probed_cells(spark):
    """The IVF cut is real: every emitted neighbor's cell must be one of
    its query's probed cells (recomputed independently from the same
    deterministic fit)."""
    import numpy as np

    from cqlcopy_spark.operators.similarity import (
        _IVF_NPROBE,
        _collect_queries,
        _emb_double,
        _ivfpq_fit,
    )
    from cqlcopy_spark.catalog import table
    from pyspark.sql.functions import col

    coarse, _, enc = _ivfpq_fit(spark, SF_MEDIUM)
    cell_of = {r.vec_id: r.cell for r in enc.select("vec_id", "cell").collect()}
    e = table(spark, SF_MEDIUM, "embeddings").select(
        "vec_id", _emb_double("embedding").alias("emb")
    )
    probed = {}
    for q_id, x, _ in _collect_queries(e):
        d2 = ((coarse - x) ** 2).sum(axis=1)
        probed[q_id] = {int(c) for c in np.argsort(d2)[:_IVF_NPROBE]}
    for r in QUERIES["similarity_ivfpq"](spark, SF_MEDIUM).collect():
        assert cell_of[r.n_id] in probed[r.q_id], (r.q_id, r.n_id)
