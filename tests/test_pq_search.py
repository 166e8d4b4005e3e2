"""embedding_pq_topk (ADC retrieval) semantics: refine-exactness verify
twin is empty on the real fixture, recall holds a floor vs the exact
top-k, a planted near-duplicate of a query is retrieved at rank 1, and
the output contract (≤k rows per query, consistent ranks) holds."""

from __future__ import annotations

import random

from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM

QUERIES = all_queries()


def test_pq_search_verify_empty(spark):
    """Zero violations on the real fixture — the same contract the
    driver hash-checks against the empty-relation oracle. Checker
    liveness (planted corruptions ARE flagged) is pinned once for the
    shared _ann_violations in tests/test_ann_recall.py."""
    assert QUERIES["embedding_pq_search_verify"](spark, SF_MEDIUM).count() == 0


def test_pq_topk_recall_floor(spark):
    exact = {
        (r.q_id, r.n_id)
        for r in QUERIES["similarity_topk"](spark, SF_MEDIUM).collect()
    }
    approx = {
        (r.q_id, r.n_id)
        for r in QUERIES["embedding_pq_topk"](spark, SF_MEDIUM).collect()
    }
    recall = len(exact & approx) / len(exact)
    # measured 0.80 on this fixture (near-random embeddings — the hard
    # case for 4-bit codes); same floor philosophy as test_ann_recall
    assert recall >= 0.3, f"pq_adc recall={recall:.2f} < 0.3"


def _mk_embeddings(spark, tmp_path, rows, n_files=1):
    """rows: list of (vec_id, [64 floats]). Writes a schema-matching
    embeddings.parquet (FLOAT[] like the fixture) under tmp_path."""
    df = spark.createDataFrame(
        [(i, v, 0) for i, v in rows],
        "vec_id long, embedding array<float>, label int",
    )
    out = str(tmp_path / "embeddings.parquet")
    writer = df.coalesce(1) if n_files == 1 else df.repartition(n_files)
    writer.write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_pq_topk_planted_neighbor_rank1(spark, tmp_path):
    """A planted near-duplicate of every query vector must come back at
    rank 1: its codes quantize next to the query's own region, so its
    ADC score dominates, and the exact refine then ranks it first."""
    from cqlcopy_spark.operators.similarity import _N_QUERIES

    rng = random.Random(88012)
    rows = []
    queries = []
    for q in range(_N_QUERIES):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        queries.append(v)
        rows.append((q, v))
    for q, v in enumerate(queries):  # planted near-dup: tiny perturbation
        rows.append((100 + q, [x + rng.uniform(-1e-3, 1e-3) for x in v]))
    for i in range(200, 400):  # background corpus
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    sf_dir = _mk_embeddings(spark, tmp_path, rows)

    out = QUERIES["embedding_pq_topk"](spark, sf_dir).collect()
    rank1 = {r.q_id: r.n_id for r in out if r.rank == 1}
    for q in range(_N_QUERIES):
        assert rank1.get(q) == 100 + q, (q, rank1.get(q))
    # contract: ≤ top-k rows per query, ranks are 1..n contiguous
    per_q = {}
    for r in out:
        per_q.setdefault(r.q_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
        assert len(ranks) <= 5


def test_pq_fit_codebooks_layout_independent(spark, tmp_path):
    """The trained codebooks must not depend on the parquet split/scan
    order (the r11 ADVICE gap): the collected training sample is sorted
    by vec_id before stacking, so a 1-file and a 3-file layout of the
    SAME rows train bitwise-identical codebooks and codes."""
    from cqlcopy_spark.operators.similarity import _pq_fit

    rng = random.Random(88013)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(300)]
    d1 = _mk_embeddings(spark, tmp_path / "one", rows, n_files=1)
    d3 = _mk_embeddings(spark, tmp_path / "three", rows, n_files=3)
    books1, enc1 = _pq_fit(spark, d1)
    books3, enc3 = _pq_fit(spark, d3)
    for b1, b3 in zip(books1, books3):
        assert (b1 == b3).all()
    out1 = {(r.vec_id, r.codes, r.recon_err) for r in enc1.collect()}
    out3 = {(r.vec_id, r.codes, r.recon_err) for r in enc3.collect()}
    assert out1 == out3
