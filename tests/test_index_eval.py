"""similarity_index_eval — the persisted-index promotion gate's value
contract (r13 VERDICT item 6): the metrics must be the pure-Python
recompute from (vector_index_search's served list, exact top-k), via
the test_retrieval_eval.py pattern. The index build is deterministic
(hash-TakeOrdered sample, seedless init), so an independently rebuilt
index serves the identical list."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_index_eval_matches_pure_python_recompute(spark):
    from cqlcopy_spark.operators.similarity import (
        _collect_queries,
        _dense_topk,
    )
    from cqlcopy_spark.operators.vector_index import (
        _incremental_index,
        similarity_index_eval,
        vector_index_search,
    )

    e, state = _incremental_index(spark, SF_SMALL)
    ann = {}
    for r in vector_index_search(spark, state, _collect_queries(e)).collect():
        ann.setdefault(r["q_id"], []).append((r["rank"], r["n_id"]))
    exact = {}
    for r in _dense_topk(spark, SF_SMALL).collect():
        exact.setdefault(r["q_id"], set()).add(r["n_id"])

    got = {
        r["q_id"]: (
            r["n_ann"],
            r["n_exact"],
            r["n_hits"],
            r["recall_at_k"],
            r["precision_at_k"],
            r["mrr"],
        )
        for r in similarity_index_eval(spark, SF_SMALL).collect()
    }
    assert set(got) == set(exact)  # spine = every query with a truth list
    for q, ex in exact.items():
        lst = sorted(ann.get(q, []))
        hit_ranks = [rk for rk, n in lst if n in ex]
        n_ann, n_ex, n_hits = len(lst), len(ex), len(hit_ranks)
        mrr = 1.0 / hit_ranks[0] if hit_ranks else 0.0
        want = (
            n_ann,
            n_ex,
            n_hits,
            n_hits / n_ex,
            (n_hits / n_ann) if n_ann else 0.0,
            mrr,
        )
        assert got[q] == want, (q, got[q], want)
        assert 0.0 <= got[q][3] <= 1.0 and 0.0 <= got[q][4] <= 1.0


def test_grid_eval_unchanged_by_factoring(spark):
    """retrieval_eval_metrics (the fully-oracled grid evaluation) must
    be the same relation after the _retrieval_metrics factoring — the
    no-drift condition the promotion gate's docstring claims."""
    from cqlcopy_spark.operators.similarity import (
        _dense_topk,
        _retrieval_metrics,
        retrieval_eval_metrics,
        similarity_ann_grid,
    )

    direct = retrieval_eval_metrics(spark, SF_SMALL)
    via_kernel = _retrieval_metrics(
        similarity_ann_grid(spark, SF_SMALL), _dense_topk(spark, SF_SMALL)
    )
    assert direct.exceptAll(via_kernel).count() == 0
    assert via_kernel.exceptAll(direct).count() == 0
