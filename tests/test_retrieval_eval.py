"""retrieval_eval_metrics — value contracts vs a pure-Python recompute
from the two standalone relations (grid ANN list, exact top-k), plus
metric-range invariants. The op is fully oracled; this pins that the
metrics really are functions of those two lists (a drift in either
factoring breaks this before the driver sees it)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_metrics_match_pure_python_recompute(spark):
    from cqlcopy_spark.operators.similarity import (
        _dense_topk,
        retrieval_eval_metrics,
        similarity_ann_grid,
    )

    ann = {}
    for r in similarity_ann_grid(spark, SF_SMALL).collect():
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
        for r in retrieval_eval_metrics(spark, SF_SMALL).collect()
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
        # range invariants
        assert 0.0 <= got[q][3] <= 1.0 and 0.0 <= got[q][4] <= 1.0
        assert got[q][5] == 0.0 or got[q][5] >= 1.0 / max(rk for rk, _ in lst)
