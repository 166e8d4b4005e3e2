"""rag_hybrid_retrieval — fusion-kernel fuzz + composition invariants.

The fusion kernel (_rrf_fuse) is fuzzed against a pure-Python RRF
reference on random synthetic ranked lists (docs in one list, the
other, or both); the fixture-level tests pin that the op's two halves
are EXACTLY the standalone ops' lists and that fused candidates never
come from anywhere else.
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import SF_SMALL

_K = 60  # mirrors similarity._RRF_K
_TOP = 5  # mirrors similarity._TOP_K


def _py_rrf(lex, den):
    """Reference: dicts {(q, doc): rank} -> [(q, doc, rrf, rank)]."""
    byq: dict[int, dict[int, float]] = {}
    for (q, d), r in lex.items():
        byq.setdefault(q, {})[d] = 1.0 / (_K + r)
    for (q, d), r in den.items():
        byq.setdefault(q, {})
        byq[q][d] = byq[q].get(d, 0.0) + 1.0 / (_K + r)
    out = []
    for q, docs in byq.items():
        ranked = sorted(docs.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (d, s) in enumerate(ranked[:_TOP], start=1):
            out.append((q, d, s, i))
    return sorted(out)


@pytest.mark.parametrize("seed", [3, 41])
def test_rrf_kernel_matches_reference(spark, seed):
    from cqlcopy_spark.operators.similarity import _rrf_fuse

    rng = random.Random(seed)
    lex, den = {}, {}
    for q in range(4):
        docs = rng.sample(range(100, 160), 12)
        for i, d in enumerate(docs[:6], start=1):
            lex[(q, d)] = i
        # overlap some, leave others single-list
        fused_docs = docs[3:9]
        for i, d in enumerate(fused_docs, start=1):
            den[(q, d)] = i

    lex_df = spark.createDataFrame(
        [(q, d, r) for (q, d), r in lex.items()],
        "q_id long, doc_id long, lex_rank int",
    )
    den_df = spark.createDataFrame(
        [(q, d, r) for (q, d), r in den.items()],
        "q_id long, doc_id long, sem_rank int",
    )
    got = sorted(
        (r["q_id"], r["doc_id"], r["rrf"], r["rank"])
        for r in _rrf_fuse(lex_df, den_df).collect()
    )
    assert got == _py_rrf(lex, den)


def test_hybrid_halves_are_the_standalone_lists(spark):
    from cqlcopy_spark.plans.registry import all_queries

    qs = all_queries()
    fused = qs["rag_hybrid_retrieval"](spark, SF_SMALL).collect()
    lex = {
        (r["q_id"], r["doc_id"]): r["rank"]
        for r in qs["bm25_retrieval"](spark, SF_SMALL).collect()
    }
    den = {
        (r["q_id"], r["n_id"]): r["rank"]
        for r in qs["similarity_topk"](spark, SF_SMALL).collect()
    }
    assert fused, "fixture must fuse something"
    for r in fused:
        key = (r["q_id"], r["doc_id"])
        assert key in lex or key in den, f"{key} from neither list"
        assert r["lex_rank"] == lex.get(key)
        assert r["sem_rank"] == den.get(key)
        want = (0.0 if key not in lex else 1.0 / (_K + lex[key])) + (
            0.0 if key not in den else 1.0 / (_K + den[key])
        )
        assert r["rrf"] == want
    # a doc leading BOTH lists must lead the fusion
    for q in {r["q_id"] for r in fused}:
        lex1 = [d for (qq, d), rk in lex.items() if qq == q and rk == 1]
        den1 = [d for (qq, d), rk in den.items() if qq == q and rk == 1]
        if lex1 and lex1 == den1:
            top = [r for r in fused if r["q_id"] == q and r["rank"] == 1]
            assert top and top[0]["doc_id"] == lex1[0]


def test_hybrid_plan_has_no_cartesian(spark):
    from cqlcopy_spark.plans.registry import all_queries

    from test_plans import plan_of

    p = plan_of(all_queries()["rag_hybrid_retrieval"](spark, SF_SMALL))
    assert "CartesianProduct" not in p, p
    # the dense half's Q×corpus pairing stays a broadcast nested loop
    assert "BroadcastNestedLoopJoin" in p, p
