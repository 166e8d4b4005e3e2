"""triplet_mining — role/containment/determinism contracts (the value
semantics are fully oracle-checked; these pin the contrastive-training
guarantees a consumer relies on)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_triplet_contracts(spark):
    from cqlcopy_spark.operators.similarity import _N_NEG, _TOP_K
    from cqlcopy_spark.plans.registry import all_queries

    qs = all_queries()
    trip = qs["triplet_mining"](spark, SF_SMALL).collect()
    topk = qs["similarity_topk"](spark, SF_SMALL).collect()

    top_by_q: dict[int, set[int]] = {}
    pos_by_q: dict[int, int] = {}
    for r in topk:
        top_by_q.setdefault(r["q_id"], set()).add(r["n_id"])
        if r["rank"] == 1:
            pos_by_q[r["q_id"]] = r["n_id"]

    by_q: dict[int, dict[str, list]] = {}
    for r in trip:
        by_q.setdefault(r["q_id"], {"pos": [], "neg": []})[r["role"]].append(r)

    assert set(by_q) == set(top_by_q)
    for q, roles in by_q.items():
        # the positive IS similarity_topk's rank-1 neighbor
        assert len(roles["pos"]) == 1
        assert roles["pos"][0]["n_id"] == pos_by_q[q]
        # negatives: exactly N, all strictly outside the top-k, no self
        assert len(roles["neg"]) == _N_NEG
        assert sorted(r["pick"] for r in roles["neg"]) == list(
            range(1, _N_NEG + 1)
        )
        for r in roles["neg"]:
            assert r["n_id"] not in top_by_q[q]
            assert r["n_id"] != q
            # a negative can never beat the positive under the metric
            # (equality is legal when a cosine tie spans rank 1 and >k)
            assert r["cosine"] <= roles["pos"][0]["cosine"]

    # deterministic replay: a second build yields the identical relation
    again = qs["triplet_mining"](spark, SF_SMALL).collect()
    key = lambda r: (r["q_id"], r["role"], r["pick"])  # noqa: E731
    assert sorted(map(tuple, trip)) == sorted(map(tuple, again)), (
        sorted(trip, key=key)[:5]
    )
