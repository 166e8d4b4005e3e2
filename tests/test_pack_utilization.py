"""pack_utilization: the report must replay exactly from pack_sequences'
output, and every non-tail pack must be full by the greedy-contiguous
fill contract (utilization isolates the tail waste)."""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_SMALL


def test_utilization_replays_from_packs(spark):
    from cqlcopy_spark.operators.text import (
        _PACK_BUDGET,
        pack_sequences,
        pack_utilization,
    )

    packs = pack_sequences(spark, SF_SMALL).collect()
    agg = defaultdict(lambda: [0, 0, 0])  # n_packs, docs, tokens
    for p in packs:
        a = agg[p.shard]
        a[0] += 1
        a[1] += p.n_docs
        a[2] += p.pack_tokens
    got = {r.shard: r for r in pack_utilization(spark, SF_SMALL).collect()}
    assert set(got) == set(agg)
    for shard, (n_packs, docs, tokens) in agg.items():
        r = got[shard]
        assert (r.n_packs, r.shard_docs, r.shard_tokens) == (n_packs, docs, tokens)
        assert r.capacity == n_packs * _PACK_BUDGET
        assert r.utilization == tokens / (n_packs * _PACK_BUDGET)
        # greedy contiguous fill: every non-tail pack is full, so total
        # tokens strictly exceed the capacity of n_packs - 1 packs. (A
        # straddling FINAL doc can push utilization past 1.0 — its
        # tokens count in the pack it STARTS in — so there is no upper
        # bound to pin, only the contiguity lower bound. Every shard in
        # the packs output has >= 1 doc by construction: no empty guard.)
        assert tokens > (n_packs - 1) * _PACK_BUDGET


def test_multimodal_pack_accounting(spark):
    """Interleaved packing: per-pack token split must reconcile, and the
    image count must equal the attachment rule's corpus total."""
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.operators.multimodal import _MM_IMG_MOD, _MM_IMG_TOKENS
    from cqlcopy_spark.plans.registry import all_queries

    out = all_queries()["multimodal_pack"](spark, SF_SMALL).collect()
    assert out
    for r in out:
        assert r["pack_tokens"] == r["text_tokens"] + r["image_tokens"]
        assert r["image_tokens"] == r["n_images"] * _MM_IMG_TOKENS
        assert 0 <= r["n_images"] <= r["n_docs"]
        assert r["first_doc"] <= r["last_doc"]

    docs = table(spark, SF_SMALL, "documents")
    n_attached = docs.filter(f"doc_id % {_MM_IMG_MOD} = 0").count()
    assert sum(r["n_images"] for r in out) == n_attached
    assert sum(r["n_docs"] for r in out) == docs.count()
