"""pack_sequences placement-kernel property fuzz (the fuzz-before-
recheck convention, applied retroactively: the op predates it and had
only oracle + plan-pin coverage).

The greedy-contiguous rule — a doc's pack is floor(cumulative tokens
BEFORE it / budget), per shard in doc_id order — is a cumulative-
boundary computation with three edges the fixture never exercises:
zero-token docs (they land in whatever pack the offset says, adding
docs but no tokens), docs longer than the budget (straddle several
packs but count wholly in their start pack), and single-doc shards."""

from __future__ import annotations

import random
from collections import defaultdict


def _ref_pack(rows, budget):
    """rows: (doc_id, shard, n_tokens). Pure-Python replay."""
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r[1]].append(r)
    out = {}
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r[0])
        cum = 0
        for doc_id, _, n in docs:
            pack = cum // budget
            cum += n
            key = (shard, pack)
            if key not in out:
                out[key] = [0, 0, doc_id, doc_id]
            slot = out[key]
            slot[0] += 1
            slot[1] += n
            slot[2] = min(slot[2], doc_id)
            slot[3] = max(slot[3], doc_id)
    return {k: tuple(v) for k, v in out.items()}


def test_pack_kernel_fuzz(spark):
    from cqlcopy_spark.operators.text import _pack_from_toks

    cases = [
        # (n_docs, n_shards, max_tokens, budget)
        (60, 4, 30, 64),     # typical
        (40, 3, 200, 64),    # docs straddle multiple packs
        (50, 5, 5, 7),       # tiny budget, dense boundaries
        (30, 30, 10, 16),    # ~single-doc shards
        (45, 2, 12, 1000),   # budget exceeds every shard → one pack each
    ]
    for trial, (n_docs, n_shards, mt, budget) in enumerate(cases):
        rng = random.Random(52000 + trial)
        rows = [
            (i, i % n_shards, rng.choice([0, rng.randrange(0, mt + 1)]))
            for i in range(n_docs)  # ~half the draws can be zero-token
        ]
        df = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens long")
        got = {
            (r.shard, r.pack_id): (r.n_docs, r.pack_tokens, r.first_doc, r.last_doc)
            for r in _pack_from_toks(df, budget).collect()
        }
        assert got == _ref_pack(rows, budget), (trial, got)
