"""continuous_minhash_dedup_sink contracts: batch equivalence with
dedup_fuzzy_minhash over the union of micro-batches, exactly-once under
batch replay, and the shared cross-run checkpoint guard.

The LSH pipeline is fully deterministic (fixed permutations, fixed
banding), so candidate generation depends only on each doc's band keys —
not on how the stream is sliced. That makes strict set-equality against
the batch op well-defined: every pair the batch op finds must be found
by exactly one micro-batch (the one where the pair's later-arriving
member lands), with bitwise-identical Jaccard.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from tests.conftest import REPO  # noqa: F401  (sys.path side effect)


def _doc(base: int, n: int = 30, tweak: int | None = None) -> str:
    toks = [f"w{base}_{i}" for i in range(n)]
    if tweak is not None:
        toks[tweak] = f"t{base}_{tweak}"
    return " ".join(toks)


# three micro-batches; pair structure exercises every arrival order:
#   in-batch pair        (1, 2)   — both in batch 0
#   cross, dup_of older  (1, 4)   — 4 arrives after 1
#   cross, dup_of NEWER  (5, 9)   — 5 (smaller id) arrives AFTER 9
#   in-batch pair        (6, 7)   — both in batch 2
#   doc 8 is sub-3-token: no grams, must never appear anywhere
BATCHES = [
    [(1, _doc(1)), (2, _doc(1, tweak=29)), (3, _doc(3)), (9, _doc(9))],
    [(4, _doc(1, tweak=0)), (5, _doc(9, tweak=15))],
    [(6, _doc(6)), (7, _doc(6, tweak=7)), (8, "a b")],
]
EXPECT_PAIRS = {(1, 2), (1, 4), (5, 9), (6, 7), (2, 4)}
# (2,4): both are 1-tweaked variants of base 1 — they share 30-ish of
# ~32 grams (J ~ 0.88) and collide in the unmodified bands, so the
# batch op reports them too; the set above is asserted against the
# batch op's ACTUAL output, this literal is a sanity floor.


def _write_stage(tmp_path) -> str:
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    now = time.time()
    for i, rows in enumerate(BATCHES):
        f = os.path.join(stage, f"b{i}.parquet")
        pd.DataFrame(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        ).to_parquet(f)
        os.utime(f, (now - 60 * (len(BATCHES) - i), now - 60 * (len(BATCHES) - i)))
    return stage


def _run(spark, stage: str, state: str, ckpt: str, **kw) -> None:
    from cqlcopy_spark.streaming.sinks import continuous_minhash_dedup_sink

    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        continuous_minhash_dedup_sink(src, state, ckpt, **kw)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()


def _batch_reference(spark, tmp_path) -> dict[tuple[int, int], float]:
    from cqlcopy_spark.plans.registry import all_queries

    corpus = str(tmp_path / "corpus")
    rows = [r for b in BATCHES for r in b]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(corpus, "documents.parquet")
    )
    out = all_queries()["dedup_fuzzy_minhash"](spark, corpus)
    return {(r["d1"], r["d2"]): r["jaccard"] for r in out.collect()}


def test_minhash_sink_matches_batch_op(spark, tmp_path):
    from cqlcopy_spark.streaming.sinks import read_minhash_pairs

    stage = _write_stage(tmp_path)
    state = str(tmp_path / "state")
    _run(spark, stage, state, str(tmp_path / "ckpt"))

    got_rows = read_minhash_pairs(spark, state).collect()
    got = {
        (min(r["new_doc"], r["dup_of"]), max(r["new_doc"], r["dup_of"])): r["jaccard"]
        for r in got_rows
    }
    assert len(got) == len(got_rows)  # each pair reported exactly once
    want = _batch_reference(spark, tmp_path)
    assert got == want  # keys AND bitwise jaccard
    assert EXPECT_PAIRS <= set(got)
    # each pair is reported BY the later-arriving member
    by_new = {(r["new_doc"], r["dup_of"]) for r in got_rows}
    assert (4, 1) in by_new and (5, 9) in by_new and (7, 6) in by_new
    # the gram-less doc never entered the index or any pair
    assert all(8 not in p for p in got)


def test_minhash_apply_batch_replay_is_idempotent(spark, tmp_path):
    """At-least-once replay: re-running a batch with the SAME batch_id
    must rewrite identical state, because the batch only reads index
    deltas strictly below its own id."""
    from cqlcopy_spark.streaming.sinks import minhash_apply_batch, read_minhash_pairs

    state = str(tmp_path / "state")
    frames = [
        spark.createDataFrame(rows, "doc_id long, text string") for rows in BATCHES
    ]
    for b, df in enumerate(frames):
        minhash_apply_batch(df, b, state)
    first = {
        (r["new_doc"], r["dup_of"], r["jaccard"])
        for r in read_minhash_pairs(spark, state).collect()
    }
    n_hash_rows = spark.read.parquet(os.path.join(state, "hashes")).count()

    minhash_apply_batch(frames[1], 1, state)  # replay the middle batch
    again = {
        (r["new_doc"], r["dup_of"], r["jaccard"])
        for r in read_minhash_pairs(spark, state).collect()
    }
    assert again == first
    assert spark.read.parquet(os.path.join(state, "hashes")).count() == n_hash_rows


def test_minhash_sink_cross_run_guard(spark, tmp_path):
    from pyspark.errors import StreamingQueryException

    from cqlcopy_spark.streaming.sinks import read_minhash_pairs

    stage = _write_stage(tmp_path)
    state = str(tmp_path / "state")
    _run(spark, stage, state, str(tmp_path / "ckpt1"))
    want = {
        (r["new_doc"], r["dup_of"]) for r in read_minhash_pairs(spark, state).collect()
    }
    with pytest.raises(StreamingQueryException, match="belongs to"):
        _run(spark, stage, state, str(tmp_path / "ckpt2"))
    # state unharmed by the refused run
    got = {
        (r["new_doc"], r["dup_of"]) for r in read_minhash_pairs(spark, state).collect()
    }
    assert got == want
    # restart wipes the foreign lineage and recomputes the same report
    _run(spark, stage, state, str(tmp_path / "ckpt3"), on_new_run="restart")
    got = {
        (r["new_doc"], r["dup_of"]) for r in read_minhash_pairs(spark, state).collect()
    }
    assert got == want
