"""contamination_neardup semantics: a lightly-edited eval copy of a
train document must be reported; unrelated docs and below-threshold
overlaps must not; direction is eval→train only (train-train and
eval-eval near-dups are dedup_fuzzy_minhash's job, not leakage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cqlcopy_spark.functions.portable import portable_token
from cqlcopy_spark.operators.dedup import _neardup_contamination


def _split_of(spark, ids):
    rows = (
        spark.createDataFrame([(i,) for i in ids], "doc_id long")
        .select("doc_id", (portable_token(F.col("doc_id")) % 100 < 90).alias("t"))
        .collect()
    )
    return {r["doc_id"]: r["t"] for r in rows}


def test_planted_leak_detected_directionally(spark):
    # find ids on each side of the split deterministically
    split = _split_of(spark, range(200))
    train_ids = [i for i, t in split.items() if t]
    eval_ids = [i for i, t in split.items() if not t]
    assert len(eval_ids) >= 3 and len(train_ids) >= 3

    base = " ".join(f"w{k}" for k in range(40))
    edited = "EDIT " + base  # one-token edit: J well above 0.5
    other = " ".join(f"z{k}" for k in range(40))
    docs = [
        (train_ids[0], base),  # train original
        (eval_ids[0], edited),  # leaked eval copy -> MUST be reported
        (eval_ids[1], other),  # unrelated eval -> silent
        (train_ids[1], other + " tail1 tail2"),  # near-dup of eval_ids[1]? yes! J high
        (train_ids[2], " ".join(f"q{k}" for k in range(40))),  # unrelated train
        (eval_ids[2], edited),  # second leaked eval of the same train doc
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["eval_doc"], r["train_doc"])
        for r in _neardup_contamination(d).collect()
    }
    assert (eval_ids[0], train_ids[0]) in got
    assert (eval_ids[2], train_ids[0]) in got
    # the other/other+tail pair IS a cross-split near-dup (eval side
    # probes train side) — directionally eval_doc first
    assert (eval_ids[1], train_ids[1]) in got
    # nothing reported against the unrelated train doc, and no
    # train->eval or same-side rows exist by construction
    assert all(split[e] is False and split[t] is True for e, t in got)
    assert not any(t == train_ids[2] for _, t in got)


def test_below_threshold_overlap_is_silent(spark):
    split = _split_of(spark, range(200))
    train_ids = [i for i, t in split.items() if t]
    eval_ids = [i for i, t in split.items() if not t]
    # 40-token docs sharing only a 6-token run: gram Jaccard ~ 4/76 << 0.5
    shared = " ".join(f"s{k}" for k in range(6))
    docs = [
        (train_ids[0], shared + " " + " ".join(f"a{k}" for k in range(34))),
        (eval_ids[0], shared + " " + " ".join(f"b{k}" for k in range(34))),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    assert _neardup_contamination(d).count() == 0
