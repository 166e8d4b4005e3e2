"""continuous_vector_index_sink: the real writeStream path equals the
direct build+append lifecycle, first-batch-trains contract, empty
leading batches skipped, and composition with tombstones."""

from __future__ import annotations

import os
import time

import pandas as pd

from tests.conftest import SF_SMALL


def _vecs(spark):
    from cqlcopy_spark.operators.vector_index import _sliced_corpus

    return _sliced_corpus(spark, SF_SMALL)


def _stage(tmp_path, spark, frames, lead_empty=False):
    """Write arrival batches as parquet files ordered by mtime."""
    stage = str(tmp_path / "stage")
    os.makedirs(stage)
    now = time.time()
    pdfs = []
    if lead_empty:
        pdfs.append(pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                  "emb": pd.Series([], dtype="object")}))
    for df in frames:
        rows = df.collect()
        pdfs.append(
            pd.DataFrame(
                {
                    "vec_id": [r["vec_id"] for r in rows],
                    "emb": [list(r["emb"]) for r in rows],
                }
            )
        )
    for i, pdf in enumerate(pdfs):
        f = os.path.join(stage, f"b{i}.parquet")
        pdf.to_parquet(f)
        os.utime(f, (now - 60 * (len(pdfs) - i),) * 2)
    return stage


def _run(spark, stage, state, ckpt):
    from cqlcopy_spark.streaming.sinks import continuous_vector_index_sink

    src = (
        spark.readStream.schema("vec_id long, emb array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = (
        continuous_vector_index_sink(src, state, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()


def _codes_map(spark, state):
    from cqlcopy_spark.operators.vector_index import read_index_codes

    return {
        r["vec_id"]: (r["cell"], r["codes"])
        for r in read_index_codes(spark, state).collect()
    }


def test_sink_equals_direct_lifecycle(spark, tmp_path):
    from cqlcopy_spark.operators.vector_index import (
        vector_index_append,
        vector_index_build,
    )

    _, (base, b1, b2) = _vecs(spark)
    stage = _stage(tmp_path, spark, [base, b1, b2])
    state = str(tmp_path / "state")
    _run(spark, stage, state, str(tmp_path / "ckpt"))

    ref = str(tmp_path / "ref")
    vector_index_build(base, ref)
    vector_index_append(b1, 1, ref)
    vector_index_append(b2, 2, ref)
    assert _codes_map(spark, state) == _codes_map(spark, ref)


def test_empty_leading_batch_waits_for_data(spark, tmp_path):
    """An empty first trigger trains nothing; the first NON-empty batch
    trains, and the final index covers exactly the delivered vectors."""
    _, (base, b1, _) = _vecs(spark)
    stage = _stage(tmp_path, spark, [base, b1], lead_empty=True)
    state = str(tmp_path / "state")
    _run(spark, stage, state, str(tmp_path / "ckpt"))
    want = {r["vec_id"] for r in base.unionByName(b1).collect()}
    assert set(_codes_map(spark, state)) == want
    assert os.path.exists(os.path.join(state, "codebooks.parquet"))


def test_sink_composes_with_tombstones(spark, tmp_path):
    """vector_index_delete between stream runs: retired ids never reach
    a reader again even when re-delivered. The delete's batch id places
    it in the log order — appends ordered BEFORE it aren't gated (their
    rows are simply masked at read time, and provenance stays coherent:
    codes delta < tombstone batch is not a resurrection), while appends
    ordered AFTER it drop the id in the guard
    (test_tombstone_wins_over_readd covers that path directly)."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.vector_index import vector_index_delete

    _, (base, b1, b2) = _vecs(spark)
    stage = _stage(tmp_path, spark, [base, b1])
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, stage, state, ckpt)

    victims = (
        base.unionByName(b1)
        .select("vec_id")
        .filter(F.pmod(F.col("vec_id"), F.lit(4)) == 1)
    )
    vector_index_delete(victims, 100, state)
    doomed = {r["vec_id"] for r in victims.collect()}

    # second wave: b2 plus re-delivered victims with shifted embeddings
    poison = (
        base.unionByName(b1)
        .join(victims, "vec_id", "left_semi")
        .selectExpr("vec_id", "transform(emb, x -> x + 1.0) AS emb")
    )
    rows = b2.unionByName(poison).collect()
    f = os.path.join(stage, "b9.parquet")
    pd.DataFrame(
        {
            "vec_id": [r["vec_id"] for r in rows],
            "emb": [list(r["emb"]) for r in rows],
        }
    ).to_parquet(f)
    _run(spark, stage, state, ckpt)

    got = set(_codes_map(spark, state))
    want = {
        r["vec_id"] for r in base.unionByName(b1).unionByName(b2).collect()
    } - doomed
    assert got == want
