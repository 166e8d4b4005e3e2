"""embedding_pq semantics + embedding_pq_verify liveness.

The PQ contract: M codes per vector, each the first-minimum centroid of
its subspace under a dim-ascending IEEE fold, recon_err the bitwise sum
of the subspace minima. The verify twin must be LIVE — a planted wrong
code and a perturbed recon_err each produce exactly their violation
rows — and the whole fit must be deterministic across runs (seedless
strided init)."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMALL


def test_pq_codes_shape_and_python_replay(spark):
    from cqlcopy_spark.operators.similarity import (
        _PQ_K,
        _PQ_M,
        _PQ_SUB,
        _pq_fit,
        embedding_pq,
    )

    out = {r.vec_id: r for r in embedding_pq(spark, SF_SMALL).collect()}
    assert out
    books, enc = _pq_fit(spark, SF_SMALL)
    assert len(books) == _PQ_M and all(b.shape == (_PQ_K, _PQ_SUB) for b in books)
    rows = enc.collect()
    for r in rows[:40]:  # replay a sample of assignments independently
        x = np.asarray(r.emb, dtype=np.float64)
        codes = [int(c) for c in r.codes.split("-")]
        err = 0.0
        for m in range(_PQ_M):
            xs = x[m * _PQ_SUB : (m + 1) * _PQ_SUB]
            d = np.zeros(_PQ_K)
            for j in range(_PQ_SUB):
                d += (xs[j] - books[m][:, j]) ** 2
            assert codes[m] == int(d.argmin())
            err += d[codes[m]]
        assert err == r.recon_err  # bitwise: same fold order
        assert out[r.vec_id].codes == r.codes


def test_pq_deterministic(spark):
    from cqlcopy_spark.operators.similarity import embedding_pq

    a = {(r.vec_id, r.codes, r.recon_err) for r in embedding_pq(spark, SF_SMALL).collect()}
    b = {(r.vec_id, r.codes, r.recon_err) for r in embedding_pq(spark, SF_SMALL).collect()}
    assert a == b


def test_pq_verify_empty_and_live(spark):
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.similarity import (
        _PQ_K,
        _pq_fit,
        _pq_violations,
        embedding_pq_verify,
    )

    assert embedding_pq_verify(spark, SF_SMALL).count() == 0
    books, enc = _pq_fit(spark, SF_SMALL)
    enc = enc.persist()
    victim = enc.select("vec_id").orderBy("vec_id").limit(1).collect()[0].vec_id
    # plant a wrong code in subspace 0: (code + 1) mod K is never the
    # first-minimum (the jvm_err branch recomputes minima independently
    # of the codes, so ONLY the 'code' row may fire)
    first = F.split(F.col("codes"), "-")[0].cast("long")
    flipped = F.concat(
        ((first + 1) % _PQ_K).cast("string"),
        F.substring(F.col("codes"), F.instr(F.col("codes"), "-"), 10_000),
    )
    corrupted = enc.withColumn(
        "codes",
        F.when(F.col("vec_id") == victim, flipped).otherwise(F.col("codes")),
    )
    viols = {(r.vec_id, r.subspace, r.kind)
             for r in _pq_violations(books, corrupted).collect()}
    assert viols == {(victim, 0, "code")}, viols
    # and a perturbed reconstruction error fires exactly the 'err' row
    bad_err = enc.withColumn(
        "recon_err",
        F.when(F.col("vec_id") == victim, F.col("recon_err") + 1.0).otherwise(
            F.col("recon_err")
        ),
    )
    viols = {(r.vec_id, r.subspace, r.kind)
             for r in _pq_violations(books, bad_err).collect()}
    assert viols == {(victim, -1, "err")}, viols
