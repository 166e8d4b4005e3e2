"""PQ encoder property fuzz vs an independent pure-Python reference
(r11 VERDICT item 6).

_pq_encode_batch claims a fully-defined IEEE op sequence: per-dimension
ascending accumulation of (x_j - c_j)^2, FIRST-minimum assignment,
subspace-ascending recon_err sum. Python floats are the same IEEE
doubles, so a plain-loop reference replaying that sequence must agree
BITWISE — on random vectors, exact distance ties, zero vectors, and
constant subspaces. The mutation tests prove the fuzz has teeth: an
encoder with a different tie policy or fold order IS distinguished by
the crafted inputs.
"""

from __future__ import annotations

import random

import numpy as np

from cqlcopy_spark.operators.similarity import (
    _PQ_K,
    _PQ_M,
    _PQ_SUB,
    _pq_encode_batch,
    _pq_train,
)

DIM = _PQ_M * _PQ_SUB


def _ref_encode(books, x, tie="first", fold="asc"):
    """Pure-Python single-vector encode. tie/fold knobs exist ONLY so the
    mutation tests can show the fuzz detects a wrong tie policy or fold
    order — the reference semantics are tie='first', fold='asc'."""
    codes, err = [], 0.0
    for m in range(_PQ_M):
        ds = []
        for k in range(_PQ_K):
            d = 0.0
            js = range(_PQ_SUB) if fold == "asc" else range(_PQ_SUB - 1, -1, -1)
            for j in js:
                t = x[m * _PQ_SUB + j] - books[m][k][j]
                d += t * t
            ds.append(d)
        best = min(ds)
        k = ds.index(best) if tie == "first" else (
            len(ds) - 1 - ds[::-1].index(best)
        )
        codes.append(k)
        err += ds[k]
    return codes, err


def _rand_matrix(rng, n, special=True):
    """Random vectors plus the adversarial rows the VERDICT names:
    all-zero vectors, constant subspaces, duplicated rows (guaranteed
    distance ties after training), and exact binary fractions (distance
    arithmetic exact → argmin ties happen for real, not at 1-ulp)."""
    X = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(n)]
    if special:
        X[0] = [0.0] * DIM  # zero vector
        X[1] = [0.5] * DIM  # constant everywhere
        X[2] = X[3] = [rng.choice((-0.75, -0.5, -0.25, 0.25, 0.5, 0.75))
                       for _ in range(DIM)]  # exact-fraction duplicates
        for m in range(_PQ_M):  # one constant subspace per row 4..11
            row = [rng.uniform(-1, 1) for _ in range(DIM)]
            row[m * _PQ_SUB : (m + 1) * _PQ_SUB] = [0.25] * _PQ_SUB
            X[4 + m] = row
    return np.array(X, dtype=np.float64)


def test_encoder_matches_pure_python_reference():
    for seed in range(5):
        rng = random.Random(99100 + seed)
        X = _rand_matrix(rng, 64)
        books = _pq_train(X)
        books_py = [[list(map(float, c)) for c in b] for b in books]
        codes, err = _pq_encode_batch(books, X)
        for i in range(X.shape[0]):
            rc, re_ = _ref_encode(books_py, [float(v) for v in X[i]])
            assert list(codes[i]) == rc, (seed, i)
            assert err[i] == re_, (seed, i)  # bitwise, no tolerance


def test_encoder_ties_are_first_minimum():
    """Craft EXACT ties: two identical centroids in every subspace force
    d[k0] == d[k1] bitwise; the encoder must pick the lower index."""
    rng = random.Random(99200)
    X = _rand_matrix(rng, 32)
    books = _pq_train(X)
    for m in range(_PQ_M):
        books[m][7] = books[m][2].copy()  # duplicate centroid 2 at index 7
    codes, _ = _pq_encode_batch(books, X)
    # d[7] == d[2] bitwise for every row, so index 7 must never win
    assert (codes != 7).all()
    # and at least one row actually assigns to the duplicated centroid 2
    # in some subspace, so the tie path was exercised, not vacuous
    assert (codes == 2).any()


def test_fuzz_detects_mutated_tie_policy_and_fold_order():
    """Liveness: the reference comparison must FAIL for an encoder with
    last-minimum ties or descending-dimension folds — i.e., the fuzz can
    catch the mutations it exists to catch."""
    rng = random.Random(99300)
    X = _rand_matrix(rng, 32)
    books = _pq_train(X)
    for m in range(_PQ_M):
        books[m][7] = books[m][2].copy()
    books_py = [[list(map(float, c)) for c in b] for b in books]
    codes, err = _pq_encode_batch(books, X)
    tie_mismatch = fold_mismatch = False
    for i in range(X.shape[0]):
        x = [float(v) for v in X[i]]
        if list(codes[i]) != _ref_encode(books_py, x, tie="last")[0]:
            tie_mismatch = True
        if err[i] != _ref_encode(books_py, x, fold="desc")[1]:
            fold_mismatch = True
    assert tie_mismatch, "last-min mutant not distinguished (no live tie?)"
    assert fold_mismatch, "desc-fold mutant not distinguished"


def test_trainer_invariants():
    """_pq_train: deterministic, correct shapes, centroids finite, and
    every centroid of a subspace trained on constant data collapses to
    that constant (empty cells keep their init, which IS the constant)."""
    rng = random.Random(99400)
    X = _rand_matrix(rng, 64, special=False)
    X[:, 0:_PQ_SUB] = 0.25  # subspace 0 constant across the sample
    a = _pq_train(X)
    b = _pq_train(X.copy())
    assert len(a) == _PQ_M
    for m in range(_PQ_M):
        assert a[m].shape == (_PQ_K, _PQ_SUB)
        assert np.isfinite(a[m]).all()
        assert (a[m] == b[m]).all()  # deterministic
    assert (a[0] == 0.25).all()


def test_end_to_end_kernel_matches_reference_via_parquet(spark, tmp_path):
    """The full _pq_fit path (float32 parquet → cast to double → Arrow
    batches → encode kernel) agrees bitwise with the reference applied
    to the same post-cast doubles."""
    from cqlcopy_spark.operators.similarity import _pq_fit

    rng = random.Random(99500)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)], 0) for i in range(150)
    ]
    rows[5] = (5, [0.0] * DIM, 0)  # zero vector through the real path
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    books, enc = _pq_fit(spark, str(tmp_path))
    books_py = [[list(map(float, c)) for c in b] for b in books]
    got = {r.vec_id: r for r in enc.collect()}
    assert len(got) == 150
    for i, emb, _ in rows:
        x = [float(np.float32(v)) for v in emb]  # the stored float32s
        rc, re_ = _ref_encode(books_py, x)
        assert got[i].codes == "-".join(str(c) for c in rc), i
        assert got[i].recon_err == re_, i
