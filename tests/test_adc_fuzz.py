"""ADC scan-kernel property fuzz vs an independent pure-Python
reference (r12 VERDICT item 5).

test_pq_fuzz covers the ENCODER; this drives `_adc_scan_kernel` — the
retrieval half shared by embedding_pq_topk and similarity_ivfpq — and
the IVFADC residual fold (<q, c(cell)> constant + LUT sum) against a
plain-loop reference replaying the kernel's exact IEEE op sequence:
LUT adds in subspace-ascending order, then the per-cell constant, then
one divide by the row norm; candidate cut is the strict
(score DESC, vec_id ASC) total order, merged across batches with
running per-query state.

The reference carries mutation knobs (reversed fold order, dropped
residual constant, ignored probe mask, wrong tiebreak) ONLY so the
mutation tests can show the fuzz detects each wrong kernel — the
reference semantics are the unmutated path.
"""

from __future__ import annotations

import random
import types

import numpy as np
import pandas as pd
import pytest

from cqlcopy_spark.operators.similarity import (
    _PQ_CAND,
    _PQ_K,
    _PQ_M,
    _PQ_SUB,
    _adc_scan_kernel,
    _pq_encode_batch,
    _pq_train,
    _query_luts,
)

DIM = _PQ_M * _PQ_SUB
N_CELLS = 6


def _corpus(rng, n):
    """Random rows + the adversarial shapes the VERDICT names: all-zero
    (no-cosine) rows and duplicated embeddings under distinct vec_ids
    (guaranteed score ties → the vec_id tiebreak decides)."""
    X = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(n)]
    X[3] = [0.0] * DIM                       # zero-norm: must be masked
    X[10] = list(X[4])                       # exact duplicate pair
    X[17] = list(X[4])                       # triplicate — more ties
    return np.array(X, dtype=np.float64)


def _build(rng, n=120, tie_heavy=False):
    """(vec_ids, X, cells, codes, books) — codes from the real encoder;
    tie_heavy duplicates codebook centroids so DIFFERENT codes hit
    EQUAL LUT entries (score ties between non-duplicate rows)."""
    X = _corpus(rng, n)
    books = _pq_train(X[:64].copy())
    if tie_heavy:
        for m in range(_PQ_M):
            books[m][_PQ_K // 2 :] = books[m][: _PQ_K - _PQ_K // 2]
    codes, _ = _pq_encode_batch(books, X)
    vec_ids = np.arange(n, dtype=np.int64)
    cells = np.array([i % N_CELLS for i in range(n)], dtype=np.int32)
    return vec_ids, X, cells, codes, books


def _queries(rng, X, q_ids):
    """[(q_id, x, nrm)] with the kernel's upstream contract applied:
    queries are corpus rows (self-exclusion matters) with nonzero
    norm."""
    out = []
    for q in q_ids:
        x = X[q]
        out.append((int(q), x, float(np.sqrt((x * x).sum()))))
    return out


def _ref_scan(
    vec_ids,
    X,
    cells,
    codes,
    L,
    q_id_arr,
    CN=None,
    probes=None,
    *,
    fold="asc",
    use_const=True,
    use_mask=True,
    tie="asc",
):
    """Pure-loop reference: per-query ordered candidate id list after the
    (score DESC, vec_id ASC) cut at _PQ_CAND. Mutation knobs mirror
    test_pq_fuzz's pattern."""
    nrm = np.sqrt((X * X).sum(axis=1))
    nonzero = (X != 0).any(axis=1)
    result = []
    for qi, q_id in enumerate(q_id_arr):
        scored = []
        for i in range(len(vec_ids)):
            if not nonzero[i] or vec_ids[i] == q_id:
                continue
            if probes is not None and use_mask and int(cells[i]) not in probes[qi]:
                continue
            acc = 0.0
            ms = range(_PQ_M) if fold == "asc" else range(_PQ_M - 1, -1, -1)
            for m in ms:
                acc += L[qi][m][codes[i][m]]
            if CN is not None and use_const:
                acc += CN[qi][cells[i]]
            scored.append((-(acc / nrm[i]), int(vec_ids[i])))
        scored.sort(key=(lambda t: t) if tie == "asc" else (lambda t: (t[0], -t[1])))
        result.append([v for _, v in scored[:_PQ_CAND]])
    return result


def _run_kernel(vec_ids, X, cells, codes, L, q_id_arr, CN=None, probes=None, batches=3):
    bc = types.SimpleNamespace(value=(list(q_id_arr), L, CN, probes))
    scan = _adc_scan_kernel(bc)
    n = len(vec_ids)
    cut = [0] + [n * (i + 1) // batches for i in range(batches)]
    pdfs = []
    for b in range(batches):
        lo, hi = cut[b], cut[b + 1]
        pdf = pd.DataFrame(
            {
                "vec_id": vec_ids[lo:hi],
                "emb": [list(map(float, r)) for r in X[lo:hi]],
                "codes": ["-".join(str(c) for c in row) for row in codes[lo:hi]],
            }
        )
        if CN is not None:
            pdf["cell"] = cells[lo:hi]
        pdfs.append(pdf)
    out = list(scan(iter(pdfs)))
    got = {int(q): [] for q in q_id_arr}
    for pdf in out:
        for q, v in zip(pdf["q_id"], pdf["vec_id"]):
            got[int(q)].append(int(v))
    return [got[int(q)] for q in q_id_arr]


@pytest.mark.parametrize("seed", [3, 41])
@pytest.mark.parametrize("tie_heavy", [False, True])
def test_plain_pq_scan_matches_reference(seed, tie_heavy):
    rng = random.Random(seed)
    vec_ids, X, cells, codes, books = _build(rng, tie_heavy=tie_heavy)
    qs = _queries(rng, X, [0, 4, 7])  # 4 has exact duplicates in-corpus
    L = _query_luts(books, qs)
    q_id_arr = [q for q, _, _ in qs]
    got = _run_kernel(vec_ids, X, cells, codes, L, q_id_arr)
    want = _ref_scan(vec_ids, X, cells, codes, L, q_id_arr)
    assert got == want


@pytest.mark.parametrize("seed", [5, 19])
def test_ivfadc_residual_scan_matches_reference(seed):
    """The residual decomposition: score = (<q,c(cell)> + Σ LUT) / nrm,
    rows outside a query's probed cells masked inside the map."""
    rng = random.Random(seed)
    vec_ids, X, cells, codes, books = _build(rng)
    qs = _queries(rng, X, [0, 4, 9])
    L = _query_luts(books, qs)
    q_id_arr = [q for q, _, _ in qs]
    CN = np.array(
        [[rng.uniform(-2, 2) for _ in range(N_CELLS)] for _ in qs],
        dtype=np.float64,
    )
    probes = [{0, 1, 2, 5}, {1, 3}, {0, 2, 4}]
    got = _run_kernel(vec_ids, X, cells, codes, L, q_id_arr, CN, probes)
    want = _ref_scan(vec_ids, X, cells, codes, L, q_id_arr, CN, probes)
    assert got == want


def test_batch_slicing_is_invisible():
    """Running per-partition state merged over 1, 2, or 5 Arrow batches
    must produce the identical candidate lists — the property that makes
    the per-partition top-cand cut safe at any partitioning."""
    rng = random.Random(11)
    vec_ids, X, cells, codes, books = _build(rng)
    qs = _queries(rng, X, [0, 4])
    L = _query_luts(books, qs)
    q_id_arr = [q for q, _, _ in qs]
    runs = [
        _run_kernel(vec_ids, X, cells, codes, L, q_id_arr, batches=b)
        for b in (1, 2, 5)
    ]
    assert runs[0] == runs[1] == runs[2]


def test_zero_norm_query_dropped_upstream(spark):
    """_collect_queries excludes a zero-norm query vector entirely (a
    zero vector has no cosine neighbors) — the kernel contract assumes
    every q_id it sees has a norm."""
    from cqlcopy_spark.operators.similarity import _collect_queries

    rows = [(0, [0.0] * DIM), (1, [1.0] + [0.0] * (DIM - 1))]
    e = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    qs = _collect_queries(e)
    assert [q for q, _, _ in qs] == [1]


def test_mutations_are_detected():
    """The fuzz has teeth: each wrong-kernel knob produces a DIFFERENT
    candidate list on the crafted inputs, so a kernel regression of that
    class cannot pass the equality tests above."""
    rng = random.Random(7)
    vec_ids, X, cells, codes, books = _build(rng, tie_heavy=True)
    qs = _queries(rng, X, [0, 4, 9])
    L = _query_luts(books, qs)
    q_id_arr = [q for q, _, _ in qs]
    CN = np.array(
        [[rng.uniform(-2, 2) for _ in range(N_CELLS)] for _ in qs],
        dtype=np.float64,
    )
    probes = [{0, 1}, {2, 3}, {0, 5}]
    base = _ref_scan(vec_ids, X, cells, codes, L, q_id_arr, CN, probes)
    assert base != _ref_scan(
        vec_ids, X, cells, codes, L, q_id_arr, CN, probes, use_const=False
    ), "dropping the <q, c(cell)> residual constant must change results"
    assert base != _ref_scan(
        vec_ids, X, cells, codes, L, q_id_arr, CN, probes, use_mask=False
    ), "ignoring the probe mask must change results"
    # tiebreak detection needs the tied rows IN the candidate pool: for
    # query 4 its exact duplicates (vec_ids 10, 17 — identical codes and
    # norms, so identical ADC scores) rank at the very top unmasked
    plain = _ref_scan(vec_ids, X, cells, codes, L, q_id_arr)
    assert plain != _ref_scan(
        vec_ids, X, cells, codes, L, q_id_arr, tie="desc"
    ), "a wrong vec_id tiebreak must change results on tied scores"
