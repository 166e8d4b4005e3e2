"""BM25 kernel property fuzz (r9 VERDICT item 2 follow-through: the one
r9-new numeric kernel still single-fixture).

bm25_retrieval is green at both fixture SFs, but its score is a
hand-rolled rational pipeline (df-monotone idf × tf saturation, folded
in term order) whose cross-engine hash binding depends on every float op
happening in ONE documented order. This fuzzes the factored kernel
(text._bm25_rank) against a pure-Python reference that replays that
exact order — random small corpora with tie-dense tf/df (tiny
vocabularies), empty docs, 1-token docs, all-query corpora — and
compares scores BITWISE plus ranks exactly.

What a mismatch would mean: the Spark expression tree and the docstring
contract drifted (e.g. a refactor re-associated the fold, collect_list
order leaked into the sum, or the self-exclusion filter moved) — the
class of bug the oracle only catches on the one fixture shape."""

from __future__ import annotations

import random

from tests.conftest import SF_SMALL  # noqa: F401  (ensures repo on path)

K1, B = 1.2, 0.75


def _ref_bm25(docs: list[tuple[int, list[str]]], k: int = 5):
    """Pure-Python replay of _bm25_rank's documented float-op order.

    contrib = ((n - df + 0.5) / (df + 0.5))
              * ((tf*(k1+1.0)) / (tf + k1*(1.0 - b + b*(dl/avgdl))))
    score   = fold of contribs in ASCENDING TERM order, seeded 0.0.
    Top-k per query by (score DESC, doc_id ASC), queries are doc_id < 8,
    self-pairs excluded."""
    d = {i: ws for i, ws in docs if ws}
    if not d:
        return []
    n = len(d)
    avgdl = float(sum(len(ws) for ws in d.values())) / n
    tf: dict[tuple[int, str], int] = {}
    for i, ws in d.items():
        for t in ws:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    out = []
    for q_id in sorted(i for i in d if i < 8):
        qterms = set(d[q_id])
        scored = []
        for doc_id, ws in d.items():
            if doc_id == q_id:
                continue
            matched = sorted(t for t in qterms if (doc_id, t) in tf)
            if not matched:
                continue
            score = 0.0
            for t in matched:
                tfd, dfd, dl = tf[(doc_id, t)], df[t], len(d[doc_id])
                idf = (float(n) - dfd + 0.5) / (dfd + 0.5)
                sat = (float(tfd) * (K1 + 1.0)) / (
                    float(tfd) + K1 * (1.0 - B + B * (float(dl) / avgdl))
                )
                score = score + idf * sat
            scored.append((doc_id, score, len(matched)))
        scored.sort(key=lambda r: (-r[1], r[0]))
        for rank, (doc_id, score, n_terms) in enumerate(scored[:k], start=1):
            out.append((q_id, doc_id, score, n_terms, rank))
    return out


def _random_corpus(seed: int, n_docs: int, vocab: int, max_len: int):
    """Tie-dense corpora: tiny vocabularies force repeated tf/df values
    and score ties (the tiebreak path); length 0 docs exercise the
    non-empty filter upstream of the kernel, length 1 the dl extreme."""
    rng = random.Random(seed)
    words = [f"w{j}" for j in range(vocab)]
    return [
        (i, [rng.choice(words) for _ in range(rng.randrange(0, max_len + 1))])
        for i in range(n_docs)
    ]


def _run_kernel(spark, docs):
    from cqlcopy_spark.operators.text import _bm25_rank

    df = spark.createDataFrame(
        [(i, ws) for i, ws in docs if ws], "doc_id long, ws array<string>"
    )
    return [
        (r["q_id"], r["doc_id"], r["score"], r["n_terms"], r["rank"])
        for r in _bm25_rank(df).collect()
    ]


def _check(spark, docs):
    got = sorted(_run_kernel(spark, docs))
    want = sorted(_ref_bm25(docs))
    assert len(got) == len(want), (len(got), len(want))
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (g, w)
        # BITWISE float equality — the driver's value hash is exact
        assert g[2].hex() == w[2].hex(), (g, w)
        assert g[3:] == w[3:], (g, w)


def test_bm25_reference_parity_fuzz(spark):
    cases = [
        # (n_docs, vocab, max_len) — tie-dense small vocab, longer docs,
        # near-singleton vocab (every df = n), sparse long-tail vocab
        (12, 3, 6),
        (20, 5, 12),
        (10, 1, 4),
        (16, 40, 10),
    ]
    for trial, (n_docs, vocab, max_len) in enumerate(cases):
        for seed in range(3):
            _check(spark, _random_corpus(1000 * trial + seed, n_docs, vocab, max_len))


def test_bm25_all_docs_are_queries(spark):
    """Corpus entirely inside the query-id range: every pair is scored
    both directions, every self-pair excluded."""
    docs = _random_corpus(7, 8, 3, 5)
    _check(spark, docs)


def test_bm25_single_token_and_empty_docs(spark):
    """dl=1 extremes + empty docs dropped before the kernel; one query
    shares no term with anything (must produce zero rows, not a
    zero-score row)."""
    docs = [
        (0, ["a"]),
        (1, []),
        (2, ["b"]),
        (3, ["zzz"]),  # no other doc contains zzz
        (9, ["a", "b", "a"]),
        (10, ["b"]),
    ]
    _check(spark, docs)
