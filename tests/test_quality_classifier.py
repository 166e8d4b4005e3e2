"""quality_classifier semantics tests (r10 VERDICT item 5: green
CORRECTNESS entry + map-only plan pin + hand-computed semantics test).

The scorer is a linear model over hashed token features, collapsed to a
per-row fold: score_raw = Σ_tokens W[bucket(token)]. These tests lock
the RULE with a pure-Python replay (fold → ring hash → bucket → weight)
and a fully hand-derived single-token case, then fuzz random ASCII
corpora against the reference — the kernel-fuzz convention every recent
numeric kernel follows (bm25, token budget, upsample, AB lift)."""

from __future__ import annotations

import random
import string

from tests.conftest import SF_SMALL  # noqa: F401  (repo path side effect)

_M32 = 4294967296
_KNUTH = 2654435761
_PREFIX = 8


def _py_bucket(tok: str, dim: int) -> int:
    fold = sum(
        (ord(tok[k]) if k < len(tok) else 0) * 31 ** (_PREFIX - 1 - k)
        for k in range(_PREFIX)
    )
    return ((_KNUTH * (fold % _M32)) % _M32) % dim


def _py_score(text: str, w: list) -> tuple:
    toks = (text or "").split(" ")
    raw = sum(w[_py_bucket(t, len(w))] for t in toks)
    return len(toks), raw


def _run(spark, rows):
    """rows: (doc_id, lang, text) through the REAL operator kernel —
    _qc_cols() itself, not a re-implementation (review finding: a hand
    copy here would keep passing against the stale wiring if the
    operator's expressions drifted in lockstep with the SQL twin)."""
    from cqlcopy_spark.operators.text import _qc_cols

    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    n_tokens, score_raw = _qc_cols()
    out = df.select("doc_id", n_tokens.alias("n_tokens"), score_raw.alias("raw"))
    return {r.doc_id: (r.n_tokens, r.raw) for r in out.collect()}


def test_single_token_hand_computed(spark):
    """One-token doc 'A': fold = 65·31⁷ (remaining 7 positions padded 0),
    bucket = (KNUTH·fold mod 2³²) mod 64, score = W[bucket] — every step
    re-derived inline with plain integer arithmetic, no shared helper."""
    from cqlcopy_spark.operators.text import _QC_W

    fold = 65 * 31**7
    bucket = ((2654435761 * (fold % 2**32)) % 2**32) % 64
    expected = _QC_W[bucket]
    got = _run(spark, [(1, "en", "A")])
    assert got == {1: (1, expected)}


def test_empty_and_null_text(spark):
    """'' and NULL both tokenize to one empty token whose fold is 0:
    bucket = (KNUTH·0) mod 64 = 0, score = W[0], n_tokens = 1 — the
    no-division-guard-needed claim in the docstring."""
    from cqlcopy_spark.operators.text import _QC_W

    got = _run(spark, [(1, "en", ""), (2, "en", None)])
    assert got == {1: (1, _QC_W[0]), 2: (1, _QC_W[0])}


def test_score_fuzz_vs_python(spark):
    from cqlcopy_spark.operators.text import _QC_W

    rng = random.Random(111)
    alphabet = string.ascii_letters + string.digits + ".,;!?"
    rows = []
    for i in range(120):
        n = rng.randrange(1, 30)
        text = " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 14)))
            for _ in range(n)
        )
        rows.append((i, "en", text))
    got = _run(spark, rows)
    for doc_id, _, text in rows:
        assert got[doc_id] == _py_score(text, _QC_W), (doc_id, text)


def test_gate_and_score_consistency(spark):
    """The registered operator's score/keep columns follow from
    score_raw by the documented rational-threshold rule (no independent
    float path can drift)."""
    from cqlcopy_spark.operators.text import _QC_THR_DEN, _QC_THR_NUM, quality_classifier

    rows = quality_classifier(spark, SF_SMALL).collect()
    assert rows
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)  # the gate genuinely splits the corpus
    for r in rows:
        assert r.score == r.score_raw / r.n_tokens
        assert r.keep == int(_QC_THR_DEN * r.score_raw >= _QC_THR_NUM * r.n_tokens)


def test_source_block_rollup_consistency(spark):
    """source_quality_block's aggregates must replay exactly from the
    per-doc operator's output: same keep counts, same integer sums, and
    the blocked flag follows the rational keep-rate rule."""
    from collections import defaultdict

    from cqlcopy_spark.operators.text import (
        _QB_DEN,
        _QB_NUM,
        quality_classifier,
        source_quality_block,
    )
    from cqlcopy_spark.catalog import table

    docs = {
        r.doc_id: r.source
        for r in table(spark, SF_SMALL, "documents").select("doc_id", "source").collect()
    }
    per_doc = quality_classifier(spark, SF_SMALL).collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # n_docs, n_keep, sum_raw, sum_tokens
    for r in per_doc:
        a = agg[docs[r.doc_id]]
        a[0] += 1
        a[1] += r.keep
        a[2] += r.score_raw
        a[3] += r.n_tokens
    got = {r.source: r for r in source_quality_block(spark, SF_SMALL).collect()}
    assert set(got) == set(agg)
    blocked_seen = kept_seen = 0
    for src, (n_docs, n_keep, sum_raw, sum_tokens) in agg.items():
        r = got[src]
        assert (r.n_docs, r.n_keep) == (n_docs, n_keep)
        assert r.keep_rate == n_keep / n_docs
        assert r.mean_token_score == sum_raw / sum_tokens
        want_blocked = int(_QB_DEN * n_keep < _QB_NUM * n_docs)
        assert r.blocked == want_blocked
        blocked_seen += want_blocked
        kept_seen += 1 - want_blocked
    assert blocked_seen and kept_seen  # the blocklist genuinely splits


def test_weights_zero_sum():
    """Σw = 0 by the mirrored construction — the property that centers
    the per-token expected score at 0 for hash-uniform buckets."""
    from cqlcopy_spark.operators.text import _FH_DIM, _QC_W

    assert len(_QC_W) == _FH_DIM
    assert sum(_QC_W) == 0
