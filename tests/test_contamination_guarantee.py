"""contamination_substring detection-guarantee fuzz: the op's docstring
claims any VERBATIM shared run of length >= _SUB_N + _SUB_STRIDE - 1
(31 chars) is detected with certainty — the stride only thins the
corpus-side windows, never below one full window per 31-char run. This
plants shared runs at every stride phase and at doc edges against a
synthetic documents.parquet, and checks the one-sided guarantee: all
planted >= 31-char overlaps flagged, sub-window (< 24 char) overlaps
never flagged (24-30 char runs are alignment-dependent by design and
asserted on neither side)."""

from __future__ import annotations

import random
import string


def _mk_docs(spark, tmp_path, docs):
    """docs: list of (doc_id, text). Writes a schema-complete
    documents.parquet and returns the directory for sf_dir."""
    rows = [
        (doc_id, text, "en", f"src{doc_id % 4}", len(text))
        for doc_id, text in docs
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def _rand_text(rng, n):
    return "".join(rng.choice(string.ascii_lowercase) for _ in range(n))


def test_planted_overlap_guarantee(spark, tmp_path):
    from cqlcopy_spark.operators.text import (
        _SUB_N,
        _SUB_STRIDE,
        contamination_substring,
    )

    guarantee = _SUB_N + _SUB_STRIDE - 1  # 31 chars
    rng = random.Random(77001)
    bench_text = _rand_text(rng, 200)  # doc_id 0 → bench side
    docs = [(0, bench_text)]
    planted, clean = [], []
    # one contaminated doc per stride phase: the shared run starts at
    # corpus-doc offset `phase`, so every alignment of the stride grid
    # against the run is exercised (the guarantee must hold for ALL)
    for phase in range(_SUB_STRIDE + 2):
        doc_id = 1 + phase  # not ≡ 0 mod 50 → corpus side
        start = rng.randrange(0, len(bench_text) - guarantee)
        shared = bench_text[start : start + guarantee]
        text = _rand_text(rng, phase) + shared + _rand_text(rng, 40)
        docs.append((doc_id, text))
        planted.append(doc_id)
    # negative controls: overlaps strictly shorter than one window can
    # never produce a matching window pair
    for k in range(3):
        doc_id = 20 + k
        start = rng.randrange(0, len(bench_text) - (_SUB_N - 1))
        shared = bench_text[start : start + _SUB_N - 1]  # 23 chars
        docs.append((doc_id, _rand_text(rng, 30) + shared + _rand_text(rng, 30)))
        clean.append(doc_id)
    sf_dir = _mk_docs(spark, tmp_path, docs)
    flagged = {
        r.doc_id for r in contamination_substring(spark, sf_dir).collect()
    }
    missed = set(planted) - flagged
    assert not missed, f"guaranteed-detectable overlaps missed: {missed}"
    false_pos = set(clean) & flagged
    assert not false_pos, f"sub-window overlaps flagged: {false_pos}"


def test_excise_drops_exactly_the_planted(spark, tmp_path):
    """End-to-end on the same synthetic corpus: excision keeps every
    clean corpus doc and drops the planted ones plus the bench doc."""
    from cqlcopy_spark.operators.text import (
        _SUB_N,
        _SUB_STRIDE,
        contamination_excise,
    )

    rng = random.Random(77002)
    bench_text = _rand_text(rng, 150)
    guarantee = _SUB_N + _SUB_STRIDE - 1
    shared = bench_text[40 : 40 + guarantee]
    docs = [
        (0, bench_text),                                   # bench
        (1, _rand_text(rng, 20) + shared + _rand_text(rng, 20)),  # planted
        (2, _rand_text(rng, 80)),                          # clean
        (3, _rand_text(rng, 80)),                          # clean
    ]
    sf_dir = _mk_docs(spark, tmp_path, docs)
    kept = {r.doc_id for r in contamination_excise(spark, sf_dir).collect()}
    assert kept == {2, 3}
