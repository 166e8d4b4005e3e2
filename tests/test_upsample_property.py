"""domain_upsample n_copies kernel property fuzz (r10 VERDICT item 3:
every new numeric kernel fuzzes against a pure-Python reference before
its first rotation re-check; harness shape follows
test_token_budget_property).

The rule under test: n_copies = ⌊w⌋ + [token(doc_id, salt) < frac(w)·2³²]
with the threshold derived by round() — the rounding and the salted-hash
pick are the two places an engine-specific quirk could skew the mixture.
The fuzz feeds random weight maps including w < 1 (pure downsample,
n_copies may be 0), integer w (frac exactly 0 — no doc may get the
fractional copy), frac ≈ 0 and frac ≈ 1 (threshold-rounding edges where
round() lands on 0 or exactly 2³²), unknown langs (default: one copy),
and verifies salted-hash determinism under adversarial partition layouts.
"""

from __future__ import annotations

import random

from tests.conftest import SF_SMALL  # noqa: F401  (repo path side effect)

_M32 = 4294967296
_KNUTH = 2654435761


def _py_token(key: int) -> int:
    """Pure-Python portable_token: (KNUTH · (key mod 2³²)) mod 2³² —
    Python ints don't overflow, so the 16-bit decomposition the engines
    need collapses to the direct product."""
    return (_KNUTH * (key % _M32)) % _M32


def _py_token_composite(keys: list) -> int:
    acc = None
    for k in keys:
        t = _py_token(k)
        acc = t if acc is None else (acc * 31 + t) % _M32
    return acc


def _ref_n_copies(doc_id: int, lang: str, weights: dict, salt: int) -> int:
    if lang in weights:
        w = weights[lang]
        base = int(w)
        thr = int(round((w - base) * float(_M32)))
    else:
        base, thr = 1, 0
    tok = _py_token_composite([doc_id, salt])
    return base + (1 if tok < thr else 0)


def _run_kernel(spark, rows, weights, salt):
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.curation import _n_copies_col, _upsample_parts

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = df.select(
        "doc_id",
        "lang",
        _n_copies_col(_upsample_parts(weights), salt).alias("n_copies"),
    ).filter(F.col("n_copies") > 0)
    return {(r.doc_id, r.lang): r.n_copies for r in out.collect()}


def test_upsample_kernel_fuzz(spark):
    cases = [
        # weight maps hitting every regime
        {"a": 0.5, "b": 2.5, "c": 1.0},              # downsample + fractional + integer
        {"a": 3.0, "b": 0.25},                        # pure integers and small frac
        {"a": 1.0000000001, "b": 1.9999999999},       # frac ≈ 0 and frac ≈ 1 rounding edges
        {"a": 0.0000000001},                          # frac ≈ 0 of a sub-1 weight → all dropped
        {},                                           # every lang unknown → identity mixture
    ]
    langs = ["a", "b", "c", "d"]  # 'd' never weighted: default path
    for trial, weights in enumerate(cases):
        for seed in range(2):
            rng = random.Random(9000 + 10 * trial + seed)
            rows = [
                (rng.randrange(0, 2**40), rng.choice(langs)) for _ in range(80)
            ]
            rows = list({r[0]: r for r in rows}.values())  # unique doc_ids
            salt = rng.randrange(0, 1000)
            got = _run_kernel(spark, rows, weights, salt)
            want = {
                (doc_id, lang): _ref_n_copies(doc_id, lang, weights, salt)
                for doc_id, lang in rows
                if _ref_n_copies(doc_id, lang, weights, salt) > 0
            }
            assert got == want, (trial, seed, set(got) ^ set(want))


def test_upsample_kernel_random_weights(spark):
    """Fully random weight maps (w drawn in (0, 4)) against the pure
    reference — the histogram RULE, not fixture values."""
    rng = random.Random(424242)
    for _ in range(3):
        weights = {
            f"l{i}": rng.choice([rng.uniform(0.01, 4.0), float(rng.randrange(1, 4))])
            for i in range(rng.randrange(1, 6))
        }
        rows = [
            (rng.randrange(0, 2**40), f"l{rng.randrange(0, 7)}")  # some langs unweighted
            for _ in range(120)
        ]
        rows = list({r[0]: r for r in rows}.values())
        salt = rng.randrange(0, 1000)
        got = _run_kernel(spark, rows, weights, salt)
        want = {
            (d, lg): _ref_n_copies(d, lg, weights, salt)
            for d, lg in rows
            if _ref_n_copies(d, lg, weights, salt) > 0
        }
        assert got == want


def test_upsample_deterministic_under_layout(spark):
    """The fractional pick is a pure function of (doc_id, salt): any
    physical layout of the input produces the identical copy assignment
    — df.sample(fraction, withReplacement=True) fails exactly this
    (same contract test as epoch_reshuffle's)."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.curation import (
        _UPSAMPLE_SALT,
        _n_copies_col,
        _upsample_parts,
    )
    from cqlcopy_spark.operators.curation import domain_upsample

    base = {tuple(r) for r in domain_upsample(spark, SF_SMALL).collect()}
    assert base  # non-degenerate fixture
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    for layout in (
        lambda d: d.coalesce(1),
        lambda d: d.repartition(13),
        lambda d: d.repartition(7, "lang"),
    ):
        got = {
            tuple(r)
            for r in layout(docs)
            .select(
                "doc_id",
                "lang",
                "source",
                _n_copies_col(_upsample_parts(), _UPSAMPLE_SALT).alias("n_copies"),
            )
            .filter(F.col("n_copies") > 0)
            .select(
                "doc_id",
                "lang",
                "source",
                "n_copies",
                F.explode(
                    F.sequence(F.lit(1).cast("long"), F.col("n_copies"))
                ).alias("copy_id"),
            )
            .collect()
        }
        assert got == base
