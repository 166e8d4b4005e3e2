"""tokenizer_fertility semantics: hand-computed subword splits on text
the synthetic corpus lacks (camelCase, digits, punctuation), where
fertility must rise above 1, plus a rollup replay on the fixture."""

from __future__ import annotations

import re
from collections import defaultdict

from tests.conftest import SF_SMALL


def test_fertility_hand_computed(spark):
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.text import _BPE_RE

    rows = [
        # "camelCase x2!" → pieces: camel, Case, x, 2, ! = 5; ws words = 2
        (1, "xx", 13, "camelCase x2!"),
        # "abc def" → 2 pieces, 2 words: fertility exactly 1
        (2, "yy", 7, "abc def"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long, text string")
    got = {
        r.lang: r
        for r in df.select(
            "lang",
            "n_chars",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("ws"),
            F.regexp_count(F.col("text"), F.lit(_BPE_RE)).cast("long").alias("sub"),
        ).collect()
    }
    assert (got["xx"].ws, got["xx"].sub) == (2, 5)
    assert (got["yy"].ws, got["yy"].sub) == (2, 2)
    # the Python re replay of the same pattern agrees
    for _, lang, _, text in rows:
        assert got[lang].sub == len(re.findall(_BPE_RE, text))


def test_fertility_replays_from_rows(spark):
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.operators.text import _BPE_RE, tokenizer_fertility

    docs = table(spark, SF_SMALL, "documents").select("lang", "n_chars", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        a = agg[r.lang]
        a[0] += 1
        a[1] += r.n_chars
        a[2] += len(r.text.split(" "))
        a[3] += len(re.findall(_BPE_RE, r.text))
    got = {r.lang: r for r in tokenizer_fertility(spark, SF_SMALL).collect()}
    assert set(got) == set(agg)
    for lang, (n, chars, ws, sub) in agg.items():
        r = got[lang]
        assert (r.n_docs, r.sum_chars, r.sum_ws, r.sum_subword) == (n, chars, ws, sub)
        assert r.fertility == sub / ws
        assert r.chars_per_subword == chars / sub


def test_fertility_zero_denominator_is_null_both_engines(spark, tmp_path):
    """A language whose docs are all whitespace has sum_subword = 0:
    Spark must emit NULL ratios (not a crash), and the DuckDB oracle's
    NULLIF must agree — the exact cross-engine divergence the r11
    ADVICE flagged (Spark /0.0 → NULL vs DuckDB IEEE → inf)."""
    import duckdb
    import math

    from cqlcopy_spark.operators.text import (
        _FERTILITY_ORACLE,
        tokenizer_fertility,
    )

    rows = [
        (1, "zz", 3, "   "),          # whitespace-only: 0 subword tokens
        (2, "zz", 1, " "),
        (3, "en", 7, "abc def"),      # control language
    ]
    df = spark.createDataFrame(
        [(i, t, l, "srcA", n) for i, l, n, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)

    got = {r.lang: r for r in tokenizer_fertility(spark, str(tmp_path)).collect()}
    assert got["zz"].sum_subword == 0
    assert got["zz"].chars_per_subword is None
    assert got["en"].fertility == 1.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{out}/*.parquet'"
    )
    oracle = {r[0]: r for r in con.execute(_FERTILITY_ORACLE).fetchall()}
    # NULLIF path: NULL, never inf/nan
    assert oracle["zz"][5] is None
    assert not math.isnan(oracle["en"][5])
    assert got["en"].chars_per_subword == oracle["en"][5]
