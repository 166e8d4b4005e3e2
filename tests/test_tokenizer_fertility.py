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
