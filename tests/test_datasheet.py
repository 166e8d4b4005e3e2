"""dataset_datasheet — planted-duplicate / tiebreak kernel tests.

The fixture corpus has no duplicate texts at driver SF (the
curation_funnel precedent), so the md5 duplicate-rate path and the
top-language tiebreak are exercised on planted synthetic corpora via
the factored kernel.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _mkdoc(source, lang, text):
    return (source, lang, len(text), text)


def test_planted_duplicates_and_lang_tiebreak(spark):
    from cqlcopy_spark.operators.profiling import _datasheet_kernel

    # srcA: 4 docs, one exact duplicate pair -> dup rate 1/4; langs en/de
    # tied 2-2 -> top_lang is the LARGER string ("en" < "de"? no:
    # "de" < "en", so the max-struct tiebreak must pick "en")
    rows = [
        _mkdoc("srcA", "en", "the data value table one two three four five six"),
        _mkdoc("srcA", "en", "the data value table one two three four five six"),
        _mkdoc("srcA", "de", "the data value table eins zwei drei vier funf sechs"),
        _mkdoc("srcA", "de", "the data value table sieben acht neun zehn elf zwolf"),
        # srcB: all unique, single lang
        _mkdoc("srcB", "fr", "the data value table un deux trois quatre cinq six"),
        _mkdoc("srcB", "fr", "the data value table sept huit neuf dix onze douze"),
    ]
    d = spark.createDataFrame(
        rows, "source string, lang string, n_chars long, text string"
    )
    out = {r["source"]: r for r in _datasheet_kernel(d).collect()}

    a = out["srcA"]
    assert a["n_docs"] == 4 and a["n_langs"] == 2
    assert a["dup_text_rate"] == 0.25
    assert a["top_lang"] == "en" and a["top_lang_share"] == 0.5
    assert a["gopher_pass_rate"] == 1.0  # all docs 10 words, sane ratios

    b = out["srcB"]
    assert b["dup_text_rate"] == 0.0
    assert b["n_langs"] == 1 and b["top_lang"] == "fr"
    assert b["top_lang_share"] == 1.0


def test_datasheet_agrees_with_standalone_gopher(spark):
    from cqlcopy_spark.plans.registry import all_queries

    qs = all_queries()
    sheet = {r["source"]: r for r in qs["dataset_datasheet"](spark, SF_SMALL).collect()}
    gopher = qs["quality_gopher_rules"](spark, SF_SMALL).collect()
    by_src: dict[str, list[bool]] = {}
    for r in gopher:
        by_src.setdefault(r["source"], []).append(bool(r["pass"]))
    assert set(sheet) == set(by_src)
    for src, flags in by_src.items():
        assert sheet[src]["n_docs"] == len(flags)
        assert sheet[src]["gopher_pass_rate"] == sum(flags) / len(flags)


def test_datasheet_lang_branch_scan_is_pruned(spark):
    from cqlcopy_spark.plans.registry import all_queries

    import re

    from test_plans import plan_of

    p = plan_of(all_queries()["dataset_datasheet"](spark, SF_SMALL))
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    # heavy branch reads exactly (text, lang, source, n_chars); the
    # language-histogram branch prunes to (lang, source) — the expensive
    # text column is scanned ONCE
    assert sorted(len(s.split(",")) for s in schemas) == [2, 4], schemas
