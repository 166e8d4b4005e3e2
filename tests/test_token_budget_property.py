"""token_budget_select kernel property fuzz (r10 convention: every new
numeric kernel fuzzes against a pure-Python reference before its first
rotation re-check).

The greedy-admission rule — walk each domain best-first by (n_chars
DESC, doc_id), admit while the budget was not already spent — is a
cumulative-boundary computation, the exact class where a RANGE frame
(or a lost tiebreak) makes whole duplicate runs share one cumulative
value and the budget cut fall on NO row (CLAUDE.md). The fuzz therefore
generates TIE-DENSE n_chars (tiny value domains, long equal runs),
zero-token docs, single-doc domains, and budgets straddling run
boundaries, and demands exact row-set equality including cum_tokens."""

from __future__ import annotations

import random

from tests.conftest import SF_SMALL  # noqa: F401  (repo path side effect)


def _ref_select(rows, budget):
    """rows: (doc_id, lang, n_chars, n_tokens). Pure-Python replay."""
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r[1], []).append(r)
    out = set()
    for lang, docs in by_lang.items():
        docs.sort(key=lambda r: (-r[2], r[0]))
        cum = 0
        for doc_id, _, _, n_tokens in docs:
            before = cum
            cum += n_tokens
            if before < budget:
                out.add((lang, doc_id, n_tokens, cum))
    return out


def _random_rows(seed, n_docs, n_langs, chars_domain, max_tokens):
    rng = random.Random(seed)
    return [
        (
            i,
            f"l{rng.randrange(n_langs)}",
            rng.randrange(chars_domain),  # tiny domain → long tie runs
            rng.randrange(0, max_tokens + 1),  # zero-token docs included
        )
        for i in range(n_docs)
    ]


def test_token_budget_kernel_fuzz(spark):
    from cqlcopy_spark.operators.curation import _token_budget_kernel

    cases = [
        # (n_docs, n_langs, chars_domain, max_tokens, budget)
        (40, 3, 2, 8, 20),    # extreme tie density, small budget
        (60, 4, 5, 12, 50),   # boundary mid-run
        (25, 25, 3, 6, 10),   # ~single-doc domains
        (50, 2, 1, 10, 0),    # all-equal quality; zero budget → nothing
        (30, 3, 4, 9, 10_000),  # budget exceeds all domains → everything
    ]
    for trial, (n_docs, n_langs, dom, mt, budget) in enumerate(cases):
        for seed in range(3):
            rows = _random_rows(7000 + 100 * trial + seed, n_docs, n_langs, dom, mt)
            df = spark.createDataFrame(
                rows, "doc_id long, lang string, n_chars long, n_tokens long"
            )
            got = {tuple(r) for r in _token_budget_kernel(df, budget).collect()}
            want = _ref_select(rows, budget)
            assert got == want, (trial, seed, got ^ want)


def test_token_budget_zero_budget_and_total_budget(spark):
    """Degenerate budgets: 0 admits nothing; a budget >= domain total
    admits every doc with exact cumulative sums."""
    from cqlcopy_spark.operators.curation import _token_budget_kernel

    rows = [(i, "x", 5, 3) for i in range(10)]  # all identical quality
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, n_tokens long"
    )
    assert _token_budget_kernel(df, 0).count() == 0
    full = {tuple(r) for r in _token_budget_kernel(df, 30).collect()}
    # ties broken by doc_id: cum walks 3,6,…,30 in doc_id order
    assert full == {("x", i, 3, 3 * (i + 1)) for i in range(10)}


def test_prefilter_bitwise_equals_bare_kernel(spark):
    """r11 equivalence fuzz (review finding): the histogram-cutoff
    prefilter must be BITWISE-equal to the unfiltered kernel — the
    docstring's central claim. Adversarial inputs: tie-dense n_chars
    (whole buckets straddle the budget boundary), budgets landing
    exactly on bucket edges, zero-token docs, and NULL lang (its own
    partition in window semantics; a null-unsafe join would drop it)."""
    from cqlcopy_spark.operators.curation import (
        _token_budget_kernel,
        _token_budget_prefiltered,
    )

    cases = [
        (50, 3, 2, 8, 20),      # extreme tie density
        (60, 4, 5, 12, 50),     # boundary mid-run
        (40, 2, 1, 10, 30),     # ONE bucket per lang: cutoff == only edge
        (30, 3, 4, 9, 10_000),  # budget exceeds all domains
        (25, 25, 3, 6, 10),     # ~single-doc domains
    ]
    for trial, (n_docs, n_langs, dom, mt, budget) in enumerate(cases):
        rows = _random_rows(31000 + trial, n_docs, n_langs, dom, mt)
        # a NULL-lang cohort rides along in every trial
        rows += [
            (10_000 + i, None, i % max(dom, 1), 3) for i in range(6)
        ]
        # and NULL-n_chars docs (r11 ADVICE): they sort LAST under the
        # kernel's DESC order and are admitted whenever budget remains —
        # the prefilter's null_kept flag must carry them through (min()
        # skips the NULL bucket and `n_chars >= cutoff` evaluates NULL)
        rows += [(20_000 + i, f"l{i % n_langs}", None, 2) for i in range(4)]
        rows += [(20_100, None, None, 2)]  # NULL lang AND NULL score
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, n_chars long, n_tokens long"
        )
        bare = {tuple(r) for r in _token_budget_kernel(df, budget).collect()}
        pre = {tuple(r) for r in _token_budget_prefiltered(df, budget).collect()}
        assert pre == bare, (trial, pre ^ bare)
        assert any(t[0] is None for t in bare) or budget == 0  # NULL lang admitted
        if budget >= 10_000:  # roomy budget: the NULL-score docs ARE admitted
            assert any(t[1] >= 20_000 for t in bare)


def test_prefilter_all_null_scores_language(spark):
    """Degenerate: a language whose every doc has NULL n_chars — the
    cutoff is NULL (min of no non-null buckets) and ONLY the null_kept
    branch can admit anything; must still equal the bare kernel."""
    from cqlcopy_spark.operators.curation import (
        _token_budget_kernel,
        _token_budget_prefiltered,
    )

    rows = [(i, "onlynull", None, 4) for i in range(8)]
    rows += [(100 + i, "mixed", None if i % 2 else 10 + i, 5) for i in range(6)]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, n_tokens long"
    )
    for budget in (0, 9, 12, 1_000):
        bare = {tuple(r) for r in _token_budget_kernel(df, budget).collect()}
        pre = {tuple(r) for r in _token_budget_prefiltered(df, budget).collect()}
        assert pre == bare, (budget, pre ^ bare)
    assert any(
        t[0] == "onlynull" for t in _token_budget_kernel(df, 9).collect()
    )
