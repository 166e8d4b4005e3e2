"""classifier_eval_auc / classifier_calibration — kernel fuzz + pins.

The AUC op's rank-sum identity (histogram + strict-cum window) is fuzzed
against the O(P·N) pairwise definition computed in exact integers: for
every (pos, neg) pair count 2 if score_pos > score_neg, 1 on a tie, and
AUC = units / (2·P·N).  num2 in the kernel is exactly `units`, and both
sides perform the same single IEEE division, so the comparison is ==,
no tolerance.
"""

from __future__ import annotations

import random

import pytest

from tests.conftest import SF_SMALL


def _pairwise_auc(rows):
    """rows: [(score, label)] -> exact AUC double or None (undefined)."""
    pos = [s for s, l in rows if l == 1]
    neg = [s for s, l in rows if l == 0]
    if not pos or not neg:
        return None
    units = 0
    for sp in pos:
        for sn in neg:
            if sp > sn:
                units += 2
            elif sp == sn:
                units += 1
    return units / float(2 * len(pos) * len(neg))


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_auc_kernel_matches_pairwise_reference(spark, seed):
    from cqlcopy_spark.operators.text import _auc_kernel

    rng = random.Random(seed)
    # few distinct score values -> heavy ties; one lang all-positive
    # (undefined AUC -> NULL), one tiny lang with a single doc each way
    data = []
    for lang in ("aa", "bb", "cc"):
        vals = [rng.uniform(-3, 1) for _ in range(4)]
        for _ in range(rng.randint(5, 60)):
            label = 1 if lang == "cc" else rng.randint(0, 1)
            data.append((lang, rng.choice(vals), label))
    data.append(("dd", 0.25, 1))
    data.append(("dd", -0.5, 0))

    s = spark.createDataFrame(data, "lang string, score double, label int")
    got = {r["lang"]: (r["n_pos"], r["n_neg"], r["auc"])
           for r in _auc_kernel(s).collect()}

    for lang in ("aa", "bb", "cc", "dd"):
        rows = [(sc, lb) for lg, sc, lb in data if lg == lang]
        want = _pairwise_auc(rows)
        n_pos = sum(1 for _, lb in rows if lb == 1)
        n_neg = len(rows) - n_pos
        assert got[lang][0] == n_pos and got[lang][1] == n_neg
        assert got[lang][2] == want, (lang, got[lang], want)


def test_auc_fixture_values_defined_and_bounded(spark):
    from cqlcopy_spark.plans.registry import all_queries

    out = all_queries()["classifier_eval_auc"](spark, SF_SMALL).collect()
    assert out, "fixture corpus must produce per-lang rows"
    defined = [r for r in out if r["auc"] is not None]
    assert defined, "at least one lang must have both classes"
    for r in defined:
        assert 0.0 <= r["auc"] <= 1.0, r


def test_calibration_bins_partition_the_corpus(spark):
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.plans.registry import all_queries

    out = all_queries()["classifier_calibration"](spark, SF_SMALL).collect()
    total = table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in out) == total
    for r in out:
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert r["bin_lo"] == r["bin"] / 10.0
        assert r["pass_rate"] == r["n_pass"] / r["n_docs"]
    bins = [r["bin"] for r in out]
    assert bins == sorted(bins) and len(set(bins)) == len(bins)


def test_eval_metric_plans_are_bounded(spark):
    from cqlcopy_spark.plans.registry import all_queries

    from test_plans import plan_of, shuffle_exchanges

    # AUC: histogram groupBy + per-lang window (+ tiny final orderBy);
    # the per-lang rollup must REUSE the window's hash partitioning
    p = plan_of(all_queries()["classifier_eval_auc"](spark, SF_SMALL))
    assert shuffle_exchanges(p) <= 3, p
    assert "Join" not in p, p

    # calibration: ONE hash aggregate on the bin key (+ final orderBy);
    # map-only otherwise — no window, no join
    p = plan_of(all_queries()["classifier_calibration"](spark, SF_SMALL))
    assert shuffle_exchanges(p) <= 2, p
    assert "Window" not in p and "Join" not in p, p


def test_langid_confusion_diagonal_on_marked_docs(spark):
    """Synthetic docs stuffed with each language's own marker words must
    land on the diagonal; the fixture's degenerate all-'en' prediction
    never exercises it."""
    from cqlcopy_spark.operators.text import _MARKERS, _pred_lang_expr
    from pyspark.sql import functions as F

    rows = [(lg, " ".join(_MARKERS[lg] * 3)) for lg in _MARKERS]
    d = spark.createDataFrame(rows, "lang string, text string")
    out = d.select(
        "lang", _pred_lang_expr(F.split(F.col("text"), " ")).alias("pred")
    ).collect()
    assert all(r["lang"] == r["pred"] for r in out), out


def test_langid_confusion_consistent_with_lang_id(spark):
    from cqlcopy_spark.plans.registry import all_queries

    qs = all_queries()
    cm = qs["langid_confusion"](spark, SF_SMALL).collect()
    pairs = qs["lang_id"](spark, SF_SMALL).collect()
    want: dict[tuple, int] = {}
    for r in pairs:
        k = (r["lang"], r["pred_lang"])
        want[k] = want.get(k, 0) + 1
    got = {(r["lang"], r["pred_lang"]): r["n"] for r in cm}
    assert got == want
    for r in cm:
        assert r["correct"] == (r["lang"] == r["pred_lang"])
        assert r["row_share"] == r["n"] / r["lang_total"]
