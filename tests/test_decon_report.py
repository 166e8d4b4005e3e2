"""decontamination_report replay consistency: the per-eval-doc report
must be derivable row-for-row from the SAME pair sets its three
standalone gates are built on — the factoring (text._overlap_pairs /
text._substring_pairs / dedup._neardup_contamination) makes drift
structurally impossible, and this test pins that it stays that way."""

from __future__ import annotations

from collections import defaultdict

from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM

QUERIES = all_queries()


def _rollup_pairs(pairs, score_idx=None):
    """pairs: (eval_doc, train_doc[, score]) tuples → expected report
    rows (eval_doc -> (n_train_docs, first_train_doc, max_score))."""
    by_eval = defaultdict(list)
    for p in pairs:
        by_eval[p[0]].append(p)
    return {
        e: (
            len({p[1] for p in ps}),
            min(p[1] for p in ps),
            max(p[score_idx] for p in ps) if score_idx else None,
        )
        for e, ps in by_eval.items()
    }


def test_report_replays_from_gate_pair_sets(spark):
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.operators.dedup import _neardup_contamination
    from cqlcopy_spark.operators.text import _overlap_pairs, _substring_pairs

    d = table(spark, SF_MEDIUM, "documents")
    want = {
        "ngram_overlap": _rollup_pairs(
            {(r.bench_id, r.doc_id) for r in _overlap_pairs(d).collect()}
        ),
        "exact_substring": _rollup_pairs(
            {(r.bench_id, r.doc_id) for r in _substring_pairs(d).collect()}
        ),
        "neardup": _rollup_pairs(
            [
                (r.eval_doc, r.train_doc, r.jaccard)
                for r in _neardup_contamination(d).collect()
            ],
            score_idx=2,
        ),
    }
    got = defaultdict(dict)
    for r in QUERIES["decontamination_report"](spark, SF_MEDIUM).collect():
        got[r.gate][r.eval_doc] = (r.n_train_docs, r.first_train_doc, r.max_score)
    assert dict(got) == want
    # the report actually exercises all three gates at this SF — a gate
    # with zero rows would pass the equality vacuously
    for gate in ("ngram_overlap", "exact_substring", "neardup"):
        assert got[gate], gate


def test_report_agrees_with_standalone_gate_outputs(spark):
    """Transposition check against the DRIVER-CHECKED ops themselves:
    the total pair multiplicity seen per gate must match — sum over the
    report's eval docs of n_train_docs == sum over the standalone
    output's train docs of n_bench_docs (both count the distinct
    bipartite edge set)."""
    rep = defaultdict(int)
    for r in QUERIES["decontamination_report"](spark, SF_MEDIUM).collect():
        rep[r.gate] += r.n_train_docs
    ov = sum(
        r.n_bench_docs
        for r in QUERIES["contamination_overlap"](spark, SF_MEDIUM).collect()
    )
    sub = sum(
        r.n_bench_docs
        for r in QUERIES["contamination_substring"](spark, SF_MEDIUM).collect()
    )
    nd = QUERIES["contamination_neardup"](spark, SF_MEDIUM).count()
    assert rep["ngram_overlap"] == ov
    assert rep["exact_substring"] == sub
    assert rep["neardup"] == nd
