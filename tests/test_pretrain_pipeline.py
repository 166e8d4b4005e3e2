"""pipeline_pretrain_pack — composition must agree with the standalone
gates it reuses (value semantics fully oracle-checked)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_pipeline_agrees_with_standalone_stages(spark):
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.plans.registry import all_queries

    qs = all_queries()
    packs = qs["pipeline_pretrain_pack"](spark, SF_SMALL).collect()
    assert packs

    gopher = {r["doc_id"] for r in qs["quality_gopher_rules"](spark, SF_SMALL).collect() if r["pass"]}
    clf = {
        r["doc_id"]: r["n_tokens"]
        for r in qs["quality_classifier"](spark, SF_SMALL).collect()
        if r["keep"] == 1
    }
    docs = table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    gated = {r["doc_id"]: r["text"] for r in docs if r["doc_id"] in gopher and r["doc_id"] in clf}
    first_by_text: dict[str, int] = {}
    for did in sorted(gated):
        first_by_text.setdefault(gated[did], did)
    survivors = set(first_by_text.values())

    assert sum(r["n_docs"] for r in packs) == len(survivors)
    assert sum(r["pack_tokens"] for r in packs) == sum(clf[d] for d in survivors)
    packed_ids_lo = min(r["first_doc"] for r in packs)
    packed_ids_hi = max(r["last_doc"] for r in packs)
    assert packed_ids_lo == min(survivors) and packed_ids_hi == max(survivors)
