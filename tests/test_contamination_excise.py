"""contamination_excise: the clean set must replay exactly from the
detect op — corpus doc_ids minus contamination_substring's flagged set
minus the held-out bench docs themselves."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_excise_replays_from_detect(spark):
    from pyspark.sql import functions as F

    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.operators.text import (
        _bench_split,
        contamination_excise,
        contamination_substring,
    )

    d = table(spark, SF_SMALL, "documents")
    bench_ids = {r.doc_id for r in _bench_split(d)[0].select("doc_id").collect()}
    all_ids = {r.doc_id for r in d.select("doc_id").collect()}
    flagged = {
        r.doc_id for r in contamination_substring(spark, SF_SMALL).collect()
    }
    assert flagged  # the fixture plants real contamination
    got = {r.doc_id: r for r in contamination_excise(spark, SF_SMALL).collect()}
    assert set(got) == all_ids - bench_ids - flagged
    # token counts come from the same split rule the scorer family uses
    spot = d.filter(F.col("doc_id").isin(*list(got)[:5])).select(
        "doc_id", F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ")).alias("n")
    )
    for r in spot.collect():
        assert got[r.doc_id].n_tokens == r.n
