"""Time travel + provenance over the curation delta log: as-of reads
reconstruct exact historical admission states (including ACROSS a
vacuum, via the retained raw deltas), and the raw-delta provenance
reader reproduces each keeper's admitting batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture()
def curated(spark):
    from cqlcopy_spark.catalog import table
    from cqlcopy_spark.operators.text import _streamed_curation_state

    d = table(spark, SF_SMALL, "documents").select("doc_id", "text", "n_chars")
    return d, _streamed_curation_state(spark, SF_SMALL)


def test_asof_equals_prefix_ingest(spark, curated):
    """Reading as of batch 2 equals a fresh ingest of only the first
    two slices — the historical state is reconstructed exactly."""
    import atexit
    import shutil
    import tempfile

    from cqlcopy_spark.streaming.sinks import (
        curation_apply_batch,
        read_curation_survivors,
    )

    d, state = curated
    mx = d.agg(F.max("doc_id")).first()[0] or 0
    cuts = (mx // 3, 2 * (mx // 3))
    prefix_state = tempfile.mkdtemp(prefix="curation_prefix_state_")
    atexit.register(shutil.rmtree, prefix_state, ignore_errors=True)
    curation_apply_batch(d.filter(F.col("doc_id") <= cuts[0]), 0, prefix_state)
    curation_apply_batch(
        d.filter((F.col("doc_id") > cuts[0]) & (F.col("doc_id") <= cuts[1])),
        1,
        prefix_state,
    )
    asof = {
        tuple(r)
        for r in read_curation_survivors(spark, state, as_of=2).collect()
    }
    fresh = {
        tuple(r)
        for r in read_curation_survivors(spark, prefix_state).collect()
    }
    assert asof == fresh and asof


def test_asof_survives_vacuum(spark, curated):
    """A historical as-of read is UNCHANGED by takedown + vacuum: the
    vacuum version stamps above every id, so the as-of read skips it
    and serves the retained raw deltas — physical pruning never
    rewrites history."""
    from cqlcopy_spark.streaming.sinks import (
        curation_takedown_batch,
        curation_vacuum,
        read_curation_survivors,
    )

    d, state = curated
    before = {
        tuple(r)
        for r in read_curation_survivors(spark, state, as_of=2).collect()
    }
    live = read_curation_survivors(spark, state)
    doomed = [r["doc_id"] for r in live.limit(7).collect()]
    curation_takedown_batch(
        spark.createDataFrame([(i,) for i in doomed], "doc_id long"), 3, state
    )
    assert curation_vacuum(spark, state) > 0
    after = {
        tuple(r)
        for r in read_curation_survivors(spark, state, as_of=2).collect()
    }
    # NOTE the asymmetry with the LIVE view: historical reads also
    # pre-date the takedown deltas (as_of bounds the mask read too), so
    # they still contain the later-doomed ids — point-in-time truth.
    assert after == before


def test_provenance_matches_slice_membership(spark, curated):
    """Every survivor's admitted_batch equals the slice its doc_id fell
    in (ascending slices → first-delivery-wins admits each keeper in
    its own slice's batch)."""
    from cqlcopy_spark.streaming.sinks import (
        read_curation_survivors,
        read_curation_survivors_with_batch,
    )

    d, state = curated
    mx = d.agg(F.max("doc_id")).first()[0] or 0
    cuts = (mx // 3, 2 * (mx // 3))
    prov = read_curation_survivors_with_batch(spark, state).collect()
    assert prov
    for r in prov:
        want = 0 if r["doc_id"] <= cuts[0] else (1 if r["doc_id"] <= cuts[1] else 2)
        assert r["admitted_batch"] == want, r
    # the provenance view's key set is exactly the live survivor set
    assert {r["doc_id"] for r in prov} == {
        r["doc_id"] for r in read_curation_survivors(spark, state).collect()
    }


def test_provenance_respects_takedown_mask(spark, curated):
    """Retired docs carry no provenance row in the live view."""
    from cqlcopy_spark.streaming.sinks import (
        curation_takedown_batch,
        read_curation_survivors_with_batch,
    )

    d, state = curated
    prov = read_curation_survivors_with_batch(spark, state)
    victim = prov.agg(F.min("doc_id")).first()[0]
    curation_takedown_batch(
        spark.createDataFrame([(victim,)], "doc_id long"), 3, state
    )
    after = read_curation_survivors_with_batch(spark, state)
    assert after.filter(F.col("doc_id") == victim).count() == 0


def test_provenance_respects_takedown_mask_after_vacuum(spark, curated):
    """r15 ADVICE: a vacuum swaps the takedown mask root to an EMPTY
    compaction, but provenance reads the RAW survivor deltas (which the
    vacuum retains) — so the mask must come from the RAW takedown
    deltas too, or every pre-vacuum retirement resurrects as a
    provenance row the live view excludes."""
    from cqlcopy_spark.streaming.sinks import (
        curation_takedown_batch,
        curation_vacuum,
        read_curation_survivors,
        read_curation_survivors_with_batch,
    )

    d, state = curated
    prov = read_curation_survivors_with_batch(spark, state)
    victim = prov.agg(F.min("doc_id")).first()[0]
    curation_takedown_batch(
        spark.createDataFrame([(victim,)], "doc_id long"), 3, state
    )
    assert curation_vacuum(spark, state) > 0
    after = read_curation_survivors_with_batch(spark, state)
    assert after.filter(F.col("doc_id") == victim).count() == 0
    # provenance key set stays consistent with the live reader view
    assert {r["doc_id"] for r in after.collect()} == {
        r["doc_id"] for r in read_curation_survivors(spark, state).collect()
    }


def test_vector_index_asof_survives_vacuum(spark):
    """The vector twin of as-of time travel: the view as of the
    tombstone batch (before any delete applied) is unchanged by the
    vacuum — historical reads serve the retained raw deltas, and the
    as-of view at the delete batch still contains the later-doomed
    ids."""
    from cqlcopy_spark.operators.vector_index import (
        _lifecycle_state,
        read_index_codes,
        vector_index_vacuum,
    )

    e, state = _lifecycle_state(spark, SF_SMALL)
    # as of batch 2 (the tombstone batch): batches 0-1 live, no mask yet
    before = {
        (r["vec_id"], r["cell"], r["codes"])
        for r in read_index_codes(spark, state, as_of=2).collect()
    }
    assert before
    doomed = {
        r["vec_id"]
        for r in e.filter(F.pmod(F.col("vec_id"), F.lit(3)) == 1)
        .select("vec_id")
        .collect()
    }
    assert {v for v, _, _ in before} & doomed  # pre-delete truth kept
    assert vector_index_vacuum(spark, state) > 0
    after = {
        (r["vec_id"], r["cell"], r["codes"])
        for r in read_index_codes(spark, state, as_of=2).collect()
    }
    assert after == before
