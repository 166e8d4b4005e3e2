"""Multimodal stage plumbing: schema shape, row multiplicity, and
kernel determinism — verified against a driver-side recomputation of the
same stub kernels (the Spark contract is what's under test; the kernels
are deterministic fakes per the environment constraint)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.operators.multimodal import (
    _decode_fake,
    decode_features,
    resize_images,
    sample_frames,
)
from tests.conftest import SF_SMALL


def _payloads(spark):
    return (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", F.encode(col("text"), "UTF-8").alias("payload"))
    )


def test_resize_shapes_and_dims(spark):
    out = resize_images(_payloads(spark), 64, 48).collect()
    assert len(out) == table(spark, SF_SMALL, "documents").count()
    target = 64 * 48 // 64
    for r in out:
        assert r["width"] == 64 and r["height"] == 48
        assert len(r["payload"]) == target


def test_sample_frames_multiplicity_matches_kernel(spark):
    rows = _payloads(spark).collect()
    expected = {}
    for r in rows:
        raw = bytes(r["payload"])
        _, _, n_frames, _ = _decode_fake(raw)
        expected[r["doc_id"]] = len(range(0, n_frames, 10))
    got = (
        sample_frames(_payloads(spark), every_n=10)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert {r["doc_id"]: r["count"] for r in got} == expected


def test_decode_features_row_aligned(spark):
    feats = decode_features(_payloads(spark)).collect()
    by_id = {r["doc_id"]: r for r in feats}
    for r in _payloads(spark).collect()[:20]:
        w, h, n, luma = _decode_fake(bytes(r["payload"]))
        got = by_id[r["doc_id"]]
        assert (got["width"], got["height"], got["n_frames"]) == (w, h, n)
        assert abs(got["mean_luma"] - luma) < 1e-15
