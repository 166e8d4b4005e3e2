"""embedding_kmeans contracts: full-corpus Lloyd assignment sanity, the
verify twin's emptiness on the honest pipeline, and planted-corruption
liveness for every invariant (the graph_pagerank_verify discipline —
the op is rows-only, so the verify relation IS its driver-visible
failure mode).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cqlcopy_spark.operators.similarity import (
    _KMEANS_K,
    _kmeans_fit,
    _kmeans_violations,
)
from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

QUERIES = all_queries()


@pytest.fixture(scope="module")
def fit(spark):
    C, assigned = _kmeans_fit(spark, SF_SMALL)
    return C, assigned.persist()


def test_assignment_covers_corpus_and_improves_on_one_cluster(spark, fit):
    C, assigned = fit
    n = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    rows = assigned.collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    assert all(0 <= r["cluster"] < _KMEANS_K for r in rows)
    assert all(r["dist2"] >= -1e-9 for r in rows)
    # Lloyd must beat the degenerate 1-means (everything at the global
    # mean): J_kmeans < J_1means strictly on any non-degenerate corpus
    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").select(
        F.col("embedding").cast("array<double>").alias("emb")
    )
    mean = [
        sum(v) / n
        for v in zip(*[r["emb"] for r in e.collect()])
    ]
    j1 = sum(
        sum((x - m) ** 2 for x, m in zip(r["emb"], mean)) for r in e.collect()
    )
    jk = sum(r["dist2"] for r in rows)
    assert jk < j1


def test_verify_empty_on_honest_pipeline(spark):
    out = QUERIES["embedding_kmeans_verify"](spark, SF_SMALL)
    assert [f.name for f in out.schema.fields] == ["kind", "vec_id", "metric"]
    assert out.count() == 0, out.collect()


def test_verify_liveness_on_planted_corruptions(spark, fit):
    C, assigned = fit

    def kinds(got):
        return {
            r["kind"]
            for r in _kmeans_violations(spark, SF_SMALL, C, got).collect()
        }

    # reassigning one vector to the other side of the argmin
    one = assigned.orderBy("vec_id").limit(1)
    vid = one.collect()[0]["vec_id"]
    flipped = assigned.withColumn(
        "cluster",
        F.when(
            F.col("vec_id") == vid,
            (F.col("cluster") + 1) % _KMEANS_K,
        ).otherwise(F.col("cluster")),
    )
    got = kinds(flipped)
    assert {"not_nearest_centroid", "reported_dist2_mismatch"} & got

    # dropping a vector / inventing one / duplicating one
    doctored = (
        assigned.filter(F.col("vec_id") != vid)
        .unionByName(
            spark.createDataFrame(
                [(10_000_000, 0, 0.0)],
                "vec_id long, cluster int, dist2 double",
            )
        )
        .unionByName(assigned.orderBy(F.col("vec_id").desc()).limit(1))
    )
    got = kinds(doctored)
    assert {"missing_vector", "extra_vector", "duplicate_vector"} <= got

    # out-of-range cluster id
    oob = assigned.withColumn(
        "cluster",
        F.when(F.col("vec_id") == vid, F.lit(99)).otherwise(F.col("cluster")),
    )
    assert "cluster_out_of_range" in kinds(oob)

    # stale assignment (all vectors in cluster 0 with fake dist2=0):
    # breaks argmin/dist checks AND the one-step descent bound
    stale = assigned.select(
        "vec_id", F.lit(0).cast("int").alias("cluster"), F.lit(0.0).alias("dist2")
    )
    got = kinds(stale)
    assert "objective_increased_after_step" in got or {
        "not_nearest_centroid",
        "reported_dist2_mismatch",
    } & got


def test_empty_corpus_guard(spark, tmp_path):
    sf = str(tmp_path / "sf_empty")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    assert QUERIES["embedding_kmeans"](spark, sf).count() == 0
    assert QUERIES["embedding_kmeans_verify"](spark, sf).count() == 0


def test_kmeans_handles_sparse_and_tiny_id_spaces(spark, tmp_path):
    """Review fix pin: the seed pick must survive vec_id spaces with no
    multiples of the old stride (sparse odd-only ids) and corpora
    smaller than K (seeds duplicated, never an IndexError), in both the
    op and its verifier."""
    import random

    rng = random.Random(7)

    def corpus(ids):
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(64)], 0) for i in ids
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    # odd-only ids: the old pmod(vec_id, n//K)==0 stride found nothing
    sf1 = str(tmp_path / "sf_odd")
    corpus(range(1, 33, 2)).write.parquet(f"{sf1}/embeddings.parquet")
    assert QUERIES["embedding_kmeans"](spark, sf1).count() == 16
    assert QUERIES["embedding_kmeans_verify"](spark, sf1).count() == 0

    # corpus smaller than K
    sf2 = str(tmp_path / "sf_tiny")
    corpus([5, 900]).write.parquet(f"{sf2}/embeddings.parquet")
    assert QUERIES["embedding_kmeans"](spark, sf2).count() == 2
    assert QUERIES["embedding_kmeans_verify"](spark, sf2).count() == 0

    # snowflake-scale ids: a raw vec_id * KNUTH seed hash overflows
    # int64 at vec_id >= ~3.47e9 and ANSI Spark ABORTS (the portable
    # 16-bit decomposition must be used instead — CLAUDE.md rule)
    sf3 = str(tmp_path / "sf_big_ids")
    corpus(range(5_000_000_000, 5_000_000_000 + 40)).write.parquet(
        f"{sf3}/embeddings.parquet"
    )
    assert QUERIES["embedding_kmeans"](spark, sf3).count() == 40
    assert QUERIES["embedding_kmeans_verify"](spark, sf3).count() == 0
