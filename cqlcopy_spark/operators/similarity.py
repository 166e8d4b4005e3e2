"""Similarity search over embeddings (SURVEY.md §2C op 31 + ANN extension).

Two paths, mirroring how a production vector pipeline is built:

- `similarity_topk` — exact brute force for a SMALL query set: broadcast
  the Q query vectors, one streaming pass over the N corpus vectors,
  per-query top-k via window. At 100 TB this is the right plan when
  Q is small (the corpus is scanned once, never shuffled; only Q×k rows
  survive to the window). Fully oracle-checked: the dot product is a
  sequential left-to-right fold in BOTH engines, so doubles match
  bitwise.

- `similarity_ann_lsh` — the scale path for large Q or all-pairs:
  random-hyperplane (SimHash-for-cosine) signatures bucket the corpus;
  candidates only join within a bucket. Hyperplane components are
  derived from xxhash64 — deterministic, no runtime randomness — but not
  expressible in DuckDB, and ANN recall < 1 by design ⇒ rows-only check.

Everything is higher-order array functions on the JVM: no Python UDF in
either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col
from pyspark.sql.window import Window

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import register

_N_QUERIES = 8  # vec_id < 8 are the query vectors
_TOP_K = 5


def _dot(x, y):
    """Sequential fold — matches DuckDB's list_reduce order exactly."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def _emb_double(c):
    return col(c).cast("array<double>")


_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({x}) + 1), i -> {x}[i] * {y}[i])), (a, b) -> a + b)"
)


def _sql_dot(x: str, y: str) -> str:
    return _DOT_SQL.format(x=x, y=y)


_TOPK_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt({_sql_dot('emb', 'emb')}) AS nrm FROM e),
q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM n WHERE vec_id < {_N_QUERIES}),
sims AS (
  SELECT q.q_id, n.vec_id AS n_id,
         {_sql_dot('q.q_emb', 'n.emb')} / (q.q_nrm * n.nrm) AS cosine
  FROM q CROSS JOIN n
  WHERE n.vec_id != q.q_id
),
ranked AS (
  SELECT q_id, n_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
  FROM sims
)
SELECT q_id, n_id, cosine, rank FROM ranked WHERE rank <= {_TOP_K}
"""


@register("similarity_topk", oracle=_TOPK_ORACLE)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for {Q} query vectors against the corpus.
    Physical shape: broadcast-nested-loop of Q (tiny) × corpus scan —
    the corpus is read once and never shuffled; the window sees ≤ Q × N
    rows but AQE keeps partitions balanced and only Q × k rows survive."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double("embedding").alias("emb")
    )
    n = e.withColumn("nrm", F.sqrt(_dot(col("emb"), col("emb"))))
    q = (
        n.filter(col("vec_id") < _N_QUERIES)
        .select(
            col("vec_id").alias("q_id"),
            col("emb").alias("q_emb"),
            col("nrm").alias("q_nrm"),
        )
    )
    sims = (
        n.join(broadcast(q), col("vec_id") != col("q_id"))
        .select(
            "q_id",
            col("vec_id").alias("n_id"),
            (_dot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(col("cosine").desc(), col("n_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(col("rank") <= _TOP_K)
        .select("q_id", "n_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# ANN: random-hyperplane LSH buckets
# ---------------------------------------------------------------------------

_N_PLANES = 8  # 256 buckets; tune buckets ≈ corpus/bucket_size at scale


def _lsh_sig(emb):
    """8-bit hyperplane signature. Component s_{m,i} ∈ {+1, -1} is derived
    from xxhash64(m, i): deterministic pseudo-randomness, no RNG state to
    ship to executors."""
    def plane_bit(m):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.transform(
                    F.sequence(F.lit(0), F.size(emb) - 1),
                    lambda i: F.pmod(F.xxhash64(F.lit(m), i), F.lit(2)) * 2 - 1,
                ),
                lambda v, s: v * s.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** m)

    sig = plane_bit(0)
    for m in range(1, _N_PLANES):
        sig = sig + plane_bit(m)
    return sig


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs
# ---------------------------------------------------------------------------

_NEARDUP_COS = 0.4  # this corpus has no planted dups; threshold sits at the top tail

_NEARDUP_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, emb, sqrt({_sql_dot('emb', 'emb')}) AS nrm FROM e)
SELECT a.vec_id AS v1, b.vec_id AS v2,
       {_sql_dot('a.emb', 'b.emb')} / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_sql_dot('a.emb', 'b.emb')} / (a.nrm * b.nrm) >= {_NEARDUP_COS}
"""


@register("dedup_embedding_cosine", oracle=_NEARDUP_ORACLE)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs cosine near-dup over embeddings (v1 < v2,
    cosine ≥ {t}). Physical shape here: broadcast-nested-loop — one side
    broadcast, the corpus scanned once, no shuffle; exactness requires
    visiting every pair, so the honest 100 TB plan is blocked matrix
    multiply (repartition both sides into B blocks, join the B² block
    pairs, BLAS inside mapInPandas per block pair) — same output, and
    each task is a dense GEMM. The LSH prefilter variant
    (similarity_ann_lsh's bucketing) is the sub-quadratic option when
    recall < 1 is acceptable. Dot products fold sequentially, so doubles
    are bitwise-equal to the DuckDB oracle."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double("embedding").alias("emb")
    )
    n = e.withColumn("nrm", F.sqrt(_dot(col("emb"), col("emb"))))
    a = n.alias("a")
    b = broadcast(n.select(
        col("vec_id").alias("b_vec_id"),
        col("emb").alias("b_emb"),
        col("nrm").alias("b_nrm"),
    ))
    cos = _dot(col("emb"), col("b_emb")) / (col("nrm") * col("b_nrm"))
    return (
        a.join(b, col("vec_id") < col("b_vec_id"))
        .select(
            col("vec_id").alias("v1"),
            col("b_vec_id").alias("v2"),
            cos.alias("cosine"),
        )
        .filter(col("cosine") >= _NEARDUP_COS)
    )


@register("similarity_ann_lsh")  # rows-only: ANN recall < 1 by design
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: query and corpus vectors hash to 256
    hyperplane buckets; candidates are corpus vectors in the query's
    bucket; exact cosine + top-k within candidates.

    Scale: the bucket join shuffles on sig (a single int) — candidate
    volume is N/256 per query instead of N. More planes / multi-probe
    trade recall for candidate count; IVF (k-means cells) would replace
    the hash with learned centroids, same join shape."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double("embedding").alias("emb")
    )
    n = e.withColumn("nrm", F.sqrt(_dot(col("emb"), col("emb")))).withColumn(
        "sig", _lsh_sig(col("emb"))
    )
    q = (
        n.filter(col("vec_id") < _N_QUERIES)
        .select(
            col("vec_id").alias("q_id"),
            col("emb").alias("q_emb"),
            col("nrm").alias("q_nrm"),
            col("sig").alias("q_sig"),
        )
    )
    cands = n.join(
        broadcast(q), (col("sig") == col("q_sig")) & (col("vec_id") != col("q_id"))
    )
    sims = cands.select(
        "q_id",
        col("vec_id").alias("n_id"),
        (_dot(col("q_emb"), col("emb")) / (col("q_nrm") * col("nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(col("cosine").desc(), col("n_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(col("rank") <= _TOP_K)
        .select("q_id", "n_id", "cosine", "rank")
    )
