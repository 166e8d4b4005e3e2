"""Link-graph analytics: PageRank-style quality propagation over the
document provenance graph — the crawl-side signal (domain authority)
that large-scale corpus curation mixes into quality scores, and the
second iterative-algorithm surface alongside dedup_components' label
propagation.

The fixture corpus carries no real hyperlinks (the same constraint
url_domains_top documents), so the edge list is synthesized
deterministically from doc_id arithmetic: each document links its own
source domain to two derived domains. The synthesis is incidental —
every plan property (edge aggregation, per-iteration join shape,
convergence loop) is edge-list-agnostic.

No oracle: PageRank is iterative and its per-node sums are float folds
whose order Spark does not fix, so the driver records rows-only; the
numeric contract is pinned by tests/test_graph_pagerank.py against a
pure-Python reference within 1e-9 (same pattern as bpe_train_merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import register

_DAMPING = 0.85
_ITERATIONS = 8


def link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain→domain edge list: (src, dst, weight), self-links
    dropped, weight = link count. One scan + one shuffle on the edge
    key; at 100 TB this is the standard extract-aggregate that turns a
    raw link table into the graph input."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    # dst1 lands only on src0..src6 — a hub stratum, so in-degree (and
    # therefore rank) is deliberately skewed; dst2 spreads over all 20
    dst1 = F.concat(F.lit("src"), (col("doc_id") % 7).cast("string"))
    dst2 = F.concat(F.lit("src"), ((col("doc_id") * 13 + 5) % 20).cast("string"))
    links = d.select(
        col("source").alias("src"), F.explode(F.array(dst1, dst2)).alias("dst")
    ).filter(col("src") != col("dst"))
    return links.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))


@register("graph_pagerank")  # rows-only: iterative float folds (see module doc)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank, 8 fixed iterations, damping 0.85.

    Shape per iteration: rank table (node, pr) joins the edge list on
    src — both sides hash-partitioned on the SAME key, so iterations
    reuse one partitioning — then one shuffle aggregates contributions
    by dst, and a left join from the node table fills in nodes with no
    inbound links at the teleport floor. State per iteration is one
    node-sized DataFrame, persisted so the next join does not replay
    the whole lineage, and unpersisted when superseded (the
    dedup_components discipline). Every node in this graph has
    out-degree ≥ 1 by construction, so no dangling-mass term is needed;
    a production corpus adds the standard dangling redistribution as
    one extra scalar aggregate per iteration.

    Driver involvement: ONE scalar (the node count) before the loop;
    ranks never leave the executors."""
    edges = link_edges(spark, sf_dir).persist()
    nodes = (
        edges.select(col("src").alias("node"))
        .unionByName(edges.select(col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one driver-side scalar, sizes the teleport term
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # edge transition weight: w/out_w, computed once outside the loop
    trans = edges.join(out_w, "src").select(
        "src", "dst", (col("weight") / col("out_w")).alias("t")
    ).persist()
    base = 1.0 - _DAMPING
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    materialized = None
    for it in range(1, _ITERATIONS + 1):
        contrib = (
            trans.join(pr, col("src") == col("node"))
            .select("dst", (col("pr") * col("t")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_c"))
        )
        pr = nodes.join(contrib, col("node") == col("dst"), "left").select(
            "node",
            (
                F.lit(base / n)
                + F.lit(_DAMPING) * F.coalesce(col("in_c"), F.lit(0.0))
            ).alias("pr"),
        )
        # Checkpoint-interval discipline: cutting lineage EVERY round
        # costs a full job per iteration (driver-latency-bound — it
        # tripled this op's wall time locally); letting it grow forever
        # makes task (re)computation quadratic in rounds. Materialize
        # every 4th round — lineage depth stays bounded, job count is
        # iterations/4.
        if it % 4 == 0 and it < _ITERATIONS:
            nxt = pr.persist()
            nxt.count()  # materialize before dropping the predecessor
            if materialized is not None:
                materialized.unpersist()
            materialized = nxt
            pr = nxt
    return pr.orderBy(col("pr").desc(), "node")
