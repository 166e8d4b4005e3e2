"""Link-graph analytics over the document provenance graph:
PageRank-style quality propagation (the crawl-side domain-authority
signal large-scale corpus curation mixes into quality scores — the
second iterative-algorithm surface alongside dedup_components' label
propagation) and degree-oriented triangle counting / local clustering
(the community-density signal, fully oracled).

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


def undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical undirected edge set (a < b, distinct) of the synthetic
    domain link graph — shared input of graph_triangles and
    graph_link_predict. One scan + one distinct shuffle."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    dst1 = F.concat(F.lit("src"), (col("doc_id") % 7).cast("string"))
    dst2 = F.concat(F.lit("src"), ((col("doc_id") * 13 + 5) % 20).cast("string"))
    links = d.select(
        col("source").alias("src"), F.explode(F.array(dst1, dst2)).alias("dst")
    ).filter(col("src") != col("dst"))
    return links.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()


_TRIANGLE_ORACLE = """
WITH links AS (
  SELECT source AS src, 'src' || CAST(doc_id % 7 AS VARCHAR) AS dst
  FROM documents
  UNION ALL
  SELECT source, 'src' || CAST((doc_id * 13 + 5) % 20 AS VARCHAR)
  FROM documents
),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM links WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
  GROUP BY node
),
k AS (
  SELECT node, d,
         lpad(CAST(d AS VARCHAR), 12, '0') || '|' || node AS okey
  FROM deg
),
o AS (
  SELECT CASE WHEN ka.okey < kb.okey THEN e.a ELSE e.b END AS src,
         CASE WHEN ka.okey < kb.okey THEN e.b ELSE e.a END AS dst,
         CASE WHEN ka.okey < kb.okey THEN kb.okey ELSE ka.okey END AS dst_okey
  FROM e
  JOIN k ka ON ka.node = e.a
  JOIN k kb ON kb.node = e.b
),
tri AS (
  SELECT w.u, w.v, w.w2
  FROM (
    SELECT o1.src AS u, o1.dst AS v, o2.dst AS w2
    FROM o o1 JOIN o o2
      ON o1.src = o2.src AND o1.dst_okey < o2.dst_okey
  ) w
  JOIN o oc ON oc.src = w.v AND oc.dst = w.w2
),
pernode AS (
  SELECT node, COUNT(*) AS t
  FROM (
    SELECT u AS node FROM tri
    UNION ALL SELECT v AS node FROM tri
    UNION ALL SELECT w2 AS node FROM tri
  )
  GROUP BY node
)
SELECT k.node,
       CAST(k.d AS BIGINT) AS degree,
       CAST(COALESCE(p.t, 0) AS BIGINT) AS triangles,
       CASE WHEN k.d >= 2
            THEN CAST(2 * COALESCE(p.t, 0) AS DOUBLE)
                 / CAST(k.d * (k.d - 1) AS DOUBLE)
            ELSE 0.0 END AS clustering
FROM k LEFT JOIN pernode p ON p.node = k.node
ORDER BY k.node
"""


def _triangle_stats(
    spark: SparkSession, sf_dir: str, broadcast_nodes: bool = True
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over the
    undirected domain link graph — the third classic graph workload
    beside PageRank and connected components, and the standard
    community-density signal corpus curation mixes into domain scores.

    Scale design (the curse-of-the-last-reducer fix): every canonical
    edge is ORIENTED from its (degree, node)-smaller endpoint to the
    larger, so each wedge is generated exactly once at its lowest-rank
    apex and out-degree is O(sqrt(m)) for ANY degree distribution —
    the wedge self-join materializes Sum d_out^2 = O(m^1.5) rows, never
    the Sum d^2 a hub-apex join would. Each triangle {x<y<z} is
    produced exactly once (only x has two out-edges into it) and closed
    by one equi-join back to the oriented edge set. The orientation key
    packs degree into a fixed-width string so one lexicographic compare
    totally orders nodes identically in both engines.

    Plan: oriented edge set persisted once (three consumers: both wedge
    sides + the closing join — self-joins re-execute lineage
    otherwise); degree table broadcast (node-sized; at web-graph |V|
    this becomes a shuffle join on node, same plan shape). Clustering
    coefficient is ONE IEEE double division of exact integers, bitwise
    across engines."""
    e = undirected_edges(spark, sf_dir)
    deg = (
        e.select(col("a").alias("node"))
        .unionByName(e.select(col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    k = deg.withColumn("okey", F.format_string("%012d|%s", col("d"), col("node")))
    # broadcast_nodes=True assumes a DOMAIN-level graph (|V| ≪ |E|, node
    # table is KB-scale); graph_triangles_pages passes False for the
    # page-level case (|V| ~ corpus size), leaving the order-key table
    # unhinted so size stats/AQE pick the join — broadcast while it
    # fits, shuffle-on-node past the ceiling instead of aborting
    hint = F.broadcast if broadcast_nodes else (lambda df: df)
    ka = hint(k.select(col("node").alias("a"), col("okey").alias("okey_a")))
    kb = hint(k.select(col("node").alias("b"), col("okey").alias("okey_b")))
    lo_first = col("okey_a") < col("okey_b")
    o = (
        e.join(ka, "a")
        .join(kb, "b")
        .select(
            F.when(lo_first, col("a")).otherwise(col("b")).alias("src"),
            F.when(lo_first, col("b")).otherwise(col("a")).alias("dst"),
            F.when(lo_first, col("okey_b")).otherwise(col("okey_a")).alias(
                "dst_okey"
            ),
        )
        .persist()
    )
    o1 = o.select(col("src").alias("u"), col("dst").alias("v"), "dst_okey")
    o2 = o.select(
        col("src").alias("u"),
        col("dst").alias("w2"),
        col("dst_okey").alias("okey2"),
    )
    wedges = o1.join(o2, "u").filter(col("dst_okey") < col("okey2"))
    tri = wedges.join(
        o.select(col("src").alias("v"), col("dst").alias("w2")), ["v", "w2"]
    )
    pernode = (
        tri.select(col("u").alias("node"))
        .unionByName(tri.select(col("v").alias("node")))
        .unionByName(tri.select(col("w2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        k.join(pernode, "node", "left")
        .select(
            "node",
            col("d").alias("degree"),
            F.coalesce(col("t"), F.lit(0)).alias("triangles"),
            F.when(
                col("d") >= 2,
                (F.lit(2) * F.coalesce(col("t"), F.lit(0))).cast("double")
                / (col("d") * (col("d") - 1)).cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
        .orderBy("node")
    )


@register("graph_triangles", oracle=_TRIANGLE_ORACLE)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-graph triangle counting (|V| ≪ |E|: node/order-key tables
    broadcast by explicit hint). See _triangle_stats."""
    return _triangle_stats(spark, sf_dir, broadcast_nodes=True)


@register("graph_triangles_pages", oracle=_TRIANGLE_ORACLE)
def graph_triangles_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-graph triangle counting (r8 VERDICT item 7): |V| ~ corpus
    size, so the order-key table must NOT carry an unconditional
    broadcast hint — an explicit hint aborts at the 8 GB ceiling when
    the node table is web-scale. This variant leaves every node-table
    join unhinted: size stats/AQE broadcast while it fits (identical
    plan at bench SF, pinned) and degrade to a shuffle join on node
    past the ceiling (pinned with broadcasts force-disabled — the plan
    stays SMJ, no cartesian, no abort). Same relation, same oracle, as
    graph_triangles; the wedge O(m^1.5) bound is orientation-derived
    and independent of the node-join strategy."""
    return _triangle_stats(spark, sf_dir, broadcast_nodes=False)


_LINK_PREDICT_CAP = 64  # apex degree cap: hub neighbors carry no signal
_LINK_PREDICT_TOPN = 20

_LINK_PREDICT_ORACLE = f"""
WITH links AS (
  SELECT source AS src, 'src' || CAST(doc_id % 7 AS VARCHAR) AS dst
  FROM documents
  UNION ALL
  SELECT source, 'src' || CAST((doc_id * 13 + 5) % 20 AS VARCHAR)
  FROM documents
),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM links WHERE src <> dst
),
adj AS (
  SELECT a AS node, b AS nb FROM e
  UNION ALL
  SELECT b AS node, a AS nb FROM e
),
deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY node),
af AS (
  SELECT adj.node, adj.nb
  FROM adj JOIN deg ON deg.node = adj.node
  WHERE deg.d <= {_LINK_PREDICT_CAP}
),
pairs AS (
  SELECT a1.nb AS x, a2.nb AS y, COUNT(*) AS cn
  FROM af a1 JOIN af a2 ON a1.node = a2.node AND a1.nb < a2.nb
  GROUP BY a1.nb, a2.nb
),
cand AS (
  SELECT p.x, p.y, p.cn, dx.d AS dx, dy.d AS dy
  FROM pairs p
  JOIN deg dx ON dx.node = p.x
  JOIN deg dy ON dy.node = p.y
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = p.x AND e.b = p.y)
)
SELECT x, y,
       CAST(cn AS BIGINT) AS common_neighbors,
       CAST(cn AS DOUBLE) / CAST(dx + dy - cn AS DOUBLE) AS jaccard
FROM cand
ORDER BY jaccard DESC, cn DESC, x, y
LIMIT {_LINK_PREDICT_TOPN}
"""


def _link_predictions(
    spark: SparkSession, sf_dir: str, broadcast_degrees: bool = True
) -> DataFrame:
    """Common-neighbor link prediction: the top-{N} NON-edges ranked by
    neighborhood Jaccard |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the classic
    "should these two domains be linked" signal, and the pairwise-
    similarity workload over graph adjacency rather than embeddings.

    Scale design: common-neighbor pairs are generated per APEX (the
    shared neighbor), which is inherently Sum d(apex)^2 — the output
    itself is that large — so apexes above a degree cap are dropped
    before the self-join (hub removal, standard in link prediction:
    a hub is adjacent to everything and discriminates nothing). Pair
    volume is then Sum min(d, cap)^2, the same Sum-block^2 discipline
    as the dedup blockers. At fixture degrees the cap excludes nothing,
    so the oracle is exhaustively exact. Candidates anti-join the edge
    set (predictions must be NON-edges), Jaccard is exact integers with
    ONE IEEE double division, and the top-N boundary is made
    deterministic by the (jaccard, cn, x, y) tiebreak. Capped adjacency
    is persisted once for both sides of the self-join; degree lookups
    broadcast (node-sized — shuffle join at web-graph |V|)."""
    e = undirected_edges(spark, sf_dir).persist()
    adj = e.select(col("a").alias("node"), col("b").alias("nb")).unionByName(
        e.select(col("b").alias("node"), col("a").alias("nb"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    # broadcast_degrees=True is the domain-level-graph assumption (deg
    # is node-sized, KB here); graph_link_predict_pages passes False so
    # size stats/AQE pick the degree joins — the page-level |V| ~ corpus
    # case shuffles on node past the ceiling instead of aborting
    hint = F.broadcast if broadcast_degrees else (lambda df: df)
    af = (
        adj.join(hint(deg), "node")
        .filter(col("d") <= _LINK_PREDICT_CAP)
        .select("node", "nb")
        .persist()
    )
    a1 = af.select("node", col("nb").alias("x"))
    a2 = af.select("node", col("nb").alias("y"))
    pairs = (
        a1.join(a2, "node")
        .filter(col("x") < col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    # same domain-level-graph assumption as above: degree lookups stay
    # hinted only while nodes ≪ edges; the pages variant leaves them
    # to the optimizer
    dx = hint(deg.select(col("node").alias("x"), col("d").alias("dx")))
    dy = hint(deg.select(col("node").alias("y"), col("d").alias("dy")))
    cand = (
        pairs.join(dx, "x")
        .join(dy, "y")
        .join(
            e.select(col("a").alias("x"), col("b").alias("y")),
            ["x", "y"],
            "left_anti",
        )
    )
    jaccard = (
        col("cn").cast("double")
        / (col("dx") + col("dy") - col("cn")).cast("double")
    ).alias("jaccard")
    return (
        cand.select("x", "y", col("cn").alias("common_neighbors"), jaccard)
        .orderBy(
            col("jaccard").desc(), col("common_neighbors").desc(), "x", "y"
        )
        .limit(_LINK_PREDICT_TOPN)
    )


@register("graph_link_predict", oracle=_LINK_PREDICT_ORACLE)
def graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-graph link prediction (|V| ≪ |E|: degree tables broadcast
    by explicit hint). See _link_predictions."""
    return _link_predictions(spark, sf_dir, broadcast_degrees=True)


@register("graph_link_predict_pages", oracle=_LINK_PREDICT_ORACLE)
def graph_link_predict_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAGE-graph link prediction (r8 VERDICT item 7): degree-table
    joins left unhinted so a web-scale node table (|V| ~ corpus)
    degrades to a shuffle join on node instead of aborting at the 8 GB
    broadcast ceiling — same relation, same oracle, as
    graph_link_predict; the hub cap's Sum min(d, cap)^2 pair bound is
    independent of the degree-join strategy."""
    return _link_predictions(spark, sf_dir, broadcast_degrees=False)


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
    ranks never leave the executors.

    r16 A/B (guide §1.1: empirical beats first-principles): a
    single-SQL WITH-chain rewrite of this loop (motivated by the
    per-level eager-analysis cost) measured SLOWER than this loop form
    at BOTH bench configs on an idle host — loop 3.55 s vs chain
    5.28 s (local[32], sf0.1, min-of-3) and 2.56 s vs 4.66 s
    (local[8]) — because the chain inlines the persisted trans/nodes
    views into every iteration subtree of ONE query, whose ~16
    broadcast builds then race to fill the unfilled caches (the r14
    recompute-per-branch class) and whose single AQE DAG re-optimizes
    a ~300-node plan per stage; the full-bench reading was worse still
    (14.5 s vs 5.2 s). The loop's every-4th-round persist breaks
    exactly that. Kept as the loop on the measurement."""
    edges = link_edges(spark, sf_dir).persist()
    nodes = (
        edges.select(col("src").alias("node"))
        .unionByName(edges.select(col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one driver-side scalar, sizes the teleport term
    if n == 0:
        # empty link graph (no documents): the rank vector over zero
        # nodes is the empty relation — returning it beats a
        # ZeroDivisionError from the 1/n teleport term
        return nodes.select("node", F.lit(0.0).alias("pr")).limit(0)
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


# ---------------------------------------------------------------------------
# graph_pagerank_verify — driver-red escape hatch for the rows-only PageRank
# ---------------------------------------------------------------------------

# graph_pagerank's driver check is rows-only (iterative float folds have
# no stable SQL oracle), which r7's audit called out as the largest op
# without a driver-visible failure mode. Pattern copied from
# similarity_ann_verify (similarity.py): recompute the op's INVARIANTS
# independently and emit one row per violation — the oracle is the empty
# relation, so the driver's row-count + hash compare turns any violation
# into a red verdict. The exact per-node values stay pinned to 1e-9
# against the pure-Python reference in tests/test_graph_pagerank.py.

_PR_VERIFY_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS node,
       CAST(NULL AS DOUBLE) AS metric
WHERE 1 = 0
"""


def _pagerank_violations(
    spark: SparkSession, sf_dir: str, pr: DataFrame
) -> DataFrame:
    """Invariant violations of a claimed PageRank vector `pr(node, pr)`
    over the sf_dir link graph; empty iff the claim is consistent.

    Checked invariants (all with engine-robust slack):
    - distribution: |sum(pr) - 1| <= n * 1e-9 (the graph has no dangling
      nodes, so the iteration is exactly mass-preserving up to float
      association order);
    - teleport floor: pr >= (1-d)/n - 1e-12 for EVERY node, and the node
      set is exactly the graph's (missing/extra nodes each emit a row);
    - contraction residual: one MORE power-iteration step moves the
      vector by at most ||pr_1 - pr_0||_1 * d^k in L1 (the Markov
      operator is a d-contraction in L1), so after k=8 fixed iterations
      ||step(pr) - pr||_1 <= 2 * 0.85^8 ~ 0.545; a corrupted vector
      (permuted, rescaled, wrong damping) breaks this long before it
      breaks positivity. Checked with slack 1e-9.
    """
    # persist: FOUR consumers (nodes.distinct, the missing-node
    # anti-join, out_w, and the trans self-join) — unpersisted, each
    # re-runs the documents scan + edge groupBy (CLAUDE.md self-join rule)
    edges = link_edges(spark, sf_dir).persist()
    nodes = (
        edges.select(col("src").alias("node"))
        .unionByName(edges.select(col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # same single driver scalar graph_pagerank uses
    base = 1.0 - _DAMPING
    if n == 0:
        # empty graph: graph_pagerank returns the empty vector, which is
        # trivially consistent — emit the (empty) violations schema
        # instead of dividing by zero for the teleport floor. A claimed
        # nonempty pr over an empty graph still violates: every claimed
        # node is an extra_node.
        return pr.select(
            F.lit("extra_node").alias("kind"),
            col("node"),
            col("pr").alias("metric"),
        ).orderBy("kind", "node")
    floor = base / n

    pr = pr.persist()

    # node-set parity: every graph node claimed exactly once
    missing = nodes.join(pr, "node", "left_anti").select(
        F.lit("missing_node").alias("kind"),
        col("node"),
        F.lit(None).cast("double").alias("metric"),
    )
    extra = pr.join(nodes, "node", "left_anti").select(
        F.lit("extra_node").alias("kind"),
        col("node"),
        col("pr").alias("metric"),
    )

    below_floor = pr.filter(col("pr") < F.lit(floor - 1e-12)).select(
        F.lit("below_teleport_floor").alias("kind"),
        col("node"),
        col("pr").alias("metric"),
    )

    total = pr.agg(F.sum("pr").alias("s"))
    bad_sum = total.filter(
        F.abs(col("s") - F.lit(1.0)) > F.lit(n * 1e-9)
    ).select(
        F.lit("mass_not_one").alias("kind"),
        F.lit(None).cast("string").alias("node"),
        col("s").alias("metric"),
    )

    # one extra power-iteration step, the same join shape as the op
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    trans = edges.join(out_w, "src").select(
        "src", "dst", (col("weight") / col("out_w")).alias("t")
    )
    contrib = (
        trans.join(pr, col("src") == col("node"))
        .select("dst", (col("pr") * col("t")).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("in_c"))
    )
    stepped = nodes.join(contrib, col("node") == col("dst"), "left").select(
        "node",
        (
            F.lit(floor) + F.lit(_DAMPING) * F.coalesce(col("in_c"), F.lit(0.0))
        ).alias("pr2"),
    )
    l1_bound = 2.0 * _DAMPING**_ITERATIONS + 1e-9
    residual = stepped.join(pr, "node").agg(
        F.sum(F.abs(col("pr2") - col("pr"))).alias("l1")
    )
    bad_residual = residual.filter(col("l1") > F.lit(l1_bound)).select(
        F.lit("residual_exceeds_contraction_bound").alias("kind"),
        F.lit(None).cast("string").alias("node"),
        col("l1").alias("metric"),
    )

    return (
        missing.unionByName(extra)
        .unionByName(below_floor)
        .unionByName(bad_sum)
        .unionByName(bad_residual)
        .orderBy("kind", "node")
    )


@register("graph_pagerank_verify", oracle=_PR_VERIFY_ORACLE)
def graph_pagerank_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-runs graph_pagerank and emits its invariant violations
    (expected EMPTY — see _pagerank_violations for the invariants and
    the module comment for why this exists). Cost: one extra pass over
    the node-sized rank table plus one edge join — the price of giving
    the driver a red verdict on the otherwise rows-only op; the
    planted-corruption liveness pin lives in
    tests/test_graph_pagerank.py."""
    return _pagerank_violations(spark, sf_dir, graph_pagerank(spark, sf_dir))
