"""Dataset profiling and data-quality enforcement — the pre-flight
surface a 100 TB ingest runs before any training job touches the data:
per-column statistical profiles, declarative expectation suites
(Great-Expectations / dbt-test class), key-skew diagnosis for the
partitioning decisions everything downstream depends on, and one-pass
correlation screening between candidate quality signals.

The reference has no profiling surface at all (SURVEY.md §0 — it is a
CSV↔Cassandra loader whose only "quality" signal is the parse/insert
error budget, write.go:140-147); this extends §2C's curation ops. Every
operator here is single-pass conditional aggregation — no Python, no
iteration, map-side partials ahead of every shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import register

# ---------------------------------------------------------------------------
# profile_columns — one-scan per-column statistical profile
# ---------------------------------------------------------------------------

# Profiled columns of lineitem: a key, a low-cardinality code, and two
# measures — the four shapes a profiler must distinguish. min/max are
# emitted in string wire form so one tall result covers heterogeneous
# column types (the driver hash cannot mix types in one column anyway);
# doubles route through the same repr on both engines because the
# fixture's measures carry ≤2 decimals (shortest-roundtrip repr of a
# 2-decimal double is identical in Java and C++ printers).
_PROFILE_COLS = ["l_orderkey", "l_returnflag", "l_quantity", "l_discount"]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_s,
       CAST(MAX({c}) AS VARCHAR) AS max_s
FROM lineitem
"""
    for c in _PROFILE_COLS
)


@register("profile_columns", oracle=_PROFILE_ORACLE)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tall per-column profile (rows, nulls, exact distinct, min/max)
    of lineitem in TWO hash-aggregate passes, K-independent. The oracle
    is the naive form — K scans, one per column; the Spark plan is:

      1. plain branch: all K columns' rows/nulls/min/max in one global
         hash aggregate (typed min/max BEFORE the string wire-cast, so
         numeric ordering is preserved), stacked tall;
      2. distinct branch: stack each row to (column, value-string) —
         string casts are injective on distinct values, so equality is
         preserved — then the classic two-phase exact distinct:
         groupBy(column, value) dedup, groupBy(column) count. Both
         phases are plain HashAggregates that parallelize over
         (column, value), with no per-partition sort anywhere;
      3. broadcast-join the K-row branches.

    Why not one agg with K countDistinct()s: Spark's
    RewriteDistinctAggregates turns that into an Expand plus a
    SortAggregate whose buffer holds 5K filtered first()/min()/max()
    states — it sorts the K×N expanded rows inside whatever few
    partitions the scan produced, and the generated aggregate code is
    big enough that every reuse recompiles it (~4 s/run at sf0.1 vs
    ~0.1 s for this plan). The two-branch form reads the parquet twice,
    but both reads prune to the K profiled columns, and every operator
    is a parallel hash aggregate — the shape that survives both a
    3-split local file and a 100 TB table. Distinct counts are EXACT
    (the expectation-suite contract); approx_count_distinct is the
    cheaper knob when ±2% is fine (agg_approx covers that surface).
    """
    li = table(spark, sf_dir, "lineitem")
    plain_aggs = []
    for c in _PROFILE_COLS:
        plain_aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    plain = li.agg(*plain_aggs).selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_null, min_s, max_s)"
    )
    tall_args = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS
    )
    dist = (
        table(spark, sf_dir, "lineitem")
        .selectExpr(f"stack({len(_PROFILE_COLS)}, {tall_args}) AS (column_name, v)")
        .filter(col("v").isNotNull())
        .groupBy("column_name", "v")
        .agg(F.lit(1))
        .groupBy("column_name")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    # LEFT join: an all-NULL (or empty-table) column produces no row in
    # the distinct branch — an inner join would silently drop exactly
    # the most broken column from the profile; the oracle emits its
    # n_distinct = 0 row either way
    return plain.join(F.broadcast(dist), "column_name", "left").select(
        "column_name",
        "n_rows",
        "n_null",
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        "min_s",
        "max_s",
    )


# ---------------------------------------------------------------------------
# dq_expectations — declarative expectation suite over the warehouse
# ---------------------------------------------------------------------------

# Each rule is (name, checked-set, violation-predicate). Referential
# rules count orphans via anti join — the one expectation class that
# needs a second table. Output is the suite report: violations,
# checked, pass/fail.
_DQ_ORACLE = """
SELECT 'lineitem_qty_range' AS rule,
       CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
            AS BIGINT) AS n_violations,
       COUNT(*) AS n_checked
FROM lineitem
UNION ALL
SELECT 'lineitem_discount_range',
       CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)
            AS BIGINT),
       COUNT(*)
FROM lineitem
UNION ALL
SELECT 'orders_status_domain',
       CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F', 'O', 'P'))
            AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'orders_custkey_not_null',
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
       COUNT(*)
FROM orders
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST(COUNT(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT),
       COUNT(*)
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT),
       COUNT(*)
FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
UNION ALL
SELECT 'documents_nonempty_text',
       CAST(COUNT(*) FILTER (WHERE text IS NULL OR length(text) = 0)
            AS BIGINT),
       COUNT(*)
FROM documents
"""


@register("dq_expectations", oracle=_DQ_ORACLE)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite run: domain/range/null rules as conditional
    counts, referential rules as left-join orphan counts — and each
    table's rules share ONE aggregate over ONE scan (the referential
    join is folded into the same pass, so lineitem and documents are
    read exactly once; orders twice, as both a ruled table and the
    parent side of lineitem's FK). Everything reduces to one row per
    rule at the map side; the only real shuffles are the two FK joins,
    which is the irreducible cost of checking an FK at 100 TB. The
    report (not a filtered copy of the data) is the contract: gating a
    pipeline needs the counts, quarantining rows is a filter reusing
    the same predicates."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    d = table(spark, sf_dir, "documents")

    def _suite(df: DataFrame, rules: list[tuple[str, F.Column]]) -> DataFrame:
        # one aggregate for ALL of a table's rules — predicate and
        # referential alike (the left join preserves row multiplicity
        # because the parent keys are unique, so n_checked is exact)
        wide = df.agg(
            F.count(F.lit(1)).alias("n_checked"),
            *[
                F.sum(F.when(pred, 1).otherwise(0)).alias(f"v{i}")
                for i, (_, pred) in enumerate(rules)
            ],
        )
        stack = ", ".join(f"'{name}', v{i}" for i, (name, _) in enumerate(rules))
        return wide.selectExpr(
            f"stack({len(rules)}, {stack}) AS (rule, n_violations)", "n_checked"
        ).select("rule", "n_violations", "n_checked")

    # lineitem's referential rule rides the SAME scan as its range rules:
    # left-join the parent key in, then every rule is a conditional count
    # over the joined rows. Join strategy is left to AQE — orders is not
    # broadcastable at production scale, so this is a shuffle join on
    # l_orderkey, the unavoidable cost of checking the FK.
    li_rules = _suite(
        li.join(
            o.select(col("o_orderkey").alias("_parent_ok")),
            col("l_orderkey") == col("_parent_ok"),
            "left",
        ),
        [
            ("lineitem_qty_range", (col("l_quantity") < 1) | (col("l_quantity") > 50)),
            (
                "lineitem_discount_range",
                (col("l_discount") < 0) | (col("l_discount") > 0.1),
            ),
            ("lineitem_orphan_orderkey", col("_parent_ok").isNull()),
        ],
    )
    o_rules = _suite(
        o.join(
            c.select(col("c_custkey").alias("_parent_ck")),
            col("o_custkey") == col("_parent_ck"),
            "left",
        ),
        [
            ("orders_status_domain", ~col("o_orderstatus").isin("F", "O", "P")),
            ("orders_custkey_not_null", col("o_custkey").isNull()),
            ("orders_orphan_custkey", col("_parent_ck").isNull()),
        ],
    )
    d_rules = _suite(
        d,
        [
            (
                "documents_nonempty_text",
                col("text").isNull() | (F.length("text") == 0),
            )
        ],
    )
    return li_rules.unionByName(o_rules).unionByName(d_rules)


# ---------------------------------------------------------------------------
# skew_diagnose — partition-key hot-spot report
# ---------------------------------------------------------------------------

_SKEW_TOP = 20

_SKEW_ORACLE = f"""
WITH k AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
),
t AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
         COUNT(*) AS n_keys, CAST(MAX(cnt) AS BIGINT) AS max_cnt
  FROM k
)
SELECT user_id, cnt,
       CAST(cnt AS DOUBLE) / total AS share,
       CAST(cnt AS DOUBLE) * n_keys / total AS skew_factor
FROM k, t
ORDER BY cnt DESC, user_id
LIMIT {_SKEW_TOP}
"""


@register("skew_diagnose", oracle=_SKEW_ORACLE)
def skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key report for a prospective partitioning key: top-N keys by
    row count with their share of the table and skew factor
    (cnt / mean-per-key). This is the measurement step BEFORE choosing
    salting (join_skew_salted) or AQE skew-join thresholds — at 100 TB
    you diagnose on a cheap key-count aggregate, not by watching a
    straggler task die. Plan: one shuffle on the key with map-side
    partial counts, a single-row global summary joined back as a
    broadcast, TakeOrdered for the top-N (no global sort). Floats:
    share and skew_factor are SINGLE divisions of exact integers —
    bit-identical in both engines, no dsum needed; ties broken by
    user_id so the picked top-N is deterministic."""
    k = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()  # two consumers (summary + report); without this the
        # full events scan+aggregate would run twice
    )
    t = k.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    return (
        k.join(F.broadcast(t))
        .select(
            "user_id",
            "cnt",
            (col("cnt").cast("double") / col("total")).alias("share"),
            (col("cnt").cast("double") * col("n_keys") / col("total")).alias(
                "skew_factor"
            ),
        )
        .orderBy(col("cnt").desc(), "user_id")
        .limit(_SKEW_TOP)
    )


# ---------------------------------------------------------------------------
# corr_matrix — one-pass Pearson correlation matrix via exact moments
# ---------------------------------------------------------------------------

# Feature-correlation screening (which curation signals are redundant)
# over lineitem's three measures. Float portability is the whole
# design: every (co)moment is accumulated as EXACT integers — values
# become cents (2-decimal fixture data), per-row products stay < 2^63,
# and the sums ride DECIMAL(38,0) on the Spark side / HUGEINT on the
# DuckDB side, so shuffle order cannot perturb a single bit. Only
# AFTER aggregation does each moment become a double, and the closed
# form below is the identical IEEE expression tree in both engines
# (sqrt is correctly rounded everywhere; no other transcendentals).

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_COLS) for b in _CORR_COLS[i + 1 :]
]


def _sql_corr_cte() -> str:
    cents = ", ".join(
        f"CAST(round({c} * 100) AS BIGINT) AS {c}" for c in _CORR_COLS
    )
    moments = ["COUNT(*) AS n"]
    for c in _CORR_COLS:
        moments.append(f"CAST(SUM({c}) AS DOUBLE) AS s_{c}")
        moments.append(f"CAST(SUM({c} * {c}) AS DOUBLE) AS ss_{c}")
    for a, b in _CORR_PAIRS:
        moments.append(f"CAST(SUM({a} * {b}) AS DOUBLE) AS sp_{a}_{b}")
    rows = "\nUNION ALL\n".join(
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
       (n * sp_{a}_{b} - s_{a} * s_{b})
         / (sqrt(n * ss_{a} - s_{a} * s_{a})
            * sqrt(n * ss_{b} - s_{b} * s_{b})) AS corr
FROM m"""
        for a, b in _CORR_PAIRS
    )
    return f"""
WITH c AS (SELECT {cents} FROM lineitem),
m AS (SELECT {moments[0]},
             {', '.join(moments[1:])} FROM c)
SELECT col_a, col_b, corr FROM (
{rows}
)
ORDER BY col_a, col_b
"""


_CORR_ORACLE = _sql_corr_cte()


@register("corr_matrix", oracle=_CORR_ORACLE)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation for every measure pair in ONE scan: the
    aggregate computes all K first moments, K second moments, and
    K(K-1)/2 cross moments map-side-partial in a single pass (K
    columns → K(K+3)/2 sums, one job — the naive df.stat.corr per pair
    is K(K-1)/2 separate jobs re-scanning the table). corr =
    (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy − Sy²)), evaluated on
    doubles derived from exact integer moments — scale factors from the
    cents encoding cancel in exact arithmetic and both engines run the
    identical float expression, so the hash matches bitwise."""
    cents = [
        F.round(col(c) * 100).cast("long").alias(c) for c in _CORR_COLS
    ]
    c_df = table(spark, sf_dir, "lineitem").select(*cents)
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(col(c).cast(dec)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((col(c) * col(c)).cast(dec)).cast("double").alias(f"ss_{c}")
        )
    for a, b in _CORR_PAIRS:
        aggs.append(
            F.sum((col(a) * col(b)).cast(dec)).cast("double").alias(f"sp_{a}_{b}")
        )
    m = c_df.agg(*aggs)
    parts = []
    for a, b in _CORR_PAIRS:
        n = col("n").cast("double")
        corr = (n * col(f"sp_{a}_{b}") - col(f"s_{a}") * col(f"s_{b}")) / (
            F.sqrt(n * col(f"ss_{a}") - col(f"s_{a}") * col(f"s_{a}"))
            * F.sqrt(n * col(f"ss_{b}") - col(f"s_{b}") * col(f"s_{b}"))
        )
        parts.append(
            m.select(
                F.lit(a).alias("col_a"), F.lit(b).alias("col_b"), corr.alias("corr")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_a", "col_b")


# ---------------------------------------------------------------------------
# k_anonymity — quasi-identifier re-identification audit
# ---------------------------------------------------------------------------

# The privacy companion to pii_redact: before a table ships into a
# training corpus, group it by its QUASI-IDENTIFIERS (attributes that
# are individually harmless but jointly identifying) and measure each
# equivalence class — a class smaller than k means its members are
# re-identifiable within the release. Output is per-class so downstream
# suppression/generalization can act on exactly the failing classes.

_KANON_K = 5

_KANON_ORACLE = f"""
SELECT c_nationkey,
       c_mktsegment,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       COUNT(*) < {_KANON_K} AS violates_k
FROM customer
GROUP BY 1, 2, 3
ORDER BY c_nationkey, c_mktsegment, bal_band
"""


@register("k_anonymity", oracle=_KANON_ORACLE)
def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over (nation, market segment, account-balance
    band): every equivalence class with its size and a violates_k flag
    (class_size < {k}). The balance band is a deliberate
    generalization step — floor(bal/1000) — showing the
    coarsen-until-anonymous loop this audit drives; nation × segment
    alone passes at any realistic k, the banded triple mostly fails,
    which is exactly the re-identification surface the auditor needs
    to see.

    Scale: one hash aggregate on the quasi-identifier tuple (map-side
    partial — class counts crush to |classes| rows regardless of table
    size). All-integer arithmetic; floor (not trunc) on the band so
    negative balances agree across engines."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "class_size",
            (col("class_size") < _KANON_K).alias("violates_k"),
        )
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    )


# ---------------------------------------------------------------------------
# dataset_datasheet — per-source "datasheet for datasets" report
# ---------------------------------------------------------------------------

# The one-page per-source summary a dataset release ships (Gebru et al.
# 2021's datasheet, reduced to the corpus-statistics section): volume,
# token mass, length envelope, language mix, exact-duplicate rate, and
# the share passing the gopher rule gate. Every signal reuses the exact
# expression of its standalone op (gopher gate via text._gopher_pass_col
# / _SQL_GOPHER_PASS; ws tokenization = the gopher n_words) so the
# datasheet can never disagree with the gates it summarizes.

def _datasheet_oracle() -> str:
    from cqlcopy_spark.operators.text import _SQL_GOPHER_FEATS, _SQL_GOPHER_PASS

    return f"""
WITH feats AS (
  SELECT source, lang, text,
         {_SQL_GOPHER_FEATS}
  FROM documents
),
base AS (
  SELECT source, lang, n_chars,
         CAST(n_words AS BIGINT) AS n_toks,
         md5(text) AS th,
         CASE WHEN {_SQL_GOPHER_PASS} THEN 1 ELSE 0 END AS gpass
  FROM feats
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         CAST(MIN(n_chars) AS BIGINT) AS n_chars_min,
         CAST(MAX(n_chars) AS BIGINT) AS n_chars_max,
         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(COUNT(DISTINCT th) AS BIGINT) AS n_uniq,
         CAST(SUM(gpass) AS BIGINT) AS n_gpass
  FROM base GROUP BY source
),
lc AS (SELECT source, lang, COUNT(*) AS cnt FROM base GROUP BY 1, 2),
top AS (
  SELECT source, lang AS top_lang, CAST(cnt AS BIGINT) AS top_cnt,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY cnt DESC, lang DESC) AS rn
  FROM lc
)
SELECT agg.source, n_docs, n_tokens, n_chars_min, n_chars_max, n_langs,
       top.top_lang,
       CAST(top.top_cnt AS DOUBLE) / n_docs AS top_lang_share,
       CAST(n_docs - n_uniq AS DOUBLE) / n_docs AS dup_text_rate,
       CAST(n_gpass AS DOUBLE) / n_docs AS gopher_pass_rate
FROM agg JOIN top ON agg.source = top.source AND top.rn = 1
ORDER BY agg.source
"""


@register("dataset_datasheet", oracle=_datasheet_oracle())
def dataset_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source datasheet: volume, token mass, char-length envelope,
    language count + dominant language share, exact-duplicate-text rate
    (md5 identity), and gopher-gate pass rate — the corpus-statistics
    page of a dataset release, derived in two aggregates over one scan.

    Scale shape: the doc-level stage is the map-only gopher/token fold;
    then ONE partial-combining groupBy(source) (a single DISTINCT column
    — Spark's two-phase distinct, no Expand) plus a (source, lang)
    micro-aggregate for the argmax language, joined back on the already-
    aggregated source key. Duplicate detection shuffles a 16-byte md5,
    never text. All ratios are single IEEE divisions of exact int64s.
    The dominant-language tiebreak (max count, then max lang string) is
    the deterministic max(struct) — binary collation in both engines."""
    return _datasheet_kernel(table(spark, sf_dir, "documents"))


def _datasheet_kernel(d: DataFrame) -> DataFrame:
    """Datasheet over any (source, lang, n_chars, text) frame — factored
    so the duplicate-rate and top-language tiebreak paths are testable
    on planted synthetic corpora (the fixture has no duplicate texts at
    driver SF, so the md5 path would otherwise never fire in a test)."""
    from cqlcopy_spark.operators.text import _gopher_pass_col, _tokens

    staged = d.select("source", "lang", "n_chars", "text", _tokens().alias("toks"))
    base = staged.select(
        "source",
        "lang",
        "n_chars",
        F.size("toks").cast("long").alias("n_toks"),
        F.md5("text").alias("th"),
        F.when(_gopher_pass_col(col("toks")), 1).otherwise(0).alias("gpass"),
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.min("n_chars").alias("n_chars_min"),
        F.max("n_chars").alias("n_chars_max"),
        F.size(F.collect_set("lang")).cast("long").alias("n_langs"),
        F.countDistinct("th").alias("n_uniq"),
        F.sum("gpass").alias("n_gpass"),
    )
    lc = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    top = lc.groupBy("source").agg(
        F.max(F.struct(col("cnt"), col("lang"))).alias("m")
    ).select(
        "source",
        col("m.lang").alias("top_lang"),
        col("m.cnt").alias("top_cnt"),
    )
    return (
        agg.join(top, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars_min",
            "n_chars_max",
            "n_langs",
            "top_lang",
            (col("top_cnt").cast("double") / col("n_docs")).alias("top_lang_share"),
            ((col("n_docs") - col("n_uniq")).cast("double") / col("n_docs")).alias(
                "dup_text_rate"
            ),
            (col("n_gpass").cast("double") / col("n_docs")).alias(
                "gopher_pass_rate"
            ),
        )
        .orderBy("source")
    )
