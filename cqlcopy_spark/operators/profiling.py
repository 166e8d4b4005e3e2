"""Dataset profiling and data-quality enforcement — the pre-flight
surface a 100 TB ingest runs before any training job touches the data:
per-column statistical profiles, declarative expectation suites
(Great-Expectations / dbt-test class), and key-skew diagnosis for the
partitioning decisions everything downstream depends on.

The reference has no profiling surface at all (SURVEY.md §0 — it is a
CSV↔Cassandra loader whose only "quality" signal is the parse/insert
error budget, write.go:140-147); this extends §2C's curation ops. All
three operators are single-pass conditional aggregation — no Python, no
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
    of lineitem in ONE scan. The oracle is the naive form — K scans,
    one per column; the Spark plan computes every column's metrics in
    a single pass: K count-distincts in one agg become ONE
    Expand-based aggregate (each input row fans out to K tagged rows,
    then two hash aggregates), so the parquet is read once no matter
    how many columns are profiled — at 100 TB the scan IS the cost
    and K× rescanning is the difference between one job and a week.
    Distinct counts are EXACT (the expectation-suite contract);
    approx_count_distinct is the cheaper knob when ±2% is fine
    (agg_approx covers that surface).
    """
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_null, n_distinct, min_s, max_s)"
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
