"""Temporal joins (SURVEY.md §2B joins row: as-of and range/band joins).

Spark has no native ASOF JOIN operator; the idiomatic distributed
formulations are:

- as-of:  UNION both sides with a tag → ONE shuffle on the entity key →
  per-key sort → last_value(ignorenulls) carries the most recent build-
  side attributes forward onto each probe row. Cost = sort-merge of
  |A|+|B| rows; never a per-row subquery, never a cross join. (The
  pandas `merge_asof`-in-applyInPandas alternative costs the same
  shuffle but leaves the JVM — only worth it for many as-of columns.)

- range/band: equi-join on (entity, coarse time bucket) with the probe
  side exploded to the two buckets its window can touch, then the exact
  band predicate refines. The bucket key bounds candidate volume per
  join task even for a hot entity (a pure entity-key join would put one
  user's whole history in one task; bucketing splits it by time).

Both are exactly oracle-checkable: DuckDB has native ASOF JOIN, and the
band join is plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import register

# ---------------------------------------------------------------------------
# join_asof — each purchase matched to the user's most recent prior view
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """
WITH v0 AS (
  SELECT user_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view'
),
v AS (SELECT user_id, ts, value FROM v0 WHERE rn = 1),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts, v.ts AS view_ts, v.value AS view_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@register("join_asof", oracle=_ASOF_ORACLE)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase gets the same user's latest view at or
    before the purchase time (ties count: >= semantics, like DuckDB
    ASOF). Build side is deduped to one row per (user, ts) — max
    event_id wins — so tie resolution is deterministic in both engines.

    Plan shape: union → one shuffle+sort on (user_id; ts, tag) →
    last_value(ignorenulls) → filter probe rows. Purchases with no prior
    view keep NULLs (left join)."""
    e = table(spark, sf_dir, "events")

    dedup_w = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc())
    views = (
        e.filter(col("event_type") == "view")
        .withColumn("rn", F.row_number().over(dedup_w))
        .filter(col("rn") == 1)
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("is_probe"),
            F.lit(None).cast("long").alias("event_id"),
            col("ts").alias("v_ts"),
            col("value").alias("v_value"),
        )
    )
    purchases = e.filter(col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("v_ts"),
        F.lit(None).cast("double").alias("v_value"),
    )
    # Sort views BEFORE purchases at an equal timestamp so ts-ties match
    # the oracle's >= semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        views.unionByName(purchases)
        .withColumn("view_ts", F.last("v_ts", ignorenulls=True).over(w))
        .withColumn("view_value", F.last("v_value", ignorenulls=True).over(w))
        .filter(col("is_probe") == 1)
        .select("event_id", "user_id", "ts", "view_ts", "view_value")
    )


# ---------------------------------------------------------------------------
# join_range — ordered event pairs within a 30-minute band per user
# ---------------------------------------------------------------------------

_BAND_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

_RANGE_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
SELECT a.event_id AS e1, b.event_id AS e2, b.us - a.us AS dt_us
FROM e a JOIN e b
  ON a.user_id = b.user_id AND b.us > a.us AND b.us <= a.us + {_BAND_US}
"""


@register("join_range", oracle=_RANGE_ORACLE)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: ordered pairs of same-user events at most 30
    minutes apart. Join key is (user_id, 30-min bucket); the left row
    probes its own bucket and the next one (a (t, t+30m] window spans at
    most two buckets), then the exact inequality refines. Candidate
    volume per task is bounded by events-per-user-per-hour — a hot
    user's history is split across time buckets rather than landing in
    one task, which is what makes this survive 1000× skew."""
    e = (
        table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.unix_micros(col("ts").cast("timestamp")).alias("us"),
        )
        .withColumn("bucket", F.floor(col("us") / _BAND_US))
    )
    probe = e.withColumn("probe_bucket", F.explode(F.array(col("bucket"), col("bucket") + 1)))
    a = probe.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (col("a.user_id") == col("b.user_id"))
            & (col("a.probe_bucket") == col("b.bucket"))
            & (col("b.us") > col("a.us"))
            & (col("b.us") <= col("a.us") + _BAND_US),
        )
        .select(
            col("a.event_id").alias("e1"),
            col("b.event_id").alias("e2"),
            (col("b.us") - col("a.us")).alias("dt_us"),
        )
    )


# ---------------------------------------------------------------------------
# join_asof_nearest — nearest-in-time match (both directions, tie → prior)
# ---------------------------------------------------------------------------

# Backward-only as-of (join_asof) answers "state at event time";
# NEAREST answers sensor/label alignment, where the closest reading on
# either side is the right match (pandas merge_asof direction=
# 'nearest'). DuckDB's ASOF JOIN is backward-only per ordering, so the
# oracle runs a second ASOF on the NEGATED time axis (backward on -t ≡
# forward on t) and picks the closer side; equal distance prefers the
# prior match — the deterministic tie both engines apply identically
# in integer micros.

_ASOF_NEAREST_ORACLE = """
WITH v0 AS (
  SELECT user_id, epoch_us(ts) AS us, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC)
           AS rn
  FROM events WHERE event_type = 'view'
),
v AS (SELECT user_id, us, value FROM v0 WHERE rn = 1),
p AS (
  SELECT event_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT p.event_id, v.us AS b_us, v.value AS b_val
  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.us >= v.us
),
f AS (
  SELECT p.event_id, -v.neg_us AS f_us, v.value AS f_val
  FROM (SELECT event_id, user_id, -us AS neg_us FROM p) p
  ASOF LEFT JOIN (SELECT user_id, -us AS neg_us, value FROM v) v
    ON p.user_id = v.user_id AND p.neg_us >= v.neg_us
)
SELECT p.event_id, p.user_id, p.us,
       CASE WHEN b_us IS NOT NULL
                  AND (f_us IS NULL OR p.us - b_us <= f_us - p.us)
            THEN b_us ELSE f_us END AS near_us,
       CASE WHEN b_us IS NOT NULL
                  AND (f_us IS NULL OR p.us - b_us <= f_us - p.us)
            THEN b_val ELSE f_val END AS near_value,
       CASE WHEN b_us IS NOT NULL
                  AND (f_us IS NULL OR p.us - b_us <= f_us - p.us)
            THEN 'b' WHEN f_us IS NOT NULL THEN 'f' END AS direction
FROM p
LEFT JOIN b ON p.event_id = b.event_id
LEFT JOIN f ON p.event_id = f.event_id
ORDER BY p.event_id
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of: each purchase matches the temporally
    closest view in EITHER direction; equal distance prefers the prior
    view. Same union-tag shape as join_asof — ONE shuffle on user_id,
    then two carries over the SAME per-key sort: last prior view
    (unbounded-preceding frame, views ordered before purchases at equal
    time so a simultaneous view counts as prior) and first later view
    (unbounded-following frame). The distance compare is integer
    micros. A same-instant view appears only in the backward carry, but
    distance 0 wins every tie toward 'b', so both engines pick it —
    the forward frame's exclusion is unobservable.

    Cost: |views|+|purchases| rows through one sort-merge — never a
    per-probe subquery; at 100 TB this is the same plan as join_asof
    with one extra window function over the already-sorted runs."""
    e = table(spark, sf_dir, "events")
    vraw = e.filter(col("event_type") == "view").select(
        "user_id",
        F.unix_micros(col("ts").cast("timestamp")).alias("us"),
        "value",
        "event_id",
    )
    dd = Window.partitionBy("user_id", "us").orderBy(col("event_id").desc())
    v = (
        vraw.withColumn("rn", F.row_number().over(dd))
        .filter(col("rn") == 1)
        .select("user_id", "us", "value", F.lit(0).alias("tag"),
                F.lit(None).cast("long").alias("event_id"))
    )
    p = e.filter(col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros(col("ts").cast("timestamp")).alias("us"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("tag"),
        "event_id",
    )
    u = v.unionByName(p)
    view_at = F.when(col("tag") == 0, F.struct(col("us"), col("value")))
    ordered = Window.partitionBy("user_id").orderBy("us", "tag")
    back = F.last(view_at, ignorenulls=True).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first(view_at, ignorenulls=True).over(
        ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    marked = (
        u.withColumn("b", back)
        .withColumn("f", fwd)
        .filter(col("tag") == 1)
    )
    b_us, f_us = col("b.us"), col("f.us")
    prefer_b = b_us.isNotNull() & (
        f_us.isNull() | ((col("us") - b_us) <= (f_us - col("us")))
    )
    return marked.select(
        "event_id",
        "user_id",
        "us",
        F.when(prefer_b, b_us).otherwise(f_us).alias("near_us"),
        F.when(prefer_b, col("b.value")).otherwise(col("f.value")).alias(
            "near_value"
        ),
        F.when(prefer_b, F.lit("b"))
        .when(f_us.isNotNull(), F.lit("f"))
        .alias("direction"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# join_asof_tolerance — as-of match voided beyond a staleness bound
# ---------------------------------------------------------------------------

# The production as-of variant (pandas merge_asof's `tolerance`, kdb wj
# with a window): a prior view older than the bound is STALE — the
# purchase keeps its row (left semantics) but the match columns go NULL,
# and matched rows carry the gap for staleness analytics. Composes on
# join_asof's registered relation so the base as-of semantics (>= ties,
# deterministic build-side dedup) cannot drift.
_ASOF_TOL_US = 24 * 3600 * 1_000_000  # 24 hours (fixture median gap ~34 h)

_ASOF_TOL_ORACLE = f"""
WITH base AS (
{_ASOF_ORACLE}
)
SELECT event_id, user_id, ts,
       CASE WHEN epoch_us(ts) - epoch_us(view_ts) <= {_ASOF_TOL_US}
            THEN view_ts END AS view_ts,
       CASE WHEN epoch_us(ts) - epoch_us(view_ts) <= {_ASOF_TOL_US}
            THEN view_value END AS view_value,
       CASE WHEN epoch_us(ts) - epoch_us(view_ts) <= {_ASOF_TOL_US}
            THEN CAST(epoch_us(ts) - epoch_us(view_ts) AS BIGINT) END AS gap_us
FROM base
"""


@register("join_asof_tolerance", oracle=_ASOF_TOL_ORACLE)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance: the latest prior view
    matches only if it is at most {tol} old; staler matches are NULLed
    (the probe row survives — left semantics), and live matches carry
    gap_us. An unmatched base row has NULL view_ts, so the gap
    comparison is NULL and the CASE keeps it NULL — no separate branch.

    Scale shape: join_asof's single union-window pass plus one map-only
    projection — the tolerance adds no shuffle, no join, at any SF."""
    base = join_asof(spark, sf_dir)
    gap = F.unix_micros(col("ts").cast("timestamp")) - F.unix_micros(
        col("view_ts").cast("timestamp")
    )
    live = gap <= _ASOF_TOL_US
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(live, col("view_ts")).alias("view_ts"),
        F.when(live, col("view_value")).alias("view_value"),
        F.when(live, gap).alias("gap_us"),
    )
