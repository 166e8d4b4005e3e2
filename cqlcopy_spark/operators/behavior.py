"""User-behavior analytics over the events stream: funnel progression
and cohort retention — the product-analytics shapes (Amplitude/Mixpanel
class) a training-data pipeline also reuses for curriculum scheduling
(what fraction of users/sources progress through quality gates, how a
cohort's activity decays).

The reference has no event analytics at all (it is a CSV↔Cassandra
loader, SURVEY.md §0); this extends §2C's event ops alongside
timeseries.py. Everything here is plain conditional aggregation + joins
on user_id — one partitioning reused across stages, no Python, no
iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import register

# ---------------------------------------------------------------------------
# events_funnel — strictly-ordered stage progression per user
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
),
v AS (
  SELECT user_id, MIN(us) AS v_us FROM e WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.us) AS c_us
  FROM e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.us > v.v_us
  GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.us) AS p_us
  FROM e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.us > c.c_us
  GROUP BY 1
),
u AS (SELECT DISTINCT user_id FROM e)
SELECT u.user_id, v.v_us, c.c_us, p.p_us,
       CAST(CASE WHEN p.p_us IS NOT NULL THEN 3
                 WHEN c.c_us IS NOT NULL THEN 2
                 WHEN v.v_us IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage
FROM u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
ORDER BY u.user_id
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel view → click → purchase: each stage's
    timestamp is the FIRST qualifying event AFTER the previous stage
    completed (a later-stage event before the earlier stage doesn't
    count — the correctness subtlety naive per-type MIN misses).

    Shape: one base scan persisted, then three conditional-MIN
    aggregations chained by user_id joins — every shuffle is on the
    same user_id key, so the exchanges stack instead of multiplying,
    and each stage's input is pre-filtered to one event type. All
    values are integer micros: no float parity concerns anywhere."""
    e = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_type",
            F.unix_micros(col("ts").cast("timestamp")).alias("us"),
        )
        .persist()  # four consumers: base users + three stage scans
    )
    v = (
        e.filter(col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        e.filter(col("event_type") == "click")
        .join(v, "user_id")
        .filter(col("us") > col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        e.filter(col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(col("us") > col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    u = e.select("user_id").distinct()
    stage = (
        F.when(col("p_us").isNotNull(), 3)
        .when(col("c_us").isNotNull(), 2)
        .when(col("v_us").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "v_us", "c_us", "p_us", stage.alias("stage"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# retention_cohorts — weekly cohort retention triangle
# ---------------------------------------------------------------------------

_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY 1
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
joined AS (
  SELECT f.cohort_week,
         CAST(date_diff('day', f.cohort_week, a.week) // 7 AS BIGINT) AS week_k,
         a.user_id
  FROM activity a JOIN firsts f ON a.user_id = f.user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM firsts GROUP BY 1
)
SELECT j.cohort_week, j.week_k,
       COUNT(DISTINCT j.user_id) AS n_active,
       s.cohort_size,
       CAST(COUNT(DISTINCT j.user_id) AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
         AS retention
FROM joined j JOIN sizes s ON j.cohort_week = s.cohort_week
GROUP BY j.cohort_week, j.week_k, s.cohort_size
ORDER BY j.cohort_week, j.week_k
"""


@register("retention_cohorts", oracle=_RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by the week of their
    first event; week_k counts a cohort's users still active k weeks
    later. Both date_trunc('week') anchors are Monday in both engines,
    so week_k = day-difference // 7 is an exact small integer; the
    retention ratio is ONE int→double division — deterministic, no
    float folds.

    Shape: firsts is a per-user MIN (map-side partial on user_id);
    activity is a distinct on (user, week) sharing the user_id shuffle;
    the cohort-size relation is cohort-count-sized and BROADCASTS onto
    the triangle aggregate. At 100 TB nothing here exceeds
    users × active-weeks rows in any shuffle."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "ts"
    ).persist()  # firsts + activity both scan it
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", col("ts")).alias("week")
    ).distinct()
    joined = activity.join(firsts, "user_id").select(
        "cohort_week",
        (F.datediff(col("week"), col("cohort_week")) / 7)
        .cast("long")
        .alias("week_k"),
        "user_id",
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    return (
        joined.groupBy("cohort_week", "week_k")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_k",
            "n_active",
            "cohort_size",
            (col("n_active").cast("double") / col("cohort_size").cast("double")).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_k")
    )


# ---------------------------------------------------------------------------
# scd2_user_state — event log → slowly-changing-dimension intervals
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(props->>'k' AS BIGINT) AS k
  FROM events
)
SELECT user_id, k,
       us AS valid_from_us,
       LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
         AS valid_to_us
FROM e
ORDER BY user_id, valid_from_us, k
"""


@register("scd2_user_state", oracle=_SCD2_ORACLE)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event log → SCD-type-2 state table: each (user, k) observation
    becomes a validity interval [valid_from, valid_to) closed by the
    user's NEXT event; the current state keeps valid_to NULL. This is
    the standard dimension-build a warehouse runs over change events —
    one window (lead) over one user_id shuffle, all integer micros.
    Ties on ts are ordered by event_id so interval chaining is
    engine-deterministic; the output ordering adds k as a final
    tiebreak for same-microsecond observations."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(col("ts").cast("timestamp")).alias("us"),
        F.get_json_object(col("props"), "$.k").cast("long").alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return e.select(
        "user_id",
        "k",
        col("us").alias("valid_from_us"),
        F.lead("us").over(w).alias("valid_to_us"),
    ).orderBy("user_id", "valid_from_us", "k")


# ---------------------------------------------------------------------------
# events_anomaly_zscore — per-type outlier flags from portable moments
# ---------------------------------------------------------------------------

_Z_CUT = 3.0


def _anomaly_oracle() -> str:
    from cqlcopy_spark.functions.portable import sql_dsum

    return f"""
WITH s AS (
  SELECT event_type, COUNT(*) AS n,
         {sql_dsum('value')} AS sx,
         {sql_dsum('value * value')} AS sxx
  FROM events
  GROUP BY event_type
),
m AS (
  SELECT event_type, sx / n AS mean_v,
         sqrt(greatest((sxx - sx * sx / n) / (n - 1), 0.0)) AS std_v
  FROM s
  WHERE n > 1
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - m.mean_v) / m.std_v AS z
FROM events e JOIN m ON e.event_type = m.event_type
WHERE m.std_v > 0 AND abs((e.value - m.mean_v) / m.std_v) > {_Z_CUT}
ORDER BY e.event_id
"""


@register("events_anomaly_zscore", oracle=_anomaly_oracle())
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 3) — the monitoring pass a
    pipeline runs over metric streams before training on them. Moments
    use the portable decimal-sum recipe (agg_stats): mean/std are
    bit-identical across engines, so the per-row z — one subtract and
    one divide on identical doubles — and the |z| cut are too. Shape:
    one moment aggregation (map-side partial, #types rows), the tiny
    stats relation broadcasts back onto the scan; no second shuffle of
    events. At 100 TB this is scan-bound twice (agg pass + score pass)
    or once if the stats are precomputed per window."""
    from cqlcopy_spark.functions.portable import dsum

    e = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        dsum(col("value")).alias("sx"),
        dsum(col("value") * col("value")).alias("sxx"),
    )
    # decimal quantization can push the radicand a hair NEGATIVE for a
    # (near-)constant group: DuckDB sqrt then hard-errors and Spark's
    # sqrt→NaN compares LARGEST, emitting the whole group — clamp at 0
    # on both sides and drop zero-variance/singleton groups (no z is
    # defined there)
    m = s.filter(col("n") > 1).select(
        "event_type",
        (col("sx") / col("n")).alias("mean_v"),
        F.sqrt(
            F.greatest(
                (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1),
                F.lit(0.0),
            )
        ).alias("std_v"),
    )
    z = (col("value") - col("mean_v")) / col("std_v")
    return (
        e.join(F.broadcast(m.filter(col("std_v") > 0)), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(col("z")) > _Z_CUT)
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# events_attribution — first-/last-touch conversion attribution
# ---------------------------------------------------------------------------

# Marketing-attribution shape reused by data pipelines as provenance
# assignment (which upstream source "caused" a kept document). Each
# purchase is attributed to the first and the last touch (view/click)
# preceding it in the user's (ts, event_id) order; purchases with no
# prior touch attribute to 'direct'. Revenue is exact integer cents.

_ATTR_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_type IN ('view', 'click') THEN event_type END
           AS touch
  FROM events
),
marked AS (
  SELECT event_type, cents,
         FIRST_VALUE(touch IGNORE NULLS) OVER w AS first_touch,
         LAST_VALUE(touch IGNORE NULLS) OVER w AS last_touch
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
conv AS (
  SELECT COALESCE(first_touch, 'direct') AS first_touch,
         COALESCE(last_touch, 'direct') AS last_touch, cents
  FROM marked WHERE event_type = 'purchase'
)
SELECT model, channel,
       COUNT(*) AS n_conversions,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM (
  SELECT 'first' AS model, first_touch AS channel, cents FROM conv
  UNION ALL
  SELECT 'last' AS model, last_touch AS channel, cents FROM conv
)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("events_attribution", oracle=_ATTR_ORACLE)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch and last-touch attribution in ONE pass: a single
    (user_id)-partitioned window carries both the earliest and latest
    preceding touch to every event (ignore-nulls first/last over the
    strictly-preceding frame), purchases read them off, and a tall
    union-free stack() unpivots the two models before one aggregate.

    Plan: one shuffle on user_id for the window, one on (model,
    channel) for the tiny report aggregate — the events table is
    scanned ONCE for both attribution models (the naive per-model
    self-join would scan and shuffle it twice and is quadratic under
    skewed users). Revenue stays in integer cents end to end; the
    preceding frame (not current row) keeps a purchase from attributing
    to itself; ties in ts are broken by event_id, making first/last
    picks deterministic in both engines."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(col("ts").cast("timestamp")).alias("us"),
        F.round(col("value") * 100).cast("long").alias("cents"),
        F.when(
            col("event_type").isin("view", "click"), col("event_type")
        ).alias("touch"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    conv = (
        e.select(
            "event_type",
            "cents",
            F.coalesce(
                F.first("touch", ignorenulls=True).over(w), F.lit("direct")
            ).alias("first_touch"),
            F.coalesce(
                F.last("touch", ignorenulls=True).over(w), F.lit("direct")
            ).alias("last_touch"),
        )
        .filter(col("event_type") == "purchase")
    )
    tall = conv.selectExpr(
        "stack(2, 'first', first_touch, 'last', last_touch) AS (model, channel)",
        "cents",
    )
    return (
        tall.groupBy("model", "channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum("cents").alias("revenue_cents"),
        )
        .orderBy("model", "channel")
    )


# ---------------------------------------------------------------------------
# winsorize_stats — outlier-robust per-group statistics (rank cutoffs)
# ---------------------------------------------------------------------------

_WINS_P = 0.05  # two-sided trim fraction


def _wins_oracle() -> str:
    from cqlcopy_spark.functions.portable import sql_block_fold_agg

    inner = sql_block_fold_agg(
        f"""WITH r AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
),
cut AS (
  SELECT event_type, event_id, value,
         -- CAST({_WINS_P} AS DOUBLE): bare decimal literals are DECIMAL
         -- in DuckDB; the double product must match Spark's IEEE ceil
         MAX(CASE WHEN rn = CAST(ceil(CAST({_WINS_P} AS DOUBLE) * cnt) AS BIGINT)
             THEN value END) OVER (PARTITION BY event_type) AS lo,
         MAX(CASE WHEN rn = cnt + 1 - CAST(ceil(CAST({_WINS_P} AS DOUBLE) * cnt) AS BIGINT)
             THEN value END) OVER (PARTITION BY event_type) AS hi
  FROM r
)
SELECT event_type, event_id, value, lo, hi,
       least(greatest(value, lo), hi) AS v
FROM cut""",
        ["event_type"],
        "value, event_id",
        sums={"_s": "v"},
        mins={"p05": "lo", "p95": "hi"},
    )
    return f"""
WITH s AS ({inner})
SELECT event_type, n, p05, p95, _s / n AS wins_mean
FROM s
ORDER BY event_type
"""


@register("winsorize_stats", oracle=_wins_oracle())
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clamped) per-group mean — the robust-stats
    step a feature pipeline runs before normalization so a handful of
    corrupt readings can't drag the scale. Cutoffs are exact RANK
    statistics (the ceil(p·n)-th smallest / largest value, ordered with
    an event_id tiebreak), not interpolated quantiles: interpolation
    formulas differ subtly across engines while "the k-th value" is one
    comparison — every byte here is value-hash portable. Values are
    clamped to [p05, p95] and averaged with the deterministic-order
    fixed-block fold tree (portable.block_fold_agg): clamped values are
    raw full-precision doubles, for which the decimal davg route can
    diverge by a digit-string ulp — the same reasoning as decile_bands
    and timeseries_trend (this fixture's 2-decimal values happened to
    make davg safe, but the fold makes it safe by construction).

    Scale: ONE shuffle on event_type serves the rank window, the
    cutoff window aggregates, the fold's rank window, and all three
    fold levels (same key throughout). For a group too large to sort
    in one task the exact rank is replaced by approx_percentile's
    t-digest — same plan shape, error-bounded cutoffs (the trade
    agg_approx already documents)."""
    from cqlcopy_spark.functions.portable import block_fold_agg

    e = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    wr = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = e.withColumn("rn", F.row_number().over(wr)).withColumn(
        "cnt", F.count(F.lit(1)).over(wn)
    )
    k = F.ceil(F.lit(_WINS_P) * col("cnt"))
    # cutoffs as WINDOW aggregates over the same partition — a
    # groupBy+join-back would re-execute the rank window's lineage per
    # side (CLAUDE.md self-join rule); this stays one linear lineage
    # sharing one event_type exchange
    cut = r.select(
        "event_type",
        "event_id",
        "value",
        F.max(F.when(col("rn") == k, col("value"))).over(wn).alias("lo"),
        F.max(F.when(col("rn") == col("cnt") + 1 - k, col("value")))
        .over(wn)
        .alias("hi"),
    )
    clamped = cut.select(
        "event_type",
        "event_id",
        "value",
        "lo",
        "hi",
        F.least(F.greatest(col("value"), col("lo")), col("hi")).alias("v"),
    )
    # fold order (value, event_id) — the rank order the plan is ALREADY
    # sorted by from the cutoff windows, so the fold's rank window
    # reuses that sort instead of re-sorting by event_id
    s = block_fold_agg(
        clamped,
        ["event_type"],
        ["value", "event_id"],
        sums={"_s": col("v")},
        mins={"p05": col("lo"), "p95": col("hi")},
    )
    return s.select(
        "event_type",
        "n",
        "p05",
        "p95",
        (col("_s") / col("n")).alias("wins_mean"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# event_transitions — first-order Markov transition counts
# ---------------------------------------------------------------------------

_TRANS_TOP = 3  # top transitions kept per source state

_TRANS_ORACLE = f"""
WITH seq AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
c AS (
  SELECT src, dst, COUNT(*) AS n
  FROM seq WHERE dst IS NOT NULL
  GROUP BY src, dst
),
t AS (
  SELECT src, CAST(SUM(n) AS BIGINT) AS out_total FROM c GROUP BY src
),
r AS (
  SELECT c.src, c.dst, c.n, t.out_total,
         ROW_NUMBER() OVER (PARTITION BY c.src
                            ORDER BY c.n DESC, c.dst) AS rank
  FROM c JOIN t ON c.src = t.src
)
SELECT src, dst, n, rank,
       CAST(n AS DOUBLE) / out_total AS p
FROM r WHERE rank <= {_TRANS_TOP}
ORDER BY src, rank
"""


@register("event_transitions", oracle=_TRANS_ORACLE)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over each user's event sequence: count
    (state → next-state) transitions and keep each source state's top
    transitions with their empirical probability — the behavioral
    fingerprint behind next-action prediction and bot detection.

    Plan: ONE lead() window per user timeline (shuffle on user_id,
    (ts, event_id) tiebreak makes successor choice deterministic), a
    (src, dst) hash aggregate, and a per-src window over the tiny
    transition matrix (|types|² rows) for totals and ranking. The raw
    event volume passes exactly one exchange; everything after is
    matrix-sized. p = n/out_total is one exact-integer IEEE division —
    bitwise portable."""
    from pyspark.sql.window import Window

    e = table(spark, sf_dir, "events")
    seq = e.select(
        col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    )
    c = (
        seq.filter(col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("src")
    wr = Window.partitionBy("src").orderBy(col("n").desc(), col("dst"))
    return (
        c.withColumn("out_total", F.sum("n").over(wt))
        .withColumn("rank", F.row_number().over(wr))
        .filter(col("rank") <= _TRANS_TOP)
        .select(
            "src",
            "dst",
            "n",
            "rank",
            (col("n").cast("double") / col("out_total")).alias("p"),
        )
        .orderBy("src", "rank")
    )


# ---------------------------------------------------------------------------
# ab_experiment_lift — deterministic A/B readout (hash variants, exact lift)
# ---------------------------------------------------------------------------

def _ab_oracle() -> str:
    from cqlcopy_spark.functions.portable import (sql_cents, sql_exact_sum,
                                                  sql_portable_token)

    v = f"({sql_portable_token('user_id')} % 2)"
    c = sql_cents("value")
    return f"""
WITH sums AS (
  SELECT event_type,
         CAST(COUNT(CASE WHEN {v} = 0 THEN 1 END) AS BIGINT) AS n_control,
         CAST(COUNT(CASE WHEN {v} = 1 THEN 1 END) AS BIGINT) AS n_treatment,
         {sql_exact_sum(f"CASE WHEN {v} = 0 THEN {c} END")} AS sc,
         {sql_exact_sum(f"CASE WHEN {v} = 1 THEN {c} END")} AS st,
         {sql_exact_sum(f"CASE WHEN {v} = 0 THEN {c} * {c} END")} AS qc,
         {sql_exact_sum(f"CASE WHEN {v} = 1 THEN {c} * {c} END")} AS qt
  FROM events
  GROUP BY event_type
),
means AS (
  SELECT *,
         (sc / CAST(100.0 AS DOUBLE)) / n_control   AS mean_control,
         (st / CAST(100.0 AS DOUBLE)) / n_treatment AS mean_treatment
  FROM sums WHERE n_control > 1 AND n_treatment > 1
),
vars AS (
  SELECT *,
         greatest(((qc / CAST(10000.0 AS DOUBLE))
            - ((n_control * mean_control) * mean_control))
           / (n_control - 1), CAST(0.0 AS DOUBLE)) AS var_control,
         greatest(((qt / CAST(10000.0 AS DOUBLE))
            - ((n_treatment * mean_treatment) * mean_treatment))
           / (n_treatment - 1), CAST(0.0 AS DOUBLE)) AS var_treatment
  FROM means
),
scored AS (
  SELECT *,
         mean_treatment - mean_control AS lift,
         sqrt(var_control / n_control + var_treatment / n_treatment) AS se
  FROM vars
)
SELECT event_type, n_control, n_treatment, mean_control, mean_treatment,
       lift, se,
       CASE WHEN se > 0 THEN lift / se END AS z_score
FROM scored
ORDER BY event_type
"""


@register("ab_experiment_lift", oracle=_ab_oracle())
def ab_experiment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B experiment readout over the events stream:
    users are hash-assigned to control/treatment (portable token mod 2 —
    assignment is a pure function of user_id, reproducible across
    engines/runs/layouts, the property a real experiment bucketing
    service guarantees), and each event_type gets the two-sample
    readout: per-variant n / mean value, lift, its standard error, and
    the z-score.

    Float portability: event values are exact 2-decimal money, so all
    sums run in INTEGER cents (value ≤ ~561 ⇒ cents ≤ 56.1k, cents² ≤
    3.2e9 per row — int64-safe at any corpus size via the decimal(38,0)
    accumulator; portable.py exact-sum route). Means/variances/z are
    then a FIXED tree of IEEE ops on exact ints — bit-identical in both
    engines, sqrt included (the one portable transcendental). Sample
    variance uses the (ssq − n·mean²)/(n−1) form with explicit
    association mirrored in the oracle. Variants with fewer than 2
    events are filtered (variance undefined), and z is NULL when se = 0
    rather than an engine-dependent infinity.

    Scale shape: ONE conditional aggregate over (event_type) — map-side
    partial, shuffle ∝ event types × 7 numbers; no join, no window, no
    second pass. At 100 TB this is the cheapest query in the repo after
    the pure scans."""
    return _ab_lift_kernel(table(spark, sf_dir, "events"))


def _ab_lift_kernel(e: DataFrame) -> DataFrame:
    """Two-sample readout kernel over any (user_id, event_type, value)
    frame — factored so the exact-int sums and the fixed IEEE
    mean/variance/z tree are property-fuzzable against a pure-Python
    replay on arbitrary event sets (tests/test_ab_lift_property.py)."""
    from cqlcopy_spark.functions.portable import (cents, exact_sum,
                                                   portable_token)

    variant = F.pmod(portable_token(col("user_id")), F.lit(2))
    cents_v = cents(col("value"))
    is_c, is_t = variant == 0, variant == 1
    sums = (
        e.select("event_type", is_c.alias("c"), is_t.alias("t"), cents_v.alias("cv"))
        .groupBy("event_type")
        .agg(
            F.count(F.when(col("c"), 1)).alias("n_control"),
            F.count(F.when(col("t"), 1)).alias("n_treatment"),
            exact_sum(F.when(col("c"), col("cv"))).alias("sc"),
            exact_sum(F.when(col("t"), col("cv"))).alias("st"),
            exact_sum(F.when(col("c"), col("cv") * col("cv"))).alias("qc"),
            exact_sum(F.when(col("t"), col("cv") * col("cv"))).alias("qt"),
        )
        .filter((col("n_control") > 1) & (col("n_treatment") > 1))
    )
    means = sums.withColumns(
        {
            "mean_control": (col("sc") / F.lit(100.0)) / col("n_control"),
            "mean_treatment": (col("st") / F.lit(100.0)) / col("n_treatment"),
        }
    )
    vars_ = means.withColumns(
        {
            # greatest(_, 0.0): the (ssq − n·mean²) cancellation can land
            # a hair NEGATIVE for constant-valued variants — Spark's sqrt
            # would yield NaN and DuckDB's ERRORS the whole oracle query
            # (same clamp as events_anomaly_zscore above)
            "var_control": F.greatest(
                (
                    (col("qc") / F.lit(10000.0))
                    - ((col("n_control") * col("mean_control")) * col("mean_control"))
                ) / (col("n_control") - 1),
                F.lit(0.0),
            ),
            "var_treatment": F.greatest(
                (
                    (col("qt") / F.lit(10000.0))
                    - ((col("n_treatment") * col("mean_treatment")) * col("mean_treatment"))
                ) / (col("n_treatment") - 1),
                F.lit(0.0),
            ),
        }
    )
    scored = vars_.withColumns(
        {
            "lift": col("mean_treatment") - col("mean_control"),
            "se": F.sqrt(
                col("var_control") / col("n_control")
                + col("var_treatment") / col("n_treatment")
            ),
        }
    )
    return scored.select(
        "event_type",
        "n_control",
        "n_treatment",
        "mean_control",
        "mean_treatment",
        "lift",
        "se",
        F.when(col("se") > 0, col("lift") / col("se")).alias("z_score"),
    ).orderBy("event_type")
