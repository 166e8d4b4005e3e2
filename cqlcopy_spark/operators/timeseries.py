"""Time-series resampling: hypertable-style rollup to a regular grid with
gap filling (zero-fill for additive measures, forward-fill for carried
state) — the operator a metrics/training-data pipeline runs over event
streams before any model sees them.

The reference has no time-series surface (it is a loader, SURVEY.md §0);
this extends §2C's event ops. Pure DataFrame composition:

  1. rollup:  groupBy(user, date_trunc(hour, ts))       — one shuffle
  2. spine:   per-user [min_hour, max_hour] → sequence() → explode
              (narrow after the tiny span aggregate)
  3. align:   spine LEFT JOIN rollup on (user, hour)    — same key as 1
  4. fill:    coalesce(measure, 0) + last(value, ignorenulls) window

At 100 TB the spine size is users × hours-of-activity — dense but
predictable; the join and window share the (user) hash/ordering, and AQE
coalesces the mostly-empty tail partitions. Nothing here is iterative or
Python-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from cqlcopy_spark.catalog import table
from cqlcopy_spark.functions.portable import dsum, sql_dsum
from cqlcopy_spark.plans.registry import register

_GAPFILL_ORACLE = f"""
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events,
         {sql_dsum('value')} AS hour_value
  FROM events
  GROUP BY 1, 2
),
span AS (
  SELECT user_id,
         date_trunc('hour', MIN(ts)) AS h0,
         date_trunc('hour', MAX(ts)) AS h1
  FROM events
  GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM span
)
SELECT s.user_id, s.hour,
       COALESCE(h.n_events, 0) AS n_events,
       COALESCE(h.hour_value, 0.0) AS hour_value,
       LAST_VALUE(h.hour_value IGNORE NULLS)
         OVER (PARTITION BY s.user_id ORDER BY s.hour
               ROWS UNBOUNDED PRECEDING) AS carry_value
FROM spine s
LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
ORDER BY s.user_id, s.hour
"""


@register("timeseries_gapfill", oracle=_GAPFILL_ORACLE)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user rollup on a GAPLESS grid: every hour between a
    user's first and last event appears exactly once; silent hours get
    n_events=0 / hour_value=0 and carry the last observed hourly value
    forward (LOCF).

    Formulation: each hourly row EXPLODES its own gap range [hour,
    lead(hour) − 1h] — a generated gap row inherits its source row's
    hour_value as the LOCF carry by construction. That replaces the
    older spine-LEFT-JOIN-rollup plan (rollup persisted and read from
    two branches, joined back on (user, hour)) with a single linear
    lineage: scan → hash agg (shuffle 1) → lead window (shuffle 2, the
    only other exchange) → explode (narrow). No join, no persist, no
    second scan — measured 2.9× faster at sf0.1, and at 100 TB it
    removes the join's (user, hour) exchange of the full spine.

    No global ORDER BY on the output: the sort was presentation-only
    (the grid is already clustered by user and hour-ordered within each
    user's window run) and range-shuffling the entire grid is the wrong
    default at scale — callers wanting total order sort the (much
    smaller) slice they read. The last row per user has lead = NULL and
    contributes just itself, so the grid ends exactly at max(hour)."""
    e = table(spark, sf_dir, "events").select("user_id", "ts", "value")
    hour = F.date_trunc("hour", col("ts"))
    hourly = e.groupBy("user_id", hour.alias("hour")).agg(
        F.count("*").alias("n_events"),
        dsum(col("value")).alias("hour_value"),
    )
    nxt = F.lead("hour").over(Window.partitionBy("user_id").orderBy("hour"))
    exploded = hourly.withColumn("next", nxt).select(
        "user_id",
        "n_events",
        "hour_value",
        col("hour").alias("src_hour"),
        F.explode(
            F.sequence(
                col("hour"),
                F.coalesce(col("next") - F.expr("INTERVAL 1 HOUR"), col("hour")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour"),
    )
    at_src = col("hour") == col("src_hour")
    return exploded.select(
        "user_id",
        "hour",
        F.when(at_src, col("n_events")).otherwise(F.lit(0)).alias("n_events"),
        F.when(at_src, col("hour_value")).otherwise(F.lit(0.0)).alias("hour_value"),
        col("hour_value").alias("carry_value"),
    )


# ---------------------------------------------------------------------------
# events_ohlc_rollup — open/high/low/close resampling
# ---------------------------------------------------------------------------

# DuckDB's arg_min/arg_max don't take composite (ts, event_id) keys, so
# the oracle ranks each row from both ends of the tiebroken ordering and
# picks rank 1; Spark expresses the same thing directly as min_by/max_by
# over an ordering struct.
_OHLC_ORACLE = """
WITH r AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, hour,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n
FROM r
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("events_ohlc_rollup", oracle=_OHLC_ORACLE)
def events_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC resampling per event type — the other hypertable
    rollup shape (timeseries_gapfill covers additive+carried measures;
    this covers first/last/extreme picking). One shuffle on the
    (event_type, hour) group key with map-side partial min_by/max_by —
    open/close are PICKED, not computed, so there is no float-fold
    divergence to guard. Ties on ts are broken by event_id via the
    (ts, event_id) ordering struct, lexicographic in both engines,
    making the picked row — and therefore the hash — deterministic."""
    e = table(spark, sf_dir, "events")
    key = F.struct(col("ts"), col("event_id"))
    return (
        e.groupBy("event_type", F.date_trunc("hour", col("ts")).alias("hour"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type", "hour")
    )


# ---------------------------------------------------------------------------
# batch_sessionize — gap-based sessions as a batch window composition
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches streaming/windows.py

_SESSIONIZE_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN LAG(us) OVER w IS NULL
                OR us - LAG(us) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT user_id, us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(us) AS start_us, MAX(us) AS end_us, COUNT(*) AS n_events
FROM sess
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("batch_sessionize", oracle=_SESSIONIZE_ORACLE)
def batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in BATCH form — the lag/cumsum
    composition (flag gap-exceeding deltas, running-sum the flags into
    session ids, aggregate per session). Complements stream_sessionize:
    same 30-minute gap rule, but as a reprocessing-friendly batch job
    over the full history. ONE shuffle on user_id serves the lag window,
    the cumulative sum, and (via partial agg on the same key prefix)
    the session rollup. Ordering ties on ts are broken by event_id, so
    session numbering is engine-deterministic."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_s = F.when(
        F.lag("us").over(w).isNull()
        | ((col("us") - F.lag("us").over(w)) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = e.withColumn("new_s", new_s).withColumn(
        "session_id", F.sum("new_s").over(run)
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# intervals_merge — interval-union islands (overlap merge)
# ---------------------------------------------------------------------------

# batch_sessionize merges POINTS closer than a fixed gap; this merges
# true INTERVALS, which can nest and overlap arbitrarily — the running
# max of interval ENDS (not the previous row's end) is what makes a
# containing interval absorb everything it covers. Each event carries
# an interval [ts, ts + value minutes].

_INTERVALS_ORACLE = """
WITH i AS (
  SELECT user_id, event_id, epoch_us(ts) AS s_us,
         epoch_us(ts) + CAST(round(value * 60000000) AS BIGINT) AS e_us
  FROM events
),
flagged AS (
  SELECT user_id, s_us, e_us, event_id,
         CASE WHEN MAX(e_us) OVER (PARTITION BY user_id
                                   ORDER BY s_us, e_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) >= s_us
              THEN 0 ELSE 1 END AS new_i
  FROM i
),
isl AS (
  SELECT user_id, s_us, e_us,
         SUM(new_i) OVER (PARTITION BY user_id
                          ORDER BY s_us, e_us, event_id
                          ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged
)
SELECT user_id, CAST(island_id AS BIGINT) AS island_id,
       MIN(s_us) AS start_us, MAX(e_us) AS end_us, COUNT(*) AS n_intervals
FROM isl
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register("intervals_merge", oracle=_INTERVALS_ORACLE)
def intervals_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of overlapping intervals per user (gaps-and-islands over
    real intervals): an interval starts a new island iff its start lies
    beyond the MAX end of every earlier-starting interval — the running
    max (not lag(end)) is the classic correctness trap when a long
    interval fully contains later ones. Touching intervals (start ==
    running max end) merge: closed-interval semantics.

    Plan: one shuffle on user_id; both windows and the final aggregate
    reuse that partitioning, so the sort is paid once. All arithmetic
    is integer micros (the minute-duration round happens BEFORE any
    accumulation), so there is no float-fold divergence anywhere.
    Ordering note: BOTH windows share the one total order
    (s_us, e_us, event_id) — a flag window ordered differently from
    the counter window mislabels islands when two intervals tie on
    start (hypothesis-caught in tests/test_island_frontier_props.py:
    the flag lands on one row, the running sum visits the other
    first)."""
    i = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(col("ts").cast("timestamp")).alias("s_us"),
        (
            F.unix_micros(col("ts").cast("timestamp"))
            + F.round(col("value") * 60_000_000).cast("long")
        ).alias("e_us"),
    )
    order = ["s_us", "e_us", "event_id"]
    prev = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    new_i = F.when(F.max("e_us").over(prev) >= col("s_us"), 0).otherwise(1)
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    isl = i.withColumn("new_i", new_i).withColumn(
        "island_id", F.sum("new_i").over(run)
    )
    return (
        isl.groupBy("user_id", "island_id")
        .agg(
            F.min("s_us").alias("start_us"),
            F.max("e_us").alias("end_us"),
            F.count("*").alias("n_intervals"),
        )
        .orderBy("user_id", "island_id")
    )


# ---------------------------------------------------------------------------
# time_weighted_avg — duration-weighted mean of a sampled signal
# ---------------------------------------------------------------------------

# The TimescaleDB `time_weight` shape: each observation holds its value
# until the next one (LOCF), so its weight is the gap to the successor.
# Float portability: values are 2-decimal fixture data → exact integer
# CENTS; every accumulation is integer; the ONLY float ops are the two
# final divisions, identical single IEEE ops in both engines (the
# dsum/binary-fold machinery is unnecessary when the sum itself is
# integer).

_TWA_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
d AS (
  SELECT user_id, cents,
         LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
           AS dur_us
  FROM e
)
SELECT user_id,
       COUNT(dur_us) AS n_spans,
       CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
       CAST(SUM(cents * dur_us) AS DOUBLE)
         / CAST(SUM(dur_us) AS DOUBLE) / 100.0 AS twa
FROM d
WHERE dur_us IS NOT NULL
GROUP BY 1
ORDER BY 1
"""


@register("time_weighted_avg", oracle=_TWA_ORACLE)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward time-weighted average per user:
    weight each value by the micros until the next observation (the
    final observation has no successor and drops out, per LOCF).

    Plan: one shuffle on user_id shared by the lead() window and the
    aggregate. Weighted sums accumulate in BIGINT cents·µs (bounded by
    ~1e14 per year-long user at fixture magnitudes; a production
    deployment with hotter users widens to DECIMAL(38,0) — same plan);
    the time-weighted mean is two divisions applied identically in
    both engines, so the result is bit-exact without any decimal
    routing."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    d = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(col("ts").cast("timestamp")).alias("us"),
            F.round(col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("dur_us", F.lead("us").over(w) - col("us"))
        .filter(col("dur_us").isNotNull())
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.count("dur_us").alias("n_spans"),
            F.sum("dur_us").alias("total_dur_us"),
            (
                F.sum(col("cents") * col("dur_us")).cast("double")
                / F.sum("dur_us").cast("double")
                / F.lit(100.0)
            ).alias("twa"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# timeseries_trend — closed-form per-key linear trend (least squares)
# ---------------------------------------------------------------------------

# Day-scaled time since a fixed epoch keeps the regressor well-conditioned;
# the same literal arithmetic runs in both engines so every IEEE op matches.
_TREND_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in micros
_US_PER_DAY = 86_400_000_000.0


def _trend_oracle() -> str:
    from cqlcopy_spark.functions.portable import sql_block_fold_agg

    x = f"((epoch_us(ts) - {_TREND_EPOCH_US}) / {_US_PER_DAY})"
    inner = sql_block_fold_agg(
        "SELECT user_id, event_id, ts, value FROM events",
        ["user_id"],
        "event_id",
        sums={
            "sx": x,
            "sy": "value",
            "sxx": f"{x} * {x}",
            "sxy": f"{x} * value",
        },
    )
    return f"""
WITH s AS ({inner})
SELECT user_id, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_per_day,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
FROM s
WHERE n >= 2
ORDER BY user_id
"""


@register("timeseries_trend", oracle=_trend_oracle())
def timeseries_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend over event values — closed-form least
    squares from moment sums (n, Σx, Σy, Σxx, Σxy), the grouped
    regression a metrics pipeline runs to rank users/series by drift.

    Float parity: the moment inputs are FULL-PRECISION doubles (day
    fractions and their products), where the decimal dsum route
    diverges by a digit-string ulp (similarity.py centroid note) — so
    every moment is a DETERMINISTIC-ORDER fold via the fixed-block fold
    tree (portable.block_fold_agg): identical IEEE adds in both
    engines, task state bounded by max(block, n/block²) instead of the
    whole group — a hot user with millions of events no longer
    materializes its term list in one aggregation buffer. One shuffle
    on user_id serves the rank window and all three fold levels. The
    closed form is then pure arithmetic on the grouped row. n ≥ 2
    filters degenerate singletons (denominator 0 → engines disagree on
    inf/NaN semantics)."""
    from cqlcopy_spark.functions.portable import block_fold_agg

    e = table(spark, sf_dir, "events")
    x = (F.unix_micros(col("ts").cast("timestamp")) - F.lit(_TREND_EPOCH_US)) / F.lit(
        _US_PER_DAY
    )
    terms = e.select(
        "user_id", "event_id", x.alias("x"), col("value").alias("y")
    )
    s = block_fold_agg(
        terms,
        ["user_id"],
        "event_id",
        sums={
            "sx": col("x"),
            "sy": col("y"),
            "sxx": col("x") * col("x"),
            "sxy": col("x") * col("y"),
        },
    ).filter(col("n") >= 2)
    n, sx, sy, sxx, sxy = col("n"), col("sx"), col("sy"), col("sxx"), col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "user_id",
        "n",
        slope.alias("slope_per_day"),
        ((sy - slope * sx) / n).alias("intercept"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# timeseries_changepoints — two-sided CUSUM level-shift detection
# ---------------------------------------------------------------------------

# The metrics-pipeline changepoint pass: flag users whose value series
# shifts level (sensor drift, behavior change, data-feed breakage).
# Two-sided CUSUM with allowance k and threshold h is the textbook
# detector, but its recursion cum_i = max(0, cum_{i-1} + x_i) is NOT a
# window prefix aggregate. The classic identity unlocks it:
#   max-reset CUSUM  ==  S_i - min(0, min_{j<=i} S_j)   (S = plain prefix sum)
# The min MUST include the empty-prefix term S_0 = 0: without it the
# detector is forced to 0 at the first row and understated whenever the
# prefix sum never dips below its starting value (a front-loaded level
# shift), delaying or missing the h-crossing.
# so the whole detector is two prefix sums + running min/max + lag —
# one user_id exchange shared by every window. All arithmetic is EXACT
# integers: cents center on the user mean WITHOUT division by working
# at n× scale (x_i = n·cents_i - total_cents), with the allowance and
# threshold scaled by n to match. int64-safe while n·max_cents < 2^63
# (n < ~2.6e14 rows per user at fixture magnitudes — document, don't
# guess, per the overflow rule).

_CUSUM_SLACK_CENTS = 500  # allowance k: ignore drifts below $5
_CUSUM_H_CENTS = 4000  # threshold h: alarm at $40 of accumulated drift

_CHANGEPOINT_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
c AS (
  SELECT user_id, event_id, cents,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         SUM(cents) OVER (PARTITION BY user_id) AS total
  FROM e
),
x AS (
  SELECT user_id, event_id, n,
         n * cents - total AS xc
  FROM c
),
s AS (
  SELECT user_id, event_id, n,
         SUM(xc - {_CUSUM_SLACK_CENTS} * n)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS UNBOUNDED PRECEDING) AS s_up,
         SUM(xc + {_CUSUM_SLACK_CENTS} * n)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS UNBOUNDED PRECEDING) AS s_dn
  FROM x
),
cu AS (
  SELECT user_id, event_id, n,
         s_up - LEAST(0, MIN(s_up) OVER (PARTITION BY user_id ORDER BY event_id
                                         ROWS UNBOUNDED PRECEDING)) AS cusum_up,
         GREATEST(0, MAX(s_dn) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING)) - s_dn AS cusum_dn
  FROM s
),
fl AS (
  SELECT user_id, n, cusum_up, cusum_dn,
         CASE WHEN cusum_up > {_CUSUM_H_CENTS} * n
               AND COALESCE(LAG(cusum_up) OVER (PARTITION BY user_id
                                                ORDER BY event_id), 0)
                   <= {_CUSUM_H_CENTS} * n THEN 1 ELSE 0 END AS up_cross,
         CASE WHEN cusum_dn > {_CUSUM_H_CENTS} * n
               AND COALESCE(LAG(cusum_dn) OVER (PARTITION BY user_id
                                                ORDER BY event_id), 0)
                   <= {_CUSUM_H_CENTS} * n THEN 1 ELSE 0 END AS dn_cross
  FROM cu
)
SELECT user_id,
       CAST(SUM(up_cross) AS BIGINT) AS n_up_shifts,
       CAST(SUM(dn_cross) AS BIGINT) AS n_dn_shifts,
       CAST(MAX(cusum_up) AS BIGINT) AS max_cusum_up,
       CAST(MAX(cusum_dn) AS BIGINT) AS max_cusum_dn
FROM fl
GROUP BY user_id
HAVING SUM(up_cross) + SUM(dn_cross) > 0
ORDER BY user_id
"""


@register("timeseries_changepoints", oracle=_CHANGEPOINT_ORACLE)
def timeseries_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user two-sided CUSUM changepoint report: users whose value
    series crossed the drift threshold, with crossing counts per
    direction and peak accumulated drift (n-scaled cents — exact
    integers end to end, see the module comment for the prefix-min
    identity that makes the max-reset recursion window-expressible).

    Plan: ONE shuffle on user_id serves every window (count/total,
    both prefix sums, running min/max, both lags) and the final
    aggregate — the raw event volume crosses the exchange once, the
    rest is per-partition sort reuse."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(col("value") * 100).cast("long").alias("cents"),
    )
    wu = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, 0)
    slack, h = _CUSUM_SLACK_CENTS, _CUSUM_H_CENTS
    x = (
        e.withColumn("n", F.count(F.lit(1)).over(wu))
        .withColumn("total", F.sum("cents").over(wu))
        .withColumn("xc", col("n") * col("cents") - col("total"))
    )
    s = x.withColumn(
        "s_up", F.sum(col("xc") - slack * col("n")).over(wrun)
    ).withColumn("s_dn", F.sum(col("xc") + slack * col("n")).over(wrun))
    cu = s.withColumn(
        "cusum_up",
        col("s_up") - F.least(F.lit(0).cast("long"), F.min("s_up").over(wrun)),
    ).withColumn(
        "cusum_dn",
        F.greatest(F.lit(0).cast("long"), F.max("s_dn").over(wrun)) - col("s_dn"),
    )
    thresh = h * col("n")
    fl = cu.withColumn(
        "up_cross",
        (
            (col("cusum_up") > thresh)
            & (F.coalesce(F.lag("cusum_up").over(wo), F.lit(0)) <= thresh)
        ).cast("int"),
    ).withColumn(
        "dn_cross",
        (
            (col("cusum_dn") > thresh)
            & (F.coalesce(F.lag("cusum_dn").over(wo), F.lit(0)) <= thresh)
        ).cast("int"),
    )
    return (
        fl.groupBy("user_id")
        .agg(
            F.sum("up_cross").alias("n_up_shifts"),
            F.sum("dn_cross").alias("n_dn_shifts"),
            F.max("cusum_up").alias("max_cusum_up"),
            F.max("cusum_dn").alias("max_cusum_dn"),
        )
        .filter(col("n_up_shifts") + col("n_dn_shifts") > 0)
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# events_ewma — exponential smoothing with exact binary halvings
# ---------------------------------------------------------------------------

# EWMA's recursion s_i = α·x_i + (1-α)·s_{i-1} is ORDER-DEPENDENT and
# non-associative — the block fold tree does NOT apply (it needs
# associative +). Instead the horizon is bounded BY DEFINITION: with
# α = 1/2 every step is an exact binary halving, and a contribution 128
# halvings back is below 2^-128 — far under double precision — so the
# last-128-events fold IS the operator, task state is 128 rows per user
# by construction, and both engines run the identical fold (Spark
# aggregate ↔ DuckDB list_reduce), bitwise.

_EWMA_HORIZON = 128

_EWMA_ORACLE = f"""
WITH r AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY event_id DESC) AS rn
  FROM events
),
tail_w AS (SELECT user_id, event_id, value FROM r WHERE rn <= {_EWMA_HORIZON}),
agg AS (
  SELECT user_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     list(value ORDER BY event_id)),
                     (acc, v) -> acc / 2 + v / 2) AS ewma,
         MAX(CASE WHEN event_id = (SELECT MAX(t2.event_id) FROM tail_w t2
                                   WHERE t2.user_id = tail_w.user_id)
                  THEN value END) AS last_value,
         CAST(COUNT(*) AS BIGINT) AS n_window
  FROM tail_w
  GROUP BY user_id
)
SELECT user_id, n_window, ewma, last_value,
       abs(last_value - ewma) AS abs_dev
FROM agg
ORDER BY user_id
"""


@register("events_ewma", oracle=_EWMA_ORACLE)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-smoothed level (α = 1/2) over the last
    {H} events, plus the current deviation from it — the smoothing a
    monitoring pipeline keeps per key for alerting (events_anomaly_
    zscore is the population-level cousin; this is the sequential one).

    Parity and scale both come from the same design point: α = 1/2
    makes every fold step an exact halving (no transcendentals), the
    128-event horizon bounds per-user task state BY DEFINITION (older
    contributions sit below 2^-128 — beneath double precision, so the
    truncation loses nothing representable), and the fold sequence is
    identical in both engines. ONE user_id exchange serves the
    recency-rank window, the horizon filter, and the fold aggregate."""
    e = table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    wr = Window.partitionBy("user_id").orderBy(col("event_id").desc())
    tail = e.withColumn("rn", F.row_number().over(wr)).filter(
        col("rn") <= _EWMA_HORIZON
    )
    lst = F.array_sort(
        F.collect_list(F.struct(col("event_id").alias("k"), col("value").alias("v")))
    )
    fold = F.aggregate(
        F.transform(lst, lambda s: s["v"]),
        F.lit(0.0),
        lambda acc, v: acc / 2 + v / 2,
    )
    agg = tail.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_window"),
        fold.alias("ewma"),
        F.max_by("value", col("event_id")).alias("last_value"),
    )
    return agg.select(
        "user_id",
        "n_window",
        "ewma",
        "last_value",
        F.abs(col("last_value") - col("ewma")).alias("abs_dev"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# timeseries_interpolate — linear interpolation of missing hourly points
# ---------------------------------------------------------------------------

# The third member of the resample family: gapfill carries the last
# value FORWARD (LOCF), time_weighted_avg integrates it; this one draws
# the straight line BETWEEN the bracketing observations — the standard
# sensor/metric resampler. The observed point per hour is a PICK (the
# close: latest (ts, event_id) row's value), not a float aggregate, so
# the only floating arithmetic is the interpolation expression itself,
# written as the identical IEEE op sequence in both engines:
# pv + (nv - pv) * (CAST(pos AS DOUBLE) / CAST(gap AS DOUBLE)).

_INTERP_ORACLE = """
WITH hourly AS (
  SELECT user_id, hour, value FROM (
    SELECT user_id, date_trunc('hour', ts) AS hour, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
span AS (
  SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1 FROM hourly GROUP BY 1
),
spine AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
  FROM span
),
j AS (
  SELECT s.user_id, s.hour, h.value
  FROM spine s LEFT JOIN hourly h ON s.user_id = h.user_id AND s.hour = h.hour
),
f AS (
  SELECT user_id, hour, value,
         LAST_VALUE(value IGNORE NULLS) OVER w_prec AS pv,
         LAST_VALUE(CASE WHEN value IS NOT NULL THEN hour END IGNORE NULLS)
           OVER w_prec AS ph,
         FIRST_VALUE(value IGNORE NULLS) OVER w_foll AS nv,
         FIRST_VALUE(CASE WHEN value IS NOT NULL THEN hour END IGNORE NULLS)
           OVER w_foll AS nh
  FROM j
  WINDOW
    w_prec AS (PARTITION BY user_id ORDER BY hour ROWS UNBOUNDED PRECEDING),
    w_foll AS (PARTITION BY user_id ORDER BY hour
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hour,
       CAST(value IS NOT NULL AS BIGINT) AS observed,
       CASE WHEN value IS NOT NULL THEN value
            ELSE pv + (nv - pv) * (CAST(date_diff('hour', ph, hour) AS DOUBLE)
                                   / CAST(date_diff('hour', ph, nh) AS DOUBLE))
       END AS ivalue
FROM f
ORDER BY user_id, hour
"""


@register("timeseries_interpolate", oracle=_INTERP_ORACLE)
def timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly series with missing hours LINEARLY interpolated
    between the bracketing observed points (observed point = that
    hour's close — latest (ts, event_id) pick, so no float aggregation
    enters the parity surface).

    Same single-lineage lead-explode shape as timeseries_gapfill (no
    spine join, no LOCF pass): each observed hourly row lead-window
    carries its NEXT observed (hour, value) and explodes its own gap
    range [hour, next-1h]; a generated row at offset pos inside a gap
    of length gap is pv + (nv-pv)·(pos/gap) by construction — both
    bracketing neighbors arrive WITH the row, nothing is carried
    across rows. Two exchanges total ((user, hour) pick agg + the user
    lead window; the explode is narrow), fan-out ∝ output grid. The
    oracle derives the same relation through the spine-join + two
    IGNORE-NULLS-window formulation — an intentionally different
    derivation of the same algebra, sharing only the interpolation
    expression (which must be IEEE-identical: pos/gap division first,
    then multiply, then add).

    No global ORDER BY on the output — the gapfill precedent: the grid
    is already clustered by user, a total sort is presentation-only
    and range-shuffles the full grid at scale; the driver compare is
    order-insensitive."""
    e = table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    hour = F.date_trunc("hour", col("ts"))
    hourly = e.groupBy("user_id", hour.alias("hour")).agg(
        F.max(
            F.struct(
                col("ts").alias("ts"),
                col("event_id").alias("event_id"),
                col("value").alias("value"),
            )
        )["value"].alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("hour")
    led = hourly.select(
        "user_id",
        "hour",
        "v",
        F.lead("hour").over(w).alias("nh"),
        F.lead("v").over(w).alias("nv"),
    )
    exploded = led.select(
        "user_id",
        "v",
        "nv",
        F.expr("timestampdiff(HOUR, hour, nh)").alias("gap"),
        F.posexplode(
            F.sequence(
                col("hour"),
                F.coalesce(col("nh") - F.expr("INTERVAL 1 HOUR"), col("hour")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("pos", "grid_hour"),
    )
    at_obs = col("pos") == 0
    return exploded.select(
        "user_id",
        col("grid_hour").alias("hour"),
        at_obs.cast("long").alias("observed"),
        F.when(at_obs, col("v"))
        .otherwise(
            col("v")
            + (col("nv") - col("v"))
            * (col("pos").cast("double") / col("gap").cast("double"))
        )
        .alias("ivalue"),
    )
