"""Event-time windowing (SURVEY.md §2C ops 34-35): tumbling aggregation
and sessionization, batch-equivalent first (oracle-checkable), with true
Structured Streaming variants built from the same logical pieces.

The batch and streaming versions share the aggregation expressions —
`window()` / `session_window()` produce identical results over a bounded
input whether executed as a batch query or a streaming query with an
availableNow trigger, which is exactly what tests/test_streaming.py
asserts. Watermarks only bound state retention; they do not change
results on ordered bounded replays.

Scale: both ops shuffle once on (window/session key); streaming state is
per-key-and-window, evicted by the watermark — the 100 TB concern is key
cardinality × window retention, controlled by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.functions.portable import dsum, sql_dsum
from cqlcopy_spark.plans.registry import register

_GAP_MIN = 30  # session gap
_WATERMARK = "2 hours"

# ---------------------------------------------------------------------------
# op 34: stream_tumbling_agg
# ---------------------------------------------------------------------------

_TUMBLING_ORACLE = f"""
SELECT
  time_bucket(INTERVAL '1 hour', ts) AS window_start,
  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2, 3
ORDER BY 1, 3
"""


def tumbling_agg(events: DataFrame) -> DataFrame:
    """Shared logical plan for batch and streaming execution."""
    w = F.window(col("ts"), "1 hour")
    return (
        events.groupBy(w.alias("w"), col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum(col("value")).alias("total_value"))
        .select(
            col("w.start").alias("window_start"),
            col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register("stream_tumbling_agg", oracle=_TUMBLING_ORACLE)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event type (batch form)."""
    return tumbling_agg(table(spark, sf_dir, "events")).orderBy(
        "window_start", "event_type"
    )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming source over the events fixture. Watermarks require
    TIMESTAMP (not NTZ). events.ts is parquet TIMESTAMP(NANOS), and how
    that surfaces varies by environment (see catalog._events): raw int64
    nanos when spark.sql.legacy.parquet.nanosAsLong is honored, or a µs
    timestamp when the environment maps NANOS natively and ignores the
    conf. FileStreamSource takes the schema as given with no probing, so
    declare whichever dtype a batch read of the same file reports —
    guessing wrong silently misreads ts (a long schema over a native
    mapping yields µs that a ns→µs division then wrecks)."""
    import os

    from pyspark.sql import types as T

    # the µs-instant cast below and every window boundary assume UTC —
    # pin it like catalog.table() does (no table() call on this path)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    path = os.path.join(sf_dir, "events.parquet")
    ts_type = spark.read.parquet(path).schema["ts"].dataType
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # FileStreamSource requires a DIRECTORY; the fixture is a single file.
    # Stage a symlink dir (cheap, idempotent) — in production the source
    # would already be a directory of arriving files. The stage is keyed
    # by a hash of the FULL fixture path (two sf_dirs can share a
    # basename), checked with lexists (a dangling link exists for
    # symlink() but not for exists()), and tolerant of a concurrent
    # creator.
    import hashlib

    stage = os.path.join(
        "/tmp/cqlcopy_spark/stream_src",
        hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:16],
        "events",
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if os.path.lexists(link) and os.path.realpath(link) != os.path.realpath(path):
        os.remove(link)  # stale or dangling from a moved fixture
    if not os.path.lexists(link):
        try:
            os.symlink(path, link)
        except FileExistsError:
            pass
    src = spark.readStream.schema(schema).parquet(stage)
    # ONE truncation contract with the batch loader (catalog.
    # normalize_event_ts): the replay-parity tests presume both paths
    # read identical ts values. "timestamp" (not ntz) for watermark
    # eligibility — same instant under the UTC session TZ.
    from cqlcopy_spark.catalog import normalize_event_ts

    return normalize_event_ts(src, "timestamp")


def stream_tumbling_agg_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming form: file source → watermark → windowed agg.
    Late data beyond the watermark is dropped; state for closed windows
    is evicted. Run with trigger(availableNow=True) + complete/append
    mode to replay the fixture as a bounded stream."""
    out = tumbling_agg(_events_stream(spark, sf_dir).withWatermark("ts", _WATERMARK))
    return out.select(
        col("window_start").cast("timestamp_ntz").alias("window_start"),
        col("window_end").cast("timestamp_ntz").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


# ---------------------------------------------------------------------------
# op 35: stream_sessionize
# ---------------------------------------------------------------------------

# Gaps-and-islands: a new session starts when the gap from the previous
# event of the same user exceeds GAP; session id = running count of
# session starts; session end = last event + GAP (matching Spark's
# session_window end semantics).
_SESSION_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= INTERVAL '{_GAP_MIN} minutes'
              THEN 0 ELSE 1 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '{_GAP_MIN} minutes' AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def sessionize(events: DataFrame) -> DataFrame:
    """Shared logical plan: session_window with a {gap}-minute gap."""
    sw = F.session_window(col("ts"), f"{_GAP_MIN} minutes")
    return (
        events.groupBy(sw.alias("sw"), col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            col("sw.start").alias("session_start"),
            col("sw.end").alias("session_end"),
            "n_events",
        )
    )


@register("stream_sessionize", oracle=_SESSION_ORACLE)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (batch form). The oracle is the classic
    gaps-and-islands SQL — asserting the two formulations agree is the
    strongest portable check of session semantics."""
    return sessionize(table(spark, sf_dir, "events")).orderBy(
        "user_id", "session_start"
    )


# ---------------------------------------------------------------------------
# stream-stream interval join: purchases ⋈ preceding views within 30 min
# ---------------------------------------------------------------------------

_JOIN_WINDOW_MIN = 30

_INTERVAL_JOIN_ORACLE = f"""
SELECT p.event_id AS p_event_id, p.user_id,
       p.ts AS p_ts, v.ts AS v_ts, v.value AS v_value
FROM events p JOIN events v
  ON p.user_id = v.user_id
 AND p.event_type = 'purchase' AND v.event_type = 'view'
 AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL '{_JOIN_WINDOW_MIN} minutes'
"""


def _interval_join(purchases: DataFrame, views: DataFrame) -> DataFrame:
    """Shared logical plan: every (purchase, view) pair of the same user
    with the view in the 30 minutes up to the purchase."""
    return purchases.join(
        views,
        (col("p_user") == col("v_user"))
        & (col("v_ts") <= col("p_ts"))
        & (col("v_ts") > col("p_ts") - F.expr(f"INTERVAL {_JOIN_WINDOW_MIN} MINUTES")),
    ).select(
        "p_event_id",
        col("p_user").alias("user_id"),
        "p_ts",
        "v_ts",
        "v_value",
    )


def _split_purchases_views(src: DataFrame) -> tuple[DataFrame, DataFrame]:
    purchases = src.filter(col("event_type") == "purchase").select(
        col("event_id").alias("p_event_id"),
        col("user_id").alias("p_user"),
        col("ts").alias("p_ts"),
    )
    views = src.filter(col("event_type") == "view").select(
        col("user_id").alias("v_user"),
        col("ts").alias("v_ts"),
        col("value").alias("v_value"),
    )
    return purchases, views


@register("stream_interval_join", oracle=_INTERVAL_JOIN_ORACLE)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-stream interval join (the semantics
    contract for the streaming variant below). Equi-key on user plus a
    time band — one shuffle on user_id for each side."""
    purchases, views = _split_purchases_views(table(spark, sf_dir, "events"))
    return _interval_join(purchases, views)


def stream_interval_join_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stream-stream inner join: both sides are unbounded streams;
    the watermarks plus the time-band condition let Spark EVICT buffered
    state (a view older than watermark − 30 min can never match a future
    purchase). Without the band the state would grow forever — the
    condition is correctness AND liveness at 100 TB/day rates."""
    p_src, v_src = _split_purchases_views(_events_stream(spark, sf_dir))
    purchases = p_src.withWatermark("p_ts", _WATERMARK)
    views = v_src.withWatermark("v_ts", _WATERMARK)
    out = _interval_join(purchases, views)
    return out.select(
        "p_event_id",
        "user_id",
        col("p_ts").cast("timestamp_ntz").alias("p_ts"),
        col("v_ts").cast("timestamp_ntz").alias("v_ts"),
        "v_value",
    )


def stream_sessionize_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming sessionization: session_window state merges windows
    as events arrive; the watermark closes sessions whose gap horizon has
    passed, bounding state."""
    out = sessionize(_events_stream(spark, sf_dir).withWatermark("ts", _WATERMARK))
    return out.select(
        "user_id",
        col("session_start").cast("timestamp_ntz").alias("session_start"),
        col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# stream_dedup — streaming exact deduplication (dropDuplicatesWithinWatermark)
# ---------------------------------------------------------------------------

_DEDUP_ORACLE = """
SELECT user_id, event_type, event_id, ts, value
FROM (
  SELECT user_id, event_type, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
"""


@register("stream_dedup", oracle=_DEDUP_ORACLE)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, event_type) — the deterministic batch form
    of streaming dedup: min-by-(ts, event_id) via one windowed pass,
    one shuffle on the dedup key. Contrast with dropDuplicates, whose
    surviving row is arrival-order-dependent — fine for at-most-once
    semantics, unusable for a value hash."""
    e = table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    )


def stream_dedup_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming dedup: dropDuplicatesWithinWatermark keeps the
    FIRST ARRIVAL per key and evicts key state once the watermark passes
    the key's last-seen timestamp — bounded state at 100 TB, unlike
    unwindowed dropDuplicates whose key set grows forever. The surviving
    row is arrival-order-dependent, so parity with the batch form is on
    the KEY SET (tests/test_streaming.py), not row payloads."""
    src = _events_stream(spark, sf_dir).withWatermark("ts", _WATERMARK)
    return src.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type", "event_id"
    )


# ---------------------------------------------------------------------------
# stream_sliding_agg — overlapping (sliding) event-time windows
# ---------------------------------------------------------------------------

_SLIDE_MIN = 30  # 1-hour windows advancing every 30 minutes

_SLIDING_ORACLE = f"""
SELECT
  time_bucket(INTERVAL '{_SLIDE_MIN} minutes', ts) - off * INTERVAL '{_SLIDE_MIN} minutes'
    AS window_start,
  time_bucket(INTERVAL '{_SLIDE_MIN} minutes', ts) - off * INTERVAL '{_SLIDE_MIN} minutes'
    + INTERVAL '1 hour' AS window_end,
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS total_value
FROM events CROSS JOIN (SELECT unnest([0, 1]) AS off) offsets
GROUP BY 1, 2, 3
ORDER BY 1, 3
"""


def sliding_agg(events: DataFrame) -> DataFrame:
    """Shared logical plan for batch and streaming execution. Spark's
    window(ts, width, slide) assigns each event to width/slide = 2
    overlapping windows via Expand — map-side row duplication, exactly
    the unnest([0,1]) cross join the oracle spells out; still ONE
    shuffle, keyed by (window, type)."""
    w = F.window(col("ts"), "1 hour", f"{_SLIDE_MIN} minutes")
    return (
        events.groupBy(w.alias("w"), col("event_type"))
        .agg(F.count("*").alias("n_events"), dsum(col("value")).alias("total_value"))
        .select(
            col("w.start").alias("window_start"),
            col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register("stream_sliding_agg", oracle=_SLIDING_ORACLE)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour/30-minute event-time windows per event type (batch
    form). Each event lands in exactly two windows; the aggregation
    state is 2× the tumbling case — the width/slide ratio is the state
    multiplier to budget at scale."""
    return sliding_agg(table(spark, sf_dir, "events")).orderBy(
        "window_start", "event_type"
    )


def stream_sliding_agg_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming variant: watermark evicts a window's state once the
    watermark passes window_end — with overlapping windows each event
    holds open two windows, so the in-flight state is (width/slide) ×
    open keys; the watermark horizon bounds it exactly as in tumbling."""
    out = sliding_agg(
        _events_stream(spark, sf_dir).withWatermark("ts", _WATERMARK)
    )
    return out.select(
        col("window_start").cast("timestamp_ntz").alias("window_start"),
        col("window_end").cast("timestamp_ntz").alias("window_end"),
        "event_type",
        "n_events",
        "total_value",
    )


# ---------------------------------------------------------------------------
# stream_static_join — stream enriched by a static dimension table
# ---------------------------------------------------------------------------

_STATIC_JOIN_ORACLE = f"""
SELECT e.event_type, c.c_mktsegment,
       COUNT(*) AS n_events,
       {sql_dsum('e.value')} AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.event_type, c.c_mktsegment
ORDER BY e.event_type, c.c_mktsegment
"""


def _static_join_agg(events: DataFrame, cust: DataFrame) -> DataFrame:
    """Shared logical plan: enrich the event stream with the customer
    dimension, then aggregate per (event_type, segment).

    The static side is UNHINTED (r10: last site of the SF-scaling hint
    audit — customer grows with SF, and an explicit hint has no size
    fallback, it aborts at the 8 GB broadcast ceiling): the planner's
    size stats pick the broadcast per micro-batch while customer fits
    and degrade to a shuffle join past it — at which point pre-bucketing
    both sides on the key is the real lever (SCALE.md)."""
    return (
        events.join(
            cust.select("c_custkey", "c_mktsegment"),
            col("user_id") == col("c_custkey"),
        )
        .groupBy("event_type", "c_mktsegment")
        .agg(F.count("*").alias("n_events"), dsum(col("value")).alias("total_value"))
    )


@register("stream_static_join", oracle=_STATIC_JOIN_ORACLE)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join (batch form): events keyed by
    user_id pick up the customer dimension, aggregated per (event_type,
    market segment). The streaming class this demonstrates needs no
    watermark — a static side is re-broadcast per micro-batch, holds no
    join state, and never delays output. At 100 TB the static side is
    the usual broadcast-threshold question; past it, pre-bucket both
    sides on the key."""
    return _static_join_agg(
        table(spark, sf_dir, "events"), table(spark, sf_dir, "customer")
    ).orderBy("event_type", "c_mktsegment")


def stream_static_join_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming form: readStream events ⋈ static customer dim →
    running aggregate (complete mode). The dimension is a plain batch
    DataFrame — Structured Streaming broadcasts it into every
    micro-batch; only the aggregation keeps state (per-group sums),
    bounded by group cardinality, not stream length."""
    return _static_join_agg(
        _events_stream(spark, sf_dir), table(spark, sf_dir, "customer")
    )


# ---------------------------------------------------------------------------
# stream_ohlc — windowed picking rollup (open/high/low/close) per type
# ---------------------------------------------------------------------------

_OHLC_W_ORACLE = """
WITH r AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS window_start, value,
         ROW_NUMBER() OVER (PARTITION BY event_type,
                                         time_bucket(INTERVAL '1 hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type,
                                         time_bucket(INTERVAL '1 hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT window_start, event_type,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n
FROM r
GROUP BY 1, 2
ORDER BY 1, 2
"""


def ohlc_windowed(events: DataFrame) -> DataFrame:
    """Shared logical plan for batch and streaming OHLC: 1-hour windows
    per event type, open/close picked by the (ts, event_id) ordering
    struct — min_by/max_by are declarative aggregates with partial
    merge, so the SAME plan runs as a streaming stateful agg with
    watermark-evicted window state."""
    w = F.window(col("ts"), "1 hour")
    key = F.struct(col("ts"), col("event_id"))
    return (
        events.groupBy(w.alias("w"), col("event_type"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count("*").alias("n"),
        )
        .select(
            col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
        )
    )


@register("stream_ohlc", oracle=_OHLC_W_ORACLE)
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed OHLC rollup (batch form of the shared plan; the
    timeseries module's events_ohlc_rollup is the date_trunc
    formulation — this one is window()-keyed so the identical plan
    streams)."""
    return ohlc_windowed(table(spark, sf_dir, "events")).orderBy(
        "window_start", "event_type"
    )


def stream_ohlc_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming form: file source → watermark → windowed picking
    agg; open/close state is one (value, key) pair per window, evicted
    at the watermark like any windowed aggregate."""
    out = ohlc_windowed(_events_stream(spark, sf_dir).withWatermark("ts", _WATERMARK))
    return out.select(
        col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "open",
        "high",
        "low",
        "close",
        "n",
    )
