"""Custom stateful streaming operator (SURVEY.md §2B streaming row):
per-user lifetime stats maintained in explicit GroupState via
applyInPandasWithState — the escape hatch for stateful semantics that
`window()` / `session_window()` can't express.

Layout mirrors streaming/windows.py: a registered BATCH form (DuckDB
oracle-checked — the semantics contract) and a true streaming form whose
replay over the bounded fixture must agree (tests/test_streaming.py).

Scale: state is one fixed-width row per user, partitioned by the group
key — the shuffle is on user_id only, and each micro-batch touches only
the users present in it. In production the NoTimeout below becomes an
event-time timeout + watermark so dormant users' state is evicted; the
fixture replay is bounded, so eviction never fires and would only add
noise to the batch-parity test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.functions.portable import dsum, sql_dsum
from cqlcopy_spark.plans.registry import register

_OUT_SCHEMA = "user_id long, n_events long, total_value double, last_us long"
_STATE_SCHEMA = "n_events long, total_value double, last_us long"

_USER_STATS_ORACLE = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value,
       MAX(epoch_us(ts)) AS last_us
FROM events
GROUP BY user_id
ORDER BY user_id
"""


@register("stream_user_stats", oracle=_USER_STATS_ORACLE)
def stream_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime stats, batch form (the semantics contract for
    the applyInPandasWithState streaming variant below). One shuffle of
    partial aggregates on user_id."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum(col("value")).alias("total_value"),
            F.max(F.unix_micros(col("ts").cast("timestamp"))).alias("last_us"),
        )
        .orderBy("user_id")
    )


_GAP_US = 30 * 60 * 1_000_000  # session gap, matches windows.py


def sessionize_stateful(stream: DataFrame) -> DataFrame:
    """Custom sessionizer with EVENT-TIME TIMEOUTS — the full stateful
    lifecycle session_window() hides: explicit per-user state carrying
    the open session, gap-splitting inside each batch, and a watermark-
    driven timeout that CLOSES idle sessions and evicts their state
    (session_window semantics, hand-built where custom logic — session
    caps, per-session payloads, fraud scores — would hook in).

    input: streaming df with columns (ts TIMESTAMP watermarked, user_id,
    us = unix micros). Emits one row per CLOSED session; a session still
    open at the watermark stays in state, not in output. Timeout
    timestamps are clamped above the current watermark (Spark rejects
    timeouts at/below it)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = _GAP_US

    def update(key, pdfs, state: GroupState):
        out: list[tuple] = []
        if state.hasTimedOut:
            s, last, n = state.get
            out.append((key[0], s, last + gap_us, n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs))
            if len(rows):
                s, last, n = state.get if state.exists else (None, None, 0)
                for us in rows.sort_values("us")["us"]:
                    us = int(us)
                    if s is None:
                        s, last, n = us, us, 1
                    elif us - last <= gap_us:
                        last, n = us, n + 1
                    else:
                        out.append((key[0], s, last + gap_us, n))
                        s, last, n = us, us, 1
                state.update((s, last, n))
                timeout_ms = (last + gap_us) // 1000
                state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            out, columns=["user_id", "start_us", "end_us", "n_events"]
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, start_us long, end_us long, n_events long",
        stateStructType="start_us long, last_us long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_user_stats_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming form: explicit per-user GroupState updated by an
    Arrow-batched pandas function. Output mode `update` — each
    micro-batch emits the new running totals for the users it touched.

    The update function is defined NESTED so cloudpickle serializes it
    by value (no import needed on executor workers)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cqlcopy_spark.streaming.windows import _events_stream

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, tot, last = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            tot += float(pdf["value"].sum())
            mx = int(pdf["us"].max())
            last = mx if last is None or mx > last else last
        state.update((n, tot, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [tot],
                "last_us": [last],
            }
        )

    src = _events_stream(spark, sf_dir).select(
        "user_id", "value", F.unix_micros(col("ts")).alias("us")
    )
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
