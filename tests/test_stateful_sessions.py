"""Event-time-timeout sessionizer: replay the fixture as TWO micro-
batches (file source, maxFilesPerTrigger=1) so the watermark advances
between them, and check the emitted closed sessions against the exact
rule implied by session semantics + watermark timeouts:

- every NON-final session of a user closes by gap (a later event
  arrives) and must be emitted;
- a user's FINAL session is emitted iff its end passed the END-OF-
  STREAM watermark (availableNow runs a closing batch that fires
  pending event-time timeouts against max(ts) − delay); a final session
  still inside the watermark horizon stays open in state and must NOT
  be in the output.

All timestamps are microsecond-random, so none of the boundary
comparisons are ties — the expectation is deterministic.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.streaming.stateful import _GAP_US, sessionize_stateful
from tests.conftest import SF_SMALL

_DELAY_US = 60 * 1_000_000  # 1 minute watermark delay


def test_timeout_sessionizer_two_batch_replay(spark, tmp_path):
    events = (
        table(spark, SF_SMALL, "events")
        .select(
            "user_id",
            col("ts").cast("timestamp").alias("ts"),
            F.unix_micros(col("ts").cast("timestamp")).alias("us"),
        )
        .persist()
    )
    lo, hi = events.agg(F.min("us"), F.max("us")).first()
    split_us = lo + (hi - lo) * 2 // 3

    stage = str(tmp_path / "two_phase")
    os.makedirs(stage)
    f1, f2 = os.path.join(stage, "b1.parquet"), os.path.join(stage, "b2.parquet")
    # stage integer micros only: parquet timestamps would collide with the
    # session's nanosAsLong conf; the stream rebuilds ts from micros
    cols = ["user_id", "us"]
    events.filter(col("us") <= split_us).toPandas()[cols].to_parquet(f1)
    events.filter(col("us") > split_us).toPandas()[cols].to_parquet(f2)
    now = time.time()
    os.utime(f1, (now - 60, now - 60))  # file order = batch order
    os.utime(f2, (now, now))

    src = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.timestamp_micros(col("us")))
        .withWatermark("ts", "1 minute")
    )
    q = (
        sessionize_stateful(src)
        .writeStream.format("memory")
        .queryName("timeout_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM timeout_sessions").collect()
    }
    q.stop()

    # ---- expected: replicate the rule from batch data ----
    rows = sorted(
        ((r["user_id"], r["us"]) for r in events.collect()), key=lambda t: (t[0], t[1])
    )
    sessions: dict[int, list[list[int]]] = {}
    for uid, us in rows:
        ss = sessions.setdefault(uid, [])
        if ss and us - ss[-1][1] <= _GAP_US:
            ss[-1][1] = us
            ss[-1][2] += 1
        else:
            ss.append([us, us, 1])
    wm_final_ms = (max(us for _, us in rows) - _DELAY_US) // 1000
    expected = set()
    for uid, ss in sessions.items():
        for i, (s, last, n) in enumerate(ss):
            final = i == len(ss) - 1
            if not final or (last + _GAP_US) // 1000 < wm_final_ms:
                expected.add((uid, s, last + _GAP_US, n))

    events.unpersist()
    assert emitted == expected


def test_late_event_in_open_session_does_not_split(spark, tmp_path):
    """An out-of-order event that lands INSIDE an open session from a
    later micro-batch must merge via min/max — the pre-fix code set
    last=us unconditionally, dragging the session's frontier backward so
    the next on-time event falsely exceeded the gap and split one real
    session into two."""
    import pandas as pd

    sec = 1_000_000
    base = 100_000  # seconds; an event AT the initial watermark (0) is dropped
    stage = str(tmp_path / "late_merge")
    os.makedirs(stage)
    f1, f2 = os.path.join(stage, "b1.parquet"), os.path.join(stage, "b2.parquet")
    pd.DataFrame(
        {"user_id": [1, 1], "us": [base * sec, (base + 600) * sec]}
    ).to_parquet(f1)
    # +300s is LATE (inside the open [+0, +600] session); +2200s is
    # on-time: 2200-600=1600s <= gap(1800s) so the session must NOT
    # split; +99999s exceeds the gap and closes it
    pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "us": [(base + 300) * sec, (base + 2200) * sec, (base + 99999) * sec],
        }
    ).to_parquet(f2)
    now = time.time()
    os.utime(f1, (now - 60, now - 60))
    os.utime(f2, (now, now))

    src = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.timestamp_micros(col("us")))
        .withWatermark("ts", "1 minute")
    )
    q = (
        sessionize_stateful(src)
        .writeStream.format("memory")
        .queryName("late_merge_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_merge_sessions").collect()
    }
    q.stop()
    assert emitted == {(1, base * sec, (base + 2200 + 1800) * sec, 4)}


def test_pre_session_late_events_gap_merge(spark, tmp_path):
    """Two late events that predate the open session by more than the
    gap AND sit within one gap of each other must emit ONE merged
    earlier session, not two 1-event sessions (r03 ADVICE)."""
    import pandas as pd

    sec = 1_000_000
    base = 100_000
    stage = str(tmp_path / "late_pre")
    os.makedirs(stage)
    f1, f2 = os.path.join(stage, "b1.parquet"), os.path.join(stage, "b2.parquet")
    # batch 1 opens a session at +10000s
    pd.DataFrame({"user_id": [1], "us": [(base + 10_000) * sec]}).to_parquet(f1)
    # batch 2: +0s and +900s both predate the open session by > gap
    # (1800s) and are 900s apart — one merged pre-session; +50000s closes
    # the open session by gap
    pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "us": [base * sec, (base + 900) * sec, (base + 50_000) * sec],
        }
    ).to_parquet(f2)
    now = time.time()
    os.utime(f1, (now - 60, now - 60))
    os.utime(f2, (now, now))

    src = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.timestamp_micros(col("us")))
        .withWatermark("ts", "1 minute")
    )
    q = (
        sessionize_stateful(src)
        .writeStream.format("memory")
        .queryName("late_pre_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_pre_sessions").collect()
    }
    q.stop()
    assert emitted == {
        (1, base * sec, (base + 900 + 1800) * sec, 2),
        (1, (base + 10_000) * sec, (base + 10_000 + 1800) * sec, 1),
    }


def test_cross_batch_late_split_is_the_documented_trade(spark, tmp_path):
    """CONTRACT PIN (r04 VERDICT item 5): state carries only the OPEN
    session, so two late events one gap apart that arrive in DIFFERENT
    micro-batches emit as two 1-event sessions — batch semantics would
    merge them into one. This is the documented approximation
    (stateful.py: a closed emission is final; buffering pre-session late
    events across batches is what session_window's internal buffer
    buys). If this test starts failing with ONE merged session, the
    implementation upgraded — update the docstring there and this pin
    deliberately."""
    import pandas as pd

    sec = 1_000_000
    base = 100_000
    stage = str(tmp_path / "late_xbatch")
    os.makedirs(stage)
    f1 = os.path.join(stage, "b1.parquet")
    f2 = os.path.join(stage, "b2.parquet")
    f3 = os.path.join(stage, "b3.parquet")
    # batch 1 opens a session at +10000s
    pd.DataFrame({"user_id": [1], "us": [(base + 10_000) * sec]}).to_parquet(f1)
    # batch 2: late +0s — > gap before the open session, emitted closed
    pd.DataFrame({"user_id": [1], "us": [base * sec]}).to_parquet(f2)
    # batch 3: late +900s — within one gap of +0s, but that session is
    # already emitted and gone from state; +50000s leaves the +10000s
    # session closed by gap
    pd.DataFrame(
        {"user_id": [1, 1], "us": [(base + 900) * sec, (base + 50_000) * sec]}
    ).to_parquet(f3)
    now = time.time()
    os.utime(f1, (now - 120, now - 120))
    os.utime(f2, (now - 60, now - 60))
    os.utime(f3, (now, now))

    src = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.timestamp_micros(col("us")))
        # 3h delay: the late rows must clear Spark's input-side late-row
        # filter (watermark applied with a one-batch lag) so the test
        # pins the SESSIONIZER's state contract, not the filter
        .withWatermark("ts", "3 hours")
    )
    q = (
        sessionize_stateful(src)
        .writeStream.format("memory")
        .queryName("late_xbatch_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_xbatch_sessions").collect()
    }
    q.stop()
    # the trade: {+0s, +900s} would be ONE session in batch semantics
    assert emitted == {
        (1, base * sec, (base + 1_800) * sec, 1),
        (1, (base + 900) * sec, (base + 900 + 1_800) * sec, 1),
        (1, (base + 10_000) * sec, (base + 10_000 + 1_800) * sec, 1),
    }


def test_late_chain_bridges_into_open_session(spark, tmp_path):
    """Two late events where the LATER one is within the gap of the open
    session's start must chain the whole run into ONE open session
    starting at the earliest late event — the pre-clustering code
    dispatched the first late event against the old start and emitted a
    1-event session OVERLAPPING the still-open one (review finding)."""
    import pandas as pd

    sec = 1_000_000
    base = 100_000
    stage = str(tmp_path / "late_chain")
    os.makedirs(stage)
    f1 = os.path.join(stage, "b1.parquet")
    f2 = os.path.join(stage, "b2.parquet")
    f3 = os.path.join(stage, "b3.parquet")
    pd.DataFrame({"user_id": [1], "us": [(base + 10_000) * sec]}).to_parquet(f1)
    # +8100s is > gap before the open start, +8300s is WITHIN the gap of
    # it (1700s ≤ 1800s) — the chain {8100, 8300, 10000} is one session
    pd.DataFrame(
        {"user_id": [1, 1], "us": [(base + 8_100) * sec, (base + 8_300) * sec]}
    ).to_parquet(f2)
    pd.DataFrame({"user_id": [1], "us": [(base + 99_999) * sec]}).to_parquet(f3)
    now = time.time()
    os.utime(f1, (now - 120, now - 120))
    os.utime(f2, (now - 60, now - 60))
    os.utime(f3, (now, now))

    src = (
        spark.readStream.schema("user_id long, us long")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .withColumn("ts", F.timestamp_micros(col("us")))
        .withWatermark("ts", "1 minute")
    )
    q = (
        sessionize_stateful(src)
        .writeStream.format("memory")
        .queryName("late_chain_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = {
        (r["user_id"], r["start_us"], r["end_us"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_chain_sessions").collect()
    }
    q.stop()
    assert emitted == {(1, (base + 8_100) * sec, (base + 10_000 + 1_800) * sec, 3)}
