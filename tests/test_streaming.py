"""Structured Streaming variants must agree with their batch forms when
the fixture is replayed as a bounded stream (availableNow trigger)."""

from __future__ import annotations

import pandas as pd

from cqlcopy_spark.streaming.windows import (
    stream_sessionize,
    stream_sessionize_streaming,
    stream_tumbling_agg,
    stream_tumbling_agg_streaming,
)
from tests.conftest import SF_SMALL


def _run_stream(df, name: str) -> pd.DataFrame:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = df.sparkSession.sql(f"SELECT * FROM {name}").toPandas()
    q.stop()
    return out


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def test_streaming_tumbling_matches_batch(spark):
    batch = _canon(stream_tumbling_agg(spark, SF_SMALL).toPandas())
    stream = _canon(_run_stream(stream_tumbling_agg_streaming(spark, SF_SMALL), "tumbling_t"))
    pd.testing.assert_frame_equal(batch, stream)


def test_streaming_sessionize_matches_batch(spark):
    batch = _canon(stream_sessionize(spark, SF_SMALL).toPandas())
    stream = _canon(_run_stream(stream_sessionize_streaming(spark, SF_SMALL), "session_t"))
    pd.testing.assert_frame_equal(batch, stream)


def test_stateful_user_stats_matches_batch(spark):
    """applyInPandasWithState replay: final state per user == batch agg.
    Update mode appends a row per (user, micro-batch); keep each user's
    last (largest n_events) row. Float totals compared with tolerance:
    the batch side sums in decimal, the state side in float64."""
    from cqlcopy_spark.streaming.stateful import (
        stream_user_stats,
        stream_user_stats_streaming,
    )

    batch = _canon(stream_user_stats(spark, SF_SMALL).toPandas())
    q = (
        stream_user_stats_streaming(spark, SF_SMALL)
        .writeStream.format("memory")
        .queryName("user_stats_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM user_stats_t").toPandas()
    q.stop()
    final = _canon(
        out.sort_values("n_events").groupby("user_id", as_index=False).last()
    )
    pd.testing.assert_frame_equal(batch, final, check_exact=False, rtol=1e-9)
