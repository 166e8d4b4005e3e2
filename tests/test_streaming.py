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
