"""Streaming sinks: exactly-once file output via foreachBatch.

Structured Streaming's contract is at-least-once batch REPLAY after a
failure: a micro-batch may run twice with the SAME batch_id. Exactly-
once therefore comes from idempotence — route every batch's output to a
batch_id-keyed location and overwrite, so a replay rewrites the same
files instead of appending duplicates. Combined with the checkpoint
(which is what makes batch ids stable across restarts), the sink output
is exactly-once at any scale; this is the pattern behind every
production "stream to data lake" job that can't use a transactional
table format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def exactly_once_parquet_sink(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> DataStreamWriter:
    """writeStream writer whose foreachBatch lands each micro-batch in
    out_dir/batch_id=<id> with overwrite semantics. Read the result as
    ordinary partitioned parquet (batch_id is a hive partition key —
    prune it away or drop it)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch_id={batch_id}")
        )

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )


def continuous_copy_sink(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str, **sink_options: str
) -> DataStreamWriter:
    """Streaming analog of the reference's loader (continuous COPY):
    every micro-batch flows through the batched two-phase-commit sink
    (sinks/batched_sink.py — dual-threshold batching, retries, staged
    commit), landing in out_dir/batch_id=<id>. The batch_id keying makes
    replays idempotent exactly like exactly_once_parquet_sink, and the
    sink's own commit/abort protocol guarantees a half-failed micro-batch
    never publishes partial files INSIDE its directory — the two layers
    compose to exactly-once CSV delivery. Options (chunk_size,
    max_batch_kb, max_attempts, ...) pass through to the sink."""
    import shutil

    from cqlcopy_spark.sinks.batched_sink import register_batched_sink

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        register_batched_sink(batch_df.sparkSession)
        dest = os.path.join(out_dir, f"batch_id={batch_id}")
        shutil.rmtree(dest, ignore_errors=True)  # replay → rewrite, not append
        w = batch_df.write.format("cql_batched").option("path", dest)
        for k, v in sink_options.items():
            w = w.option(k, str(v))
        w.mode("append").save()

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
