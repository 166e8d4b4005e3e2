"""Custom PySpark DataSource WRITER reproducing the reference's write
path (SURVEY.md §2A ops 10-12, 14, 20) with two-phase commit:

- write.go:37-38 — batches flush at `chunk_size` rows OR `max_batch_kb`
  (Σ field bytes), whichever trips first → same dual threshold here.
- write.go:97-101 — the reference NEVER flushes a worker's final partial
  batch (its `rows` channel closes without a drain; SURVEY.md §2A
  quirks); this writer flushes it, which is the behavior users expect.
- write.go:253-265 — per-batch retry with fixed backoff → retry_call.

Two-phase commit is the part Spark adds over the reference: each task
writes its batches to a UUID-staged file and returns a commit message;
the driver's commit() atomically renames every staged file into the
destination, and abort() removes strays — a failed/retried task can
never leave half-written output visible. That is exactly the contract
`DataFrameWriter.save()` gives parquet, re-implemented for a custom
batched-CSV sink via the Python DataSource API.

Scale posture: tasks write independently (no coordination until the
driver-side commit); commit cost ∝ #files = #partitions, not bytes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

from cqlcopy_spark.config import DEFAULT_CONFIG
from cqlcopy_spark.sinks.retry import retry_call


@dataclass
class StagedFile(WriterCommitMessage):
    staged_path: str
    final_name: str
    n_rows: int
    n_batches: int


class BatchedCsvWriter(DataSourceWriter):
    def __init__(self, options, overwrite=False):
        self.path = options["path"]
        self.overwrite = overwrite
        # defaults come from DEFAULT_CONFIG (the reference's CLI defaults,
        # write.go:35-41) so the sink can't drift from the COPY surface
        self.chunk_size = int(options.get("chunk_size", str(DEFAULT_CONFIG.chunk_size)))
        self.max_batch_bytes = (
            int(options.get("max_batch_kb", str(DEFAULT_CONFIG.max_batch_kb))) * 1000
        )
        self.max_attempts = int(
            options.get("max_attempts", str(DEFAULT_CONFIG.max_attempts))
        )
        self.backoff_s = float(options.get("backoff_s", str(DEFAULT_CONFIG.backoff_s)))
        # rendering conventions (op 20/21): without these the staged CSV
        # could not be re-ingested by the engine's own readers — nulls
        # must be the null literal (not ""), booleans the configured
        # lowercase literals (not Python's 'True'), timestamps the
        # configured layout (not datetime.__str__)
        self.null_literal = options.get("null_literal", DEFAULT_CONFIG.null_literal)
        bs = options.get("bool_style", ",".join(DEFAULT_CONFIG.bool_style))
        self.true_lit, self.false_lit = (x.strip() for x in bs.split(","))
        # timestamp layout DERIVED from the COPY surface's --time-format
        # (Go layout → strftime), so this sink renders the same wire form
        # cfg.time_format re-parses. PySpark hands the Python writer
        # tz-NAIVE datetimes (session tz UTC): a naive strftime("%z")
        # renders EMPTY, so _render localizes to UTC first — otherwise
        # the emitted lines are not re-ingestable under the default
        # layout (its read side requires an offset).
        from cqlcopy_spark.config import go_layout_to_strftime

        go_fmt = options.get("time_format_go", DEFAULT_CONFIG.time_format_go)
        self.ts_format = options.get("ts_format", go_layout_to_strftime(go_fmt))

    def write(self, iterator):
        """Task-side: accumulate rows into batches, flush each batch
        (with retry) to a staging file unique to this task attempt.
        The FINAL PARTIAL BATCH IS FLUSHED — the reference's documented
        drop (write.go:97-101) is a bug, not a contract."""
        import uuid

        attempt_id = uuid.uuid4().hex
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        staged = os.path.join(self.path, "_staging", f"part-{attempt_id}.csv")
        n_rows = n_batches = 0
        batch: list[str] = []
        batch_bytes = 0

        def flush() -> None:
            nonlocal batch, batch_bytes, n_batches
            if not batch:
                return
            lines = "".join(batch)
            base = os.path.getsize(staged) if os.path.exists(staged) else 0

            def _append() -> None:
                # idempotent under retry: a previous attempt may have
                # appended PART of this batch before failing — truncate
                # back to the pre-batch offset so re-appending the whole
                # batch can't duplicate rows (the reference's INSERT
                # retry is idempotent; a raw file append is not)
                with open(staged, "a", encoding="utf-8") as f:
                    f.truncate(base)
                    f.write(lines)

            if not retry_call(
                _append, max_attempts=self.max_attempts, backoff_s=self.backoff_s
            ):
                # Exhausted retries must FAIL the task (Spark then retries
                # the task or aborts the job → abort() cleans staging).
                raise IOError(f"batch flush failed after {self.max_attempts} attempts")
            n_batches += 1
            batch, batch_bytes = [], 0

        import csv
        import io

        import datetime as _dt

        def _render(v) -> str:
            if v is None:
                return self.null_literal
            if isinstance(v, bool):
                return self.true_lit if v else self.false_lit
            if isinstance(v, _dt.datetime):
                if v.tzinfo is None and "%z" in self.ts_format:
                    # session tz is UTC, so naive values ARE UTC instants;
                    # without this, %z renders as the empty string
                    v = v.replace(tzinfo=_dt.timezone.utc)
                return v.strftime(self.ts_format)
            return str(v)

        def _csv_line(row) -> str:
            # RFC-4180 quoting (the convention csv_sink/write_csv uses):
            # a bare join corrupts fields containing commas/quotes/newlines
            buf = io.StringIO()
            csv.writer(buf, lineterminator="\n", quoting=csv.QUOTE_MINIMAL).writerow(
                [_render(v) for v in row]
            )
            return buf.getvalue()

        for row in iterator:
            line = _csv_line(row)
            batch.append(line)
            # UTF-8 octets of the QUOTED line. The reference counts the
            # UNQUOTED field bytes (write.go:238-240, the formulation
            # csv_sink.with_batch_id mirrors with octet_length); this
            # sink counts what it actually stages — strictly ≥ the
            # reference's measure, so batches can only flush EARLIER,
            # never overshoot the byte budget. The r03-flagged bug was
            # counting Python CODEPOINTS, which undercounts multi-byte
            # text ~2-4× and overshoots.
            batch_bytes += len(line.encode("utf-8"))
            n_rows += 1
            if len(batch) >= self.chunk_size or batch_bytes >= self.max_batch_bytes:
                flush()
        flush()  # the final partial batch — flushed, not dropped
        if n_rows == 0:
            # No file staged for an empty partition; commit skips it.
            return StagedFile("", f"part-{attempt_id}.csv", 0, 0)
        return StagedFile(staged, f"part-{attempt_id}.csv", n_rows, n_batches)

    def commit(self, messages):
        """Driver-side: atomically publish every staged file, then clear
        the staging dir INCLUDING strays — a task attempt that died after
        flushing (and was retried under a fresh uuid) leaves a staged
        file no commit message references; it must not survive a
        successful job. Until the rename loop runs, readers of `path`
        see nothing."""
        import shutil

        if self.overwrite:
            # honor .mode("overwrite") like every built-in format: stale
            # part files from a previous job must not survive beside the
            # new ones (silently appending under an overwrite request
            # duplicates rows for every downstream reader)
            for name in os.listdir(self.path):
                if name.startswith("part-") and name.endswith(".csv"):
                    os.remove(os.path.join(self.path, name))
        for m in messages:
            if m is not None and m.n_rows:
                os.replace(m.staged_path, os.path.join(self.path, m.final_name))
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)

    def abort(self, messages):
        # failed tasks contribute None commit messages (pyspark
        # DataSourceWriter.abort contract); their partially-written
        # stray files carry no message either — clear the WHOLE staging
        # dir, exactly like commit() does, or orphaned partial data
        # accumulates across failed runs
        import shutil

        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging, ignore_errors=True)


class BatchedCsvSinkDataSource(DataSource):
    """df.write.format("cql_batched").option("path", dir)
    .mode("append").save() — Python DataSources support only
    append/overwrite save modes; append matches the reference's
    INSERT-only semantics."""

    @classmethod
    def name(cls):
        return "cql_batched"

    def writer(self, schema, overwrite):
        return BatchedCsvWriter(self.options, overwrite=overwrite)


def register_batched_sink(spark) -> None:
    from cqlcopy_spark.catalog import _ship_package

    key = "cqlcopy_spark._batched_sink_registered"
    if spark.conf.get(key, None) == "1":
        return
    # the writer class is cloudpickled BY REFERENCE — executors must be
    # able to import cqlcopy_spark (CLAUDE.md UDF-shipping rule)
    _ship_package(spark)
    spark.dataSource.register(BatchedCsvSinkDataSource)
    spark.conf.set(key, "1")
