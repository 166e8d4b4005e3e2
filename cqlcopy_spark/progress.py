"""Progress reporting (SURVEY.md §2A op 15).

The reference runs a metrics goroutine printing total rows, failures,
current and average rows/s every --report-frequency (write.go:162-179).
The Spark-idiomatic equivalent is a driver-side thread reading an
accumulator that tasks increment — no extra shuffle, no collect; the
accumulator update rides the existing task heartbeat.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

from cqlcopy_spark.config import DEFAULT_CONFIG, CopyConfig


class ProgressReporter:
    """Driver-side rows/s reporter over a Spark accumulator."""

    def __init__(
        self,
        sc,
        report: Callable[[str], None] = print,
        freq_s: float = DEFAULT_CONFIG.report_freq_s,
    ) -> None:
        self.rows = sc.accumulator(0)
        self.failures = sc.accumulator(0)
        self._report = report
        self._freq = max(freq_s, 0.1)  # reference floors at 100ms (write.go:126-128)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # only the PREVIOUS sample is ever read; a growing list leaked
        # one tuple per tick for the job's lifetime, and the final
        # __exit__ emit could interleave with a straggling loop tick —
        # a lock plus one slot fixes both
        self._emit_lock = threading.Lock()
        self._prev: tuple[float, int] | None = None

    def __enter__(self) -> "ProgressReporter":
        self._t0 = time.monotonic()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2 * self._freq)
        self._emit()  # final line, like the reference's last tick

    def _loop(self) -> None:
        while not self._stop.wait(self._freq):
            self._emit()

    def _emit(self) -> None:
        with self._emit_lock:
            now = time.monotonic()
            done = self.rows.value
            prev_t, prev_n = self._prev if self._prev else (self._t0, 0)
            self._prev = (now, done)
            cur = (done - prev_n) / max(now - prev_t, 1e-9)
            avg = done / max(now - self._t0, 1e-9)
            self._report(
                f"{done} rows done ({self.failures.value} failures), "
                f"{cur:.0f} rows/s, {avg:.0f} avg rows/s"
            )

    def instrument(self, df: DataFrame) -> DataFrame:
        """Count rows flowing through this point of the plan via
        mapInPandas (Arrow-batched; adds no shuffle).

        Caveat: accumulator updates inside a TRANSFORMATION are applied
        once per task ATTEMPT — retries, speculation, and stage
        recomputation overcount. That matches the reference's progress
        counter (a monitoring signal, not an exactly-once ledger:
        write.go:162-179 counts batches as workers attempt them); do not
        use this figure for row-count parity checks."""
        import pandas as pd  # noqa: F401

        rows = self.rows
        schema = df.schema

        def counter(batches: Iterator) -> Iterator:
            for pdf in batches:
                rows.add(len(pdf))
                yield pdf

        return df.mapInPandas(counter, schema=schema)
