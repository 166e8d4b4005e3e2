"""Write reliability: retry with backoff + insert-error budget
(SURVEY.md §2A ops 12, 14).

The reference retries each batch up to --max-attempts with a fixed
--backoff sleep (write.go:253-265) and counts failed batches against
--max-insert-errors (write.go:242-248 — whose abort is logged but never
enforced; we enforce it, per SURVEY.md §2A quirks).

In Spark the batch loop lives inside `foreachPartition`, so retries are
executor-local (no driver round-trip) and the error budget is a Spark
accumulator — the idiomatic distributed counter.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame

from cqlcopy_spark.config import DEFAULT_CONFIG, CopyConfig


class InsertBudgetExceeded(RuntimeError):
    pass


def retry_call(
    fn: Callable[[], None],
    max_attempts: int = DEFAULT_CONFIG.max_attempts,
    backoff_s: float = DEFAULT_CONFIG.backoff_s,
    sleep: Callable[[float], None] = time.sleep,
) -> bool:
    """Run `fn` up to max_attempts times (<= 0 = infinite, matching the
    config family's -1/0 = unlimited convention; write.go:41), fixed
    backoff between attempts (write.go:253-265). True on success."""
    attempt = 0
    while True:
        attempt += 1
        try:
            fn()
            return True
        except Exception:
            if max_attempts > 0 and attempt >= max_attempts:
                return False
            sleep(backoff_s)


def write_with_retries(
    df: DataFrame,
    write_batch: Callable[[list], None],
    cfg: CopyConfig = DEFAULT_CONFIG,
) -> int:
    """Generic retrying batched sink for non-connector targets: partitions
    ≡ workers, batches flush at `chunk_size` rows OR `max_batch_kb`
    (the reference's dual threshold, write.go:241 — the byte measure is
    the Σ of stringified field lengths), per-batch retry, enforced
    insert budget. Returns the count of failed batches when it does not
    exceed a nonnegative budget; raises InsertBudgetExceeded once the
    job-wide count does. Budget enforcement is two-level: each TASK
    aborts as soon as its local failures alone exceed the budget
    (bounding wasted retries), and the job-wide accumulator check after
    the action catches totals assembled across tasks — a driver-side
    raise is the strongest abort Spark offers without task-coordination
    overhead.

    The final partial batch is ALWAYS flushed — fixing the reference's
    dropped-trailing-batch bug (write.go:67,155-159)."""
    sc = df.sparkSession.sparkContext
    failed = sc.accumulator(0)
    chunk, attempts, backoff = cfg.chunk_size, cfg.max_attempts, cfg.backoff_s
    budget = cfg.max_insert_errors
    max_bytes = cfg.max_batch_kb * 1000  # write.go:241 divides by 1000

    def run_partition(rows: Iterator) -> None:
        from time import sleep  # stdlib only — the closure must not pull
        # in module-level cqlcopy_spark names (cloudpickle would reference
        # them and executors would need the package importable)

        batch: list = []
        batch_bytes = 0
        local_failed = 0

        def flush() -> None:
            nonlocal batch_bytes, local_failed
            if not batch:
                return
            attempt = 0
            while True:  # retry_call's loop, inlined for by-value pickling
                attempt += 1
                try:
                    write_batch(list(batch))
                    break
                except Exception:
                    if attempts > 0 and attempt >= attempts:
                        failed.add(1)
                        local_failed += 1
                        break
                    sleep(backoff)
            batch.clear()
            batch_bytes = 0
            if 0 <= budget < local_failed:
                # this task ALONE exceeds the job budget: abort now
                # instead of burning max_attempts×backoff on every
                # remaining batch of a down target
                raise RuntimeError(
                    f"insert-error budget exceeded in task: {local_failed}"
                )

        for r in rows:
            batch.append(r)
            batch_bytes += sum(len(str(v)) for v in r if v is not None)
            if len(batch) >= chunk or batch_bytes >= max_bytes:
                flush()
        flush()

    df.foreachPartition(run_partition)
    if budget >= 0 and failed.value > budget:
        raise InsertBudgetExceeded(
            f"{failed.value} failed batches exceeds --max-insert-errors={budget}"
        )
    return failed.value
