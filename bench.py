"""Bench harness (driver contract): time every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced with a noop-datasource write — FULL execution of
the physical plan with no driver-side collect of payload data.
(.count() is wrong for this: Catalyst prunes everything under a global
aggregate — count of a 1-row agg is known without running it — and a
Generate cap over a big SortAggregate defeats the codegen cache, so
count() re-times compilation instead of execution.) Spark conf mirrors what a production job would
set: AQE on (runtime coalescing + skew-join), shuffle partitions sized
to the core count at this SF.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession  # noqa: E402

from cqlcopy_spark.plans.registry import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(sf_dir: str) -> float:
    # anchored decimal: the greedy [0-9.]+ captured trailing dots from
    # names like sf0.1.bak and float() then crashed the final print
    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("cqlcopy_spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM (codegen, parquet reader) and the Python worker
    # daemons so the first timed query doesn't absorb startup costs.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()

    def _identity(batches):
        yield from batches

    spark.range(64).repartition(CPUS).mapInPandas(_identity, "id long").count()

    queries = all_queries()

    def _force(df) -> None:
        # executes the COMPLETE plan on the executors, discards rows
        df.write.mode("overwrite").format("noop").save()

    # Per-query codegen/JIT warm-up at the smallest SF: the generated
    # code is a function of the plan shape, not the data size, so one
    # cheap sf0.001 execution compiles and JITs everything the sf run
    # will use. Measured timings then reflect steady-state marginal
    # cost — the quantity that extrapolates to cluster scale — instead
    # of first-compile overhead. Skipped when the warm dir IS the bench
    # dir (already covered by min-of-2).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(SF_DIR):
        for name in sorted(queries):
            try:
                _force(queries[name](spark, warm_dir))
            except Exception:
                pass  # the timed run will surface any real failure
        # drop every query's warm-up persist before timing starts — the
        # first timed query would otherwise run under the accumulated
        # cache pressure of the whole registry
        spark.catalog.clearCache()

    # Prior run's per-query map (newest BENCH_HISTORY row): queries that
    # MOVED >1.4× against it get one extra re-measure rep below. The
    # r06→r07 A/A run proved identical code swings ±34% run-to-run on
    # this host, so a single-shot delta is not evidence — the extra rep
    # kills mover-triage noise at ~no cost when nothing really moved.
    # Only a history row from the SAME (sf, cpus) configuration is a
    # valid mover baseline: after e.g. a one-off sf0.001 smoke run,
    # comparing the next sf0.1 run against it would flag ~every query
    # as a mover. Walk back to the newest matching row.
    prior: dict[str, float] = {}
    try:
        with open(os.path.join(_REPO, "BENCH_HISTORY.jsonl"), encoding="utf-8") as f:
            lines = [ln for ln in f if ln.strip()]
        for ln in reversed(lines):
            row = json.loads(ln)
            if row.get("sf") == _sf_from_dir(SF_DIR) and row.get("cpus") == CPUS:
                prior = row.get("queries", {}) or {}
                break
    except (OSError, json.JSONDecodeError):
        pass

    MOVER_RATIO = 1.4

    def _is_mover(name: str, best: float) -> bool:
        prev = prior.get(name)
        if not prev or prev <= 0 or best <= 0:
            return False
        r = best / prev
        return r > MOVER_RATIO or r < 1.0 / MOVER_RATIO

    timings: dict[str, float] = {}
    for name in sorted(queries):
        best = float("inf")
        # min-of-2, escalating to min-of-3 when the query is >1s (the
        # entries regression triage reads) OR when it still registers
        # as a >1.4× mover vs the previous recorded run.
        reps = 0
        while reps < 2 or (reps < 3 and (best > 1.0 or _is_mover(name, best))):
            t0 = time.perf_counter()
            _force(queries[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
            reps += 1
        timings[name] = round(best, 3)
        # several operators persist() intermediates their callers consume
        # lazily and so can't unpersist themselves; drop the caches here
        # or 109 queries x min-of-2 accumulate duplicates for the whole
        # session (persist cost is INSIDE each timed run either way)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    # BASELINE.md comparable: the reference's one published number is
    # ≥50k inserts/s; copy_roundtrip writes AND re-reads every lineitem
    # row, so rows/copy_roundtrip_sec is a conservative analogue.
    li_rows = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    base = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        # registry keeps growing round over round — compare
        # totals only after normalizing by n_queries (or
        # per-query, which is what the map is for)
        "n_queries": len(timings),
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        "copy_rows_per_sec": round(li_rows / timings["copy_roundtrip"]),
    }
    # The stdout line must stay short enough for the driver's capture:
    # at 164 queries the full map overran it and BENCH_r04/r05 recorded
    # "parsed": null with a truncated tail. stdout carries totals plus
    # the top-20 slowest (the entries regression triage actually reads);
    # the FULL map goes to BENCH_HISTORY.jsonl below.
    # r8 VERDICT item 8: a query measured for the FIRST time (no prior
    # history row at this config) that lands >3s is an outlier needing
    # an immediate plan audit — stream_minhash_incremental entered at
    # 6.1s and was only noticed in the verdict's top-5 sweep. Surface
    # them in the stdout line so the audit happens the round they land.
    base["new_query_outliers_over_3s"] = sorted(
        n for n, t in timings.items() if n not in prior and t > 3.0
    )
    top20 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    print(json.dumps({**base, "queries": top20, "queries_truncated_to": 20}))
    # Round-over-round history: every run's complete per-query map.
    try:
        with open(os.path.join(_REPO, "BENCH_HISTORY.jsonl"), "a", encoding="utf-8") as f:
            f.write(json.dumps({"ts": time.time(), **base, "queries": timings}) + "\n")
    except OSError:
        pass  # history is best-effort; the stdout contract is what matters
    spark.stop()


if __name__ == "__main__":
    main()
