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


def _checkpoint_query_id(checkpoint_dir: str) -> str:
    """Stable identity of a checkpoint lineage: the query id Structured
    Streaming writes to <checkpoint>/metadata at start (falls back to
    the checkpoint path before the file exists)."""
    import json

    meta = os.path.join(checkpoint_dir, "metadata")
    if os.path.isfile(meta):
        with open(meta, encoding="utf-8") as f:
            qid = json.load(f).get("id")
        if qid:
            return str(qid)
    return os.path.abspath(checkpoint_dir)


def _run_guard(state_dir: str, qid: str, on_new_run: str, sink: str) -> bool:
    """Enforce the cross-run contract shared by the versioned-state
    sinks: returns True when `qid` continues the recorded lineage. A
    DIFFERENT lineage either raises (on_new_run='error') or wipes the
    old v=* versions and returns False (on_new_run='restart') — merging
    across checkpoint lineages can double-count/misorder because batch
    ids restart and may slice the source differently."""
    import json
    import re
    import shutil

    marker = os.path.join(state_dir, "_run.json")
    if not os.path.isdir(state_dir) or not os.path.isfile(marker):
        return True
    with open(marker, encoding="utf-8") as f:
        prev_qid = json.load(f).get("query_id")
    if prev_qid is None or prev_qid == qid:
        return True
    if on_new_run == "error":
        raise ValueError(
            f"{sink}: state at {state_dir!r} belongs to checkpoint run "
            f"{prev_qid!r}, not {qid!r}. Merging across runs can double-count "
            "(batch ids restart and may slice the source differently). Reuse "
            "the original checkpoint, point at a fresh state_dir, or pass "
            "on_new_run='restart' to discard the old lineage and recompute."
        )
    for d in os.listdir(state_dir):
        if re.fullmatch(r"v=(\d+)", d):
            shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)
    return False


def _write_run_marker(state_dir: str, qid: str) -> None:
    import json

    with open(os.path.join(state_dir, "_run.json"), "w", encoding="utf-8") as f:
        json.dump({"query_id": qid}, f)


def _latest_version_below(state_dir: str, batch_id: int) -> "int | None":
    import re

    if not os.path.isdir(state_dir):
        return None
    versions = [
        int(m.group(1))
        for d in os.listdir(state_dir)
        if (m := re.fullmatch(r"v=(\d+)", d))
    ]
    below = [v for v in versions if v < batch_id]
    return max(below) if below else None


def continuous_agg_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    group_col: str,
    sum_expr: str,
    count_col: str = "n",
    sum_col: str = "total",
    on_new_run: str = "error",
) -> DataStreamWriter:
    """Continuous incremental maintenance of a grouped aggregate — the
    streaming twin of agg_incremental_merge: each micro-batch is
    aggregated to per-key partials (count + exact integer sum) and
    MERGED into a parquet state table via the partial-aggregate
    algebra, never a recompute over history.

    Exactly-once is scoped to SAME-CHECKPOINT recovery: within one
    checkpoint lineage, batch ids are stable and a replayed batch id
    carries the same rows, so writing batch b's merge to state_dir/v=<b>
    from the latest version strictly below b makes redelivery
    idempotent (a replay re-derives from the same predecessor and
    overwrites the same directory). Readers take max(v); the versions
    also give time travel over the aggregate's history.

    A DIFFERENT checkpoint against existing state is NOT generally safe:
    batch ids restart and the source may slice files differently, so
    merging new-run batch b onto old-run v<b state can double-count.
    The sink records the query id (from the checkpoint metadata) in
    state_dir/_run.json and, on a mismatch, applies `on_new_run`:
    "error" (default) refuses to touch the state; "restart" discards
    the old lineage and recomputes from scratch — correct only when the
    new run redelivers the FULL input (e.g. availableNow over the same
    directory). State size is grouped-key-bounded — the stream itself
    is never retained."""
    from pyspark.sql import functions as F

    if on_new_run not in ("error", "restart"):
        raise ValueError(f"on_new_run must be 'error' or 'restart', got {on_new_run!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        qid = _checkpoint_query_id(checkpoint_dir)
        same_run = _run_guard(state_dir, qid, on_new_run, "continuous_agg_sink")
        # sum_expr must be an EXACT-integer aggregate (e.g. a cents sum):
        # merge ≡ recompute only holds bitwise for mergeable exact sums
        delta = batch_df.groupBy(group_col).agg(
            F.count(F.lit(1)).alias(count_col),
            F.expr(sum_expr).alias(sum_col),
        )
        prev = None
        if same_run:
            v = _latest_version_below(state_dir, batch_id)
            if v is not None:
                prev = spark.read.parquet(os.path.join(state_dir, f"v={v}"))
        if prev is None:
            merged = delta
        else:
            b = prev.select(
                group_col,
                F.col(count_col).alias("_nb"),
                F.col(sum_col).alias("_sb"),
            )
            d = delta.select(
                group_col,
                F.col(count_col).alias("_nd"),
                F.col(sum_col).alias("_sd"),
            )
            merged = b.join(d, group_col, "full_outer").select(
                group_col,
                (
                    F.coalesce(F.col("_nb"), F.lit(0))
                    + F.coalesce(F.col("_nd"), F.lit(0))
                ).alias(count_col),
                (
                    F.coalesce(F.col("_sb"), F.lit(0))
                    + F.coalesce(F.col("_sd"), F.lit(0))
                ).alias(sum_col),
            )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )
        _write_run_marker(state_dir, qid)

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )


def read_agg_state(spark, state_dir: str) -> DataFrame:
    """Latest version of a continuous_agg_sink state table."""
    import re

    versions = [
        int(m.group(1))
        for d in os.listdir(state_dir)
        if (m := re.fullmatch(r"v=(\d+)", d))
    ]
    return spark.read.parquet(os.path.join(state_dir, f"v={max(versions)}"))


def continuous_cdc_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    on_new_run: str = "error",
) -> DataStreamWriter:
    """Continuous CDC materialization — the streaming twin of
    cdc_apply_changelog: each micro-batch of sequenced change rows
    (upserts + 'D' delete markers) merges into a keyed parquet snapshot
    by last-writer-wins on seq_col. Same versioned-state scheme as
    continuous_agg_sink: batch b merges onto the latest v<b and writes
    v=<b>, so a same-checkpoint replay re-derives from the same
    predecessor (exactly-once scoped to same-checkpoint recovery; the
    _run.json guard refuses or restarts on a foreign checkpoint).

    Delete markers are RETAINED in state as tombstones rather than
    dropped: a late change with seq below an applied delete must lose
    to it, which requires the delete's seq to still be present.
    Readers filter them (read_cdc_state); tombstone compaction is a
    retention policy over versions, exactly like any snapshot store.
    State size is keyspace-bounded (one row per live key + tombstone),
    never stream-length-bounded. Per batch: one window shuffle on the
    key over (batch ∪ prev-state) — what a lakehouse MERGE runs."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if on_new_run not in ("error", "restart"):
        raise ValueError(f"on_new_run must be 'error' or 'restart', got {on_new_run!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        qid = _checkpoint_query_id(checkpoint_dir)
        same_run = _run_guard(state_dir, qid, on_new_run, "continuous_cdc_sink")
        prev = None
        if same_run:
            v = _latest_version_below(state_dir, batch_id)
            if v is not None:
                prev = spark.read.parquet(os.path.join(state_dir, f"v={v}"))
        merged = batch_df if prev is None else prev.unionByName(batch_df)
        # Secondary op_col ASC tiebreak: the contract says seq is unique
        # per key (the batch twin guarantees it by construction), but if
        # a producer violates it the merge must still be deterministic
        # across runs/engines — 'D' < 'I' < 'U' in binary order, so at
        # equal seq the delete marker wins (the conservative resolution:
        # the tombstone survives and late lower-seq changes still lose).
        w = Window.partitionBy(key_col).orderBy(
            F.col(seq_col).desc(), F.col(op_col).asc()
        )
        latest = (
            merged.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        latest.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v={batch_id}")
        )
        _write_run_marker(state_dir, qid)

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )


def read_cdc_state(spark, state_dir: str, op_col: str = "op") -> DataFrame:
    """Latest live snapshot of a continuous_cdc_sink state table
    (tombstones filtered)."""
    from pyspark.sql import functions as F

    return read_agg_state(spark, state_dir).filter(F.col(op_col) != "D")


def continuous_topk_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    item_col: str,
    k: int = 16,
    on_new_run: str = "error",
) -> DataStreamWriter:
    """Continuous heavy-hitters maintenance — the streaming twin of
    sketch_heavy_hitters with each MICRO-BATCH playing the shard role:
    per batch, exact item counts reduce to the batch top-k plus the
    (k+1)-th count as the batch's drop threshold; the state accumulates
    est (sum of kept counts — a certain lower bound), present_thr
    (sum of thresholds of batches that kept the item) and the running
    total_thr, so any item's true count lies in
    [est, est + total_thr - present_thr] — the same SpaceSaving-merge
    containment the batch operator pins, maintained incrementally
    without ever re-scanning the stream.

    Same versioned-state scheme as continuous_agg_sink (batch b merges
    onto the latest v<b and writes v=b → same-checkpoint replays are
    idempotent; the _run.json guard refuses or restarts on a foreign
    checkpoint). State size is ≤ k new items per batch; a retention
    pass may drop items whose upper bound falls below the current
    top-N floor — a policy choice, exactly like tombstone compaction
    in the CDC sink. The per-batch reduce is one hash aggregate + a
    TakeOrdered(k+1): executor-side and shuffle-light at any rate."""
    from pyspark.sql import functions as F

    if on_new_run not in ("error", "restart"):
        raise ValueError(f"on_new_run must be 'error' or 'restart', got {on_new_run!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        qid = _checkpoint_query_id(checkpoint_dir)
        same_run = _run_guard(state_dir, qid, on_new_run, "continuous_topk_sink")
        prev = None
        old_total = 0
        if same_run:
            v = _latest_version_below(state_dir, batch_id)
            if v is not None:
                prev = spark.read.parquet(os.path.join(state_dir, f"v={v}"))
                head = prev.select("total_thr").head(1)
                old_total = head[0]["total_thr"] if head else 0

        c = batch_df.groupBy(F.col(item_col).alias("item")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        ranked = c.orderBy(F.col("cnt").desc(), F.col("item")).limit(k + 1)
        top = ranked.collect()  # ≤ k+1 rows — TakeOrdered, driver-tiny
        thr = int(top[k]["cnt"]) if len(top) > k else 0
        total = old_total + thr
        # rebuild from the collected head so the item dtype follows the
        # source column (string keys work as well as int keys)
        kept = spark.createDataFrame(top[:k], schema=ranked.schema)
        if prev is None:
            merged = kept.select(
                "item",
                F.col("cnt").alias("est"),
                F.lit(thr).cast("long").alias("present_thr"),
            )
        else:
            merged = (
                prev.select("item", "est", "present_thr")
                .join(kept, "item", "full_outer")
                .select(
                    "item",
                    (
                        F.coalesce(F.col("est"), F.lit(0))
                        + F.coalesce(F.col("cnt"), F.lit(0))
                    ).alias("est"),
                    (
                        F.coalesce(F.col("present_thr"), F.lit(0))
                        + F.when(F.col("cnt").isNotNull(), F.lit(thr)).otherwise(
                            F.lit(0)
                        )
                    ).alias("present_thr"),
                )
            )
        merged.withColumn("total_thr", F.lit(total).cast("long")).write.mode(
            "overwrite"
        ).parquet(os.path.join(state_dir, f"v={batch_id}"))
        _write_run_marker(state_dir, qid)

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )


def read_topk_state(spark, state_dir: str, top_n: int = 10) -> DataFrame:
    """Current heavy hitters from a continuous_topk_sink state: est /
    upper_bound / rank, mirroring sketch_heavy_hitters' output shape."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    s = read_agg_state(spark, state_dir)
    w = Window.orderBy(F.col("est").desc(), F.col("item"))
    return (
        s.select(
            "item",
            "est",
            (F.col("est") + F.col("total_thr") - F.col("present_thr")).alias(
                "upper_bound"
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .orderBy("rank")
    )


def compact_state_versions(state_dir: str, keep_last: int = 2) -> "list[int]":
    """Retention pass for the versioned-state sinks (continuous_agg /
    continuous_cdc / continuous_topk): each micro-batch writes a FULL
    snapshot under v=<batch_id>, so only the latest version is needed
    for correctness — older versions exist for same-checkpoint replay
    (batch b re-derives from the latest v<b) and operator debugging.
    Keeping the last `keep_last` versions preserves replay of the most
    recent batch while bounding disk at keep_last × state size.

    Returns the versions REMOVED. Safe to run between micro-batches or
    from a janitor job: writers never read versions older than the
    previous one. keep_last must be ≥ 2 — a same-checkpoint REPLAY of
    the latest batch re-derives from the version BELOW it
    (_latest_version_below), so keeping only the latest would make that
    replay silently restart the accumulation from the batch alone
    (review finding: the earlier ≥1 guard contradicted the sinks'
    replay contract)."""
    import re
    import shutil

    if keep_last < 2:
        raise ValueError(
            "keep_last must be >= 2: a replayed latest batch merges onto "
            "the version below it — with only one version kept, that "
            "replay would silently reset the accumulated state"
        )
    if not os.path.isdir(state_dir):
        return []
    versions = sorted(
        int(m.group(1))
        for d in os.listdir(state_dir)
        if (m := re.fullmatch(r"v=(\d+)", d))
    )
    drop = versions[:-keep_last]
    for v in drop:
        shutil.rmtree(os.path.join(state_dir, f"v={v}"), ignore_errors=True)
    return drop


def vacuum_masked_root(
    spark,
    data_root: str,
    mask_root: str,
    schema: str,
    key: str,
    layout_cols: "list[str]",
) -> int:
    """Generic offline version swap for a (data, mask) delta-log pair —
    the physical-pruning lever shared by the vector index
    (codes/tombstones) and the curation log (survivors/takedowns):
    rewrite data-ANTI-JOIN-mask as a new data compaction stamped
    strictly ABOVE every existing delta and compaction of EITHER root,
    then swap the mask to an empty compaction at the same version.
    Returns the number of data rows pruned.

    Contract (see vector_index_vacuum for the full argument, proven by
    similarity_index_vacuum_verify + tests):
    - readers at/above the stamp see pruned data + an empty mask — the
      data scan stops carrying dead rows and the per-read mask
      anti-join's build side stops growing with lifetime retirements;
    - RAW deltas of both roots are RETAINED as replay truth
      (out-of-order same-checkpoint replays read compactions ≤
      themselves and fall back to deltas) and as provenance;
    - the caller owns the horizon claim: pruning the mask removes it
      from any writer-side first-delivery guard, so nothing retired
      before the vacuum may ever be re-delivered (a producer that
      breaks the claim is still caught by raw-delta provenance);
    - post-vacuum writers must continue strictly above the stamp
      (_below_floor_guard turns violations into errors);
    - crash-safe and idempotent: the data swap is _SUCCESS-gated and
      lands before the mask swap, so a crash between the two leaves a
      consistent merely-unvacuumed-mask state that a re-run completes;
      a re-run over a clean state is a no-op fast path.

    Streaming-checkpoint caveat: Structured Streaming batch ids are
    checkpoint-owned and resume at small values, so RESUMING the same
    checkpoint after a vacuum stamped above them would write
    reader-invisible deltas — every writer's _below_floor_guard turns
    that into a loud error instead of silent loss. Supported
    compositions: vacuum after the checkpoint retires, or continue
    ingest through the batch kernels with explicit ids above the
    stamp. The production lever for live pipelines is a persisted log
    epoch (effective id = batch id + offset bumped at vacuum time) —
    a table-format-style version counter decoupled from the
    checkpoint — not implemented here."""
    return vacuum_masked_roots(
        spark, [(data_root, schema, [key], layout_cols)], mask_root, key
    )


def vacuum_masked_roots(
    spark,
    data_specs: "list[tuple]",
    mask_root: str,
    mask_key: str,
    extra_id_roots: "tuple[str, ...]" = (),
) -> int:
    """The multi-root generalization of vacuum_masked_root (same
    contract, see there): `data_specs` is a list of
    (root, schema, mask_cols, layout_cols) — each data root is pruned
    of rows whose ANY mask_cols column matches a retired `mask_key`,
    covering both id-keyed roots (mask_cols = [key]) and relation roots
    carrying the key in several columns (the minhash PAIR report:
    mask_cols = [new_doc, dup_of]). Every data root's new version lands
    BEFORE the single mask swap — a crash mid-way leaves some roots
    pruned at a lower version and the mask intact, and the re-run
    restamps everything above it (wasteful, never wrong).

    r16 job-count optimization (guide §1.4/§2.6): the pruned-row counts
    come from parquet FOOTER row counts, driver-side (rows under the
    input path set minus rows under the written compaction — num_rows
    is mandatory footer metadata, always exact; zero extra Spark jobs,
    where the previous shape paid 1-2 dedicated count jobs per root —
    and no Observation/CollectMetrics node, which the optimizer may
    prune with the whole subtree on an empty root), the fast path is
    `mask.isEmpty()` alone (an empty mask prunes nothing by
    construction, so the old `n_pruned == 0 and mask.isEmpty()` test is
    equivalent), and the independent per-root rewrites run concurrently
    from a small thread pool — actions are only sequential when the
    driver calls them sequentially, and the roots share no state. The
    mask swap still lands strictly LAST, after every root's write has
    joined."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    if not os.path.isdir(mask_root):
        return 0  # nothing retired — nothing to prune
    everything = _delta_ids(mask_root, 1 << 62) + _compact_versions(mask_root)
    for spec in data_specs:
        root = spec[0]
        everything += _delta_ids(root, 1 << 62) + _compact_versions(root)
    # roots whose DELTAS feed a virtual data view (the curation
    # survivors derive from the ths deltas — r17 single-write layout):
    # the stamp must clear their ids too, or a delta at/above the stamp
    # would be double-counted (inside the compaction AND the tail scan)
    for root in extra_id_roots:
        everything += _delta_ids(root, 1 << 62)
    if not everything:
        return 0
    vid = 1 + max(everything)
    if _parquet_dir_rows(_index_delta_paths(mask_root, 1 << 62)) == 0:
        # an empty mask prunes nothing and needs no swap — the state
        # right after a completed vacuum. Without this fast path a
        # re-run rewrote the whole corpus as a fresh version for
        # nothing. A crash BETWEEN the swaps leaves mask rows still
        # visible, which falls through and completes the vacuum (the
        # crash-retry contract). Emptiness is answered DRIVER-SIDE from
        # the parquet footer row counts of the exact file set the mask
        # read resolves (r16, guide §6) — the former mask.isEmpty()
        # paid a Spark job for the same bit.
        return 0
    mask = _read_index_deltas(spark, mask_root, 1 << 62, f"{mask_key} long")

    def _rewrite_root(spec) -> int:
        # a 5-tuple carries a `source` callable -> (rows_in, view) for
        # roots whose data view is VIRTUAL (compactions under `root`,
        # deltas resolved elsewhere — the curation survivors, the
        # minhash bands); the 4-tuple default reads the root's own
        # compact+delta file set
        if len(spec) == 5:
            root, schema, mask_cols, layout_cols, source = spec
            rows_in, view = source()
        else:
            root, schema, mask_cols, layout_cols = spec
            in_paths = _index_delta_paths(root, 1 << 62)
            # count BEFORE the write: the post-write cleanup removes the
            # superseded compaction this path set may include
            rows_in = _parquet_dir_rows(in_paths)
            view = (
                spark.read.schema(schema).parquet(*in_paths)
                if in_paths
                else spark.createDataFrame([], schema)
            )
        for c in mask_cols:
            view = view.join(
                mask.withColumnRenamed(mask_key, c), c, "left_anti"
            )
        out_path = os.path.join(root, "compact", f"v={vid}")
        (
            view.repartition(*layout_cols)
            .sortWithinPartitions(*layout_cols)
            .write.mode("overwrite")
            .parquet(out_path)
        )
        for v in _compact_versions(root):
            if v < vid:
                shutil.rmtree(
                    os.path.join(root, "compact", f"v={v}"), ignore_errors=True
                )
        # the anti-join is row-preserving on the keep side, so footer
        # accounting (inputs minus written compaction) IS the prune count
        return rows_in - _parquet_dir_rows([out_path])

    with ThreadPoolExecutor(max_workers=min(3, len(data_specs))) as pool:
        n_pruned = sum(pool.map(_rewrite_root, data_specs))
    # mask swap LAST: an empty compaction at the same version — every
    # pre-vacuum mask row is already reflected in the pruned data
    # versions, so readers at/above vid need none of them. Written
    # DRIVER-SIDE with pyarrow (r16, guide §1.4): a zero-row parquet
    # file is pure metadata, and the former Spark write paid a whole
    # job for it. Crash discipline identical to the committer's:
    # _SUCCESS lands last, and _compact_versions ignores markerless
    # dirs, so a torn write is invisible and the retry overwrites.
    # Readers force the schema (`spark.read.schema(...)`), so the
    # int64 column matches the `{mask_key} long` contract exactly.
    import pyarrow as pa
    import pyarrow.parquet as pq

    swap_dir = os.path.join(mask_root, "compact", f"v={vid}")
    shutil.rmtree(swap_dir, ignore_errors=True)
    os.makedirs(swap_dir)
    pq.write_table(
        pa.table({mask_key: pa.array([], type=pa.int64())}),
        os.path.join(swap_dir, "part-00000.parquet"),
    )
    with open(os.path.join(swap_dir, "_SUCCESS"), "w", encoding="utf-8"):
        pass
    for v in _compact_versions(mask_root):
        if v < vid:
            shutil.rmtree(
                os.path.join(mask_root, "compact", f"v={v}"), ignore_errors=True
            )
    return n_pruned


def curation_vacuum(spark, state_dir: str, bump_epoch: bool = False) -> int:
    """Physically prune taken-down survivor rows AND their takedown
    masks from a curation state — vacuum_masked_root applied to the
    (survivors, takedowns) pair. Reader-view invariance, idempotence
    and the retained-raw-delta replay truth are pinned in
    tests/test_curation_takedown.py; driver-checked directly by
    stream_curation_vacuum (operators/text.py) and by the vector
    index's similarity_index_vacuum_verify (identical code path).

    bump_epoch=True additionally raises the state dir's persisted log
    epoch to the vacuum stamp (bump_log_epoch — covering the ths root
    too, so every kernel under this dir stays monotone), which lets the
    SAME checkpoint resume ingest afterwards; the default keeps the
    no-epoch behavior (a resumed checkpoint fails loudly at
    _below_floor_guard). Quiescence contract: see bump_log_epoch.

    r17 single-write layout: the survivor view is VIRTUAL (vacuum
    compactions under survivors/ + the raw admitted-row ths deltas
    above the floor — _survivor_frame), so the data spec carries a
    source callable and the stamp derivation clears the ths delta ids;
    the compaction this writes is a plain (doc_id, shard, n_tokens)
    parquet dir, exactly the pre-r17 shape."""

    def _survivor_source():
        compact, deltas = _survivor_sources(state_dir, 1 << 62)
        return (
            _parquet_dir_rows(compact + deltas),
            _survivor_frame(spark, state_dir, 1 << 62),
        )

    n = vacuum_masked_roots(
        spark,
        [
            (
                os.path.join(state_dir, "survivors"),
                _SURVIVOR_SCHEMA,
                ["doc_id"],
                ["doc_id"],
                _survivor_source,
            )
        ],
        os.path.join(state_dir, "takedowns"),
        "doc_id",
        extra_id_roots=(os.path.join(state_dir, "ths"),),
    )
    if bump_epoch:
        bump_log_epoch(
            state_dir,
            [
                os.path.join(state_dir, sub)
                for sub in ("survivors", "takedowns", "ths")
            ],
        )
    return n


def compact_cdc_tombstones(
    spark,
    state_dir: str,
    min_live_seq: int,
    op_col: str = "op",
    seq_col: str = "seq",
) -> int:
    """Tombstone retention for continuous_cdc_sink state: a delete
    marker only needs to survive while a LATE change with a lower seq
    could still arrive — once the producer guarantees nothing below
    `min_live_seq` will ever be sent (its low-watermark), tombstones
    below it are dead weight. Rewrites the LATEST version in place with
    those tombstones dropped (live rows are never touched) and returns
    the number removed. The caller owns the watermark claim — exactly
    the contract of a lakehouse VACUUM horizon."""
    import re

    from pyspark.sql import functions as F

    versions = [
        int(m.group(1))
        for d in (os.listdir(state_dir) if os.path.isdir(state_dir) else [])
        if (m := re.fullmatch(r"v=(\d+)", d))
    ]
    if not versions:
        return 0
    latest = os.path.join(state_dir, f"v={max(versions)}")
    s = spark.read.parquet(latest)
    dead = (F.col(op_col) == "D") & (F.col(seq_col) < min_live_seq)
    n_dead = s.filter(dead).count()
    if n_dead:
        import shutil

        kept = s.filter(~dead)
        tmp = latest + ".compact"
        shutil.rmtree(tmp, ignore_errors=True)
        kept.write.mode("overwrite").parquet(tmp)
        # directory-rename swap, NOT overwrite-in-place: overwrite
        # deletes the live snapshot before the rewrite lands, so a
        # crash mid-job would leave v=<max> empty/partial (review
        # finding). Renames are atomic per step; the only crash window
        # leaves .old intact for manual recovery.
        old = latest + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(latest, old)
        os.rename(tmp, latest)
        shutil.rmtree(old, ignore_errors=True)
    return n_dead


def continuous_quantile_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    k: int = 64,
    on_new_run: str = "error",
) -> DataStreamWriter:
    """Continuous mergeable-quantile maintenance — the streaming twin of
    sketch_quantiles_merge with an EXPLICIT error ledger: each
    micro-batch reduces to a k-point weighted rank summary (exact rank
    statistics, weights sum to the batch count), the union with the
    state summary is recompressed back to k points, and every
    recompression's worst-case rank slippage (union_weight // k, the
    gap a kept point can absorb) is ADDED to a persisted err_bound —
    so the reader reports quantiles with a bound that is true by
    construction after any number of batches, instead of the fixed
    N/k + S bound the one-shot batch operator earns. State is k rows +
    one ledger row regardless of stream length; same versioned-state
    replay-idempotence and run guard as the other sinks. Per batch the
    raw data passes ONE sort-free reduce (exact ranks need a sort of
    the BATCH only, never history)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if on_new_run not in ("error", "restart"):
        raise ValueError(f"on_new_run must be 'error' or 'restart', got {on_new_run!r}")

    def summarize(df, w_col: str, total: int):
        """k-point weighted summary of (value, weight) rows: cumulative
        weights W_i in (value, weight) order over a ROWS frame; keep the
        rows where floor(W_i·k/W) increases (always keeps the last),
        weight of a kept row = covered cumulative span. Exact: weights
        sum to W (= `total`, known by the caller — no extra scan)."""
        # global-order reduce: the summary NEEDS a total order, but it
        # runs over state(k rows) ∪ batch — at high-rate streams shard
        # the batch first (the batch operator's pmod design) and union
        # the shard summaries before this recompression, paying one
        # extra ledger term. The ROWS frame gives every row a DISTINCT
        # cumulative weight even in a duplicate-value run, so a bucket
        # boundary inside the run is detected by exactly one row (a
        # RANGE frame shares _cw across ties and can drop whole runs,
        # violating the err ledger). Ordering by (value, weight) makes
        # the partial-sum sequence deterministic under ties: rows equal
        # on both columns are identical tuples, hence interchangeable.
        wspec = Window.orderBy("value", w_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        d = df.filter(F.col(w_col) > 0).withColumn("_cw", F.sum(w_col).over(wspec))
        d = d.withColumn(
            "_bucket", F.expr(f"_cw * {k} DIV {total}")
        ).withColumn(
            "_prev_bucket", F.expr(f"(_cw - {w_col}) * {k} DIV {total}")
        )
        kept = d.filter(
            (F.col("_bucket") > F.col("_prev_bucket")) | (F.col("_cw") == F.lit(total))
        )
        wl = Window.orderBy("_cw")
        return kept.select(
            "value",
            (F.col("_cw") - F.coalesce(F.lag("_cw").over(wl), F.lit(0))).alias(
                "weight"
            ),
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        qid = _checkpoint_query_id(checkpoint_dir)
        same_run = _run_guard(state_dir, qid, on_new_run, "continuous_quantile_sink")
        prev = None
        prev_err = 0
        prev_total = 0
        if same_run:
            v = _latest_version_below(state_dir, batch_id)
            if v is not None:
                prev = spark.read.parquet(os.path.join(state_dir, f"v={v}"))
                head = prev.select("err_bound", "total_w").head(1)
                if head:
                    prev_err = head[0]["err_bound"]
                    prev_total = head[0]["total_w"]

        batch_vals = batch_df.select(F.col(value_col).alias("value")).withColumn(
            "weight", F.lit(1).cast("long")
        )
        n_batch = batch_vals.count()
        if n_batch == 0:
            # identity batch: carry state forward; with NO prior state
            # write an empty-but-schema'd summary so the first-ever
            # batch being empty doesn't crash the recompression below
            # (review finding: total_w would be None).
            out = (
                prev
                if prev is not None
                else batch_vals.withColumn(
                    "err_bound", F.lit(0).cast("long")
                ).withColumn("total_w", F.lit(0).cast("long"))
            )
            out.write.mode("overwrite").parquet(
                os.path.join(state_dir, f"v={batch_id}")
            )
            _write_run_marker(state_dir, qid)
            return
        # batch summary: exact ranks over the batch only (err 0), then
        # union with state and recompress (err += union_weight DIV k).
        # total_w needs NO scan: prior state persists it, the batch was
        # just counted.
        merged = batch_vals
        if prev is not None:
            merged = prev.select("value", "weight").unionByName(batch_vals)
        total_w = prev_total + n_batch
        summary = summarize(merged, "weight", total_w)
        err = prev_err + total_w // k
        summary.withColumn("err_bound", F.lit(err).cast("long")).withColumn(
            "total_w", F.lit(total_w).cast("long")
        ).write.mode("overwrite").parquet(os.path.join(state_dir, f"v={batch_id}"))
        _write_run_marker(state_dir, qid)

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )


def read_quantile_state(spark, state_dir: str, ps=(0.5, 0.9, 0.99)) -> DataFrame:
    """Quantile estimates + the accumulated rank-error bound from a
    continuous_quantile_sink state."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    s = read_agg_state(spark, state_dir)
    w = Window.orderBy("value")
    d = s.withColumn("_cw", F.sum("weight").over(w))
    picks = [
        F.min(
            F.when(
                F.col("_cw") >= F.ceil(F.lit(float(p)) * F.col("total_w")),
                F.col("value"),
            )
        ).alias(f"p{int(p * 100)}")
        for p in ps
    ]
    return d.agg(
        F.coalesce(F.max("total_w"), F.lit(0)).alias("n"),
        *picks,
        F.coalesce(F.max("err_bound"), F.lit(0)).alias("rank_err_bound"),
    )


def _delta_ids(root: str, below_batch: int) -> list[int]:
    import re

    if not os.path.isdir(root):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(root)
        if (m := re.fullmatch(r"delta=(\d+)", d)) and int(m.group(1)) < below_batch
    )


def _compact_versions(root: str) -> list[int]:
    """COMPLETE compaction versions under root/compact (``v=<b>`` dirs
    with a _SUCCESS marker — a crash mid-compaction leaves no marker
    and the partial dir is ignored, then overwritten on retry)."""
    import re

    croot = os.path.join(root, "compact")
    if not os.path.isdir(croot):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(croot)
        if (m := re.fullmatch(r"v=(\d+)", d))
        and os.path.exists(os.path.join(croot, d, "_SUCCESS"))
    )


def _below_floor_guard(
    root: str, batch_id: int, what: str, replay_root: "str | None" = None
) -> None:
    """Refuse a FIRST-TIME write whose batch id sits below the root's
    newest compaction version: every reader resolves state as (newest
    compaction ≤ reader) + (deltas ≥ that version), so such a delta
    would be invisible to every current reader — silently lost data.
    This state can only arise from a non-monotone log: an out-of-band
    writer numbering below a compaction or vacuum stamp (a vacuum stamps
    strictly above every existing id, so post-vacuum writers must
    continue above it). A REPLAY of the same batch id is legitimate and
    passes: its delta dir already exists (replays rewrite identical
    content — the idempotence contract — and out-of-order replays below
    a later batch's compaction are exactly what the retained raw deltas
    are for). `replay_root` names the root whose DELTA dirs witness a
    replay when it differs from the floor's root — the curation
    survivor view keeps its vacuum floor under survivors/ while its
    deltas live under ths/ (r17 single-write layout)."""
    vs = _compact_versions(root)
    if (
        vs
        and batch_id < vs[-1]
        and not os.path.isdir(
            os.path.join(replay_root or root, f"delta={batch_id}")
        )
    ):
        raise ValueError(
            f"{what}: batch_id {batch_id} is below this index root's "
            f"compaction floor v={vs[-1]} and is not a replay (no "
            f"existing delta={batch_id}) — the write would be invisible "
            "to every reader. Writers must use monotone batch ids; "
            "after a vacuum, continue strictly above the vacuum version."
        )


_EPOCH_FILE = "_log_epoch"


def log_epoch(state_dir: str) -> int:
    """Persisted log-epoch offset of a state dir — 0 until a vacuum
    bumps it (bump_log_epoch). Every batch kernel writing under this
    state dir maps its checkpoint-owned batch id to
    ``effective id = batch id + epoch`` (_apply_epoch), which is what
    lets the SAME Structured Streaming checkpoint resume after a vacuum
    stamped above its small restart ids: the offset lifts every future
    write above the vacuum version, exactly a table-format version
    counter decoupled from the checkpoint (the lever the
    vacuum_masked_root docstring names).

    A malformed file raises rather than silently reading 0 — an
    under-numbered effective id is the reader-invisible-delta silent
    loss the _below_floor_guard exists to prevent."""
    p = os.path.join(state_dir, _EPOCH_FILE)
    try:
        with open(p, encoding="utf-8") as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def _apply_epoch(state_dir: str, batch_id: int) -> int:
    return batch_id + log_epoch(state_dir)


def _clear_log_epoch(state_dir: str) -> None:
    """Remove the epoch file — part of every sink's 'restart' wipe: the
    epoch exists to keep effective ids above the wiped state's vacuum
    stamps, and a fresh lineage over an empty state has none."""
    try:
        os.remove(os.path.join(state_dir, _EPOCH_FILE))
    except FileNotFoundError:
        pass


def bump_log_epoch(state_dir: str, roots: "list[str]") -> int:
    """Raise the state dir's log epoch to sit at/above every existing
    delta id and compaction version across `roots` — called by a vacuum
    (with bump_epoch=True) so a LIVE pipeline's checkpoint can resume
    afterwards: the next batch 0 maps to the vacuum stamp itself (the
    newest compaction version — a reader at that id sees exactly the
    vacuumed state), later batches strictly above it, and no effective
    id ever collides with an existing delta (existing ids contribute
    id+1 to the stamp).

    Monotone and idempotent: never decreases, re-running after a
    completed vacuum recomputes the same value. Atomic temp-name +
    os.replace write — a crash before the replace leaves the old epoch,
    and resuming the checkpoint then fails LOUDLY at _below_floor_guard
    (recoverable: re-run the vacuum with bump_epoch=True; the no-op
    fast path still re-bumps).

    Quiescence contract (caller-owned, same as any table-format
    compaction vs concurrent writers): bump only against a CLEANLY
    STOPPED stream. If the checkpoint has an uncommitted in-flight
    batch, its post-bump replay maps to a fresh effective id and
    re-derives against the VACUUMED state — rows of that batch that the
    vacuum pruned are no longer in the first-delivery guard and would
    re-land, a resurrection the raw-delta provenance check flags but
    the reader cannot (the horizon claim)."""
    stamp = 0
    for r in roots:
        stamp = max(
            [stamp]
            + [i + 1 for i in _delta_ids(r, 1 << 62)]
            + _compact_versions(r)
        )
    new = max(stamp, log_epoch(state_dir))
    if new != log_epoch(state_dir):
        os.makedirs(state_dir, exist_ok=True)
        tmp = os.path.join(state_dir, _EPOCH_FILE + ".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(str(new))
        os.replace(tmp, os.path.join(state_dir, _EPOCH_FILE))
    return new


_COMPACT_EVERY = 4  # compact once this many deltas accumulate below a batch


def _maybe_compact_index(
    spark, root: str, batch_id: int, schema: str, layout_cols: list[str]
) -> None:
    """Compact the index deltas strictly below batch_id into ONE
    ``compact/v=<batch_id>`` dir, hash-clustered and sorted on
    layout_cols (r8 VERDICT item 2: the band probe must stop rescanning
    every delta — at thousands of production batches the per-batch
    probe's file count was ∝ corpus, the exact 'production replaces
    with a bucketed table probe' debt the docstring carried).

    INCREMENTAL: each compaction merges the PREVIOUS compact version
    with only the tail deltas since it (never re-reading all raw
    deltas — a cumulative re-read would be O(batches²) total I/O), and
    fires only when _COMPACT_EVERY tail deltas have accumulated SINCE
    the newest compaction, so between fires a batch does no compaction
    work at all. Superseded compact versions are deleted after the new
    one lands (disk = raw deltas + ONE compact copy, not a copy per
    fire). Write amplification is one corpus rewrite per
    _COMPACT_EVERY batches — the standard compaction trade; a
    production deployment layers size-tiered levels on the same
    contract.

    Deltas stay on disk as the source of truth: a batch can replay OUT
    OF ORDER after later batches ran (the sink contract — see
    test_minhash_apply_batch_replay_is_idempotent, which replays the
    middle batch), and such a replay needs exactly the deltas below
    ITSELF; _read_index only consults a compact version ≤ the reading
    batch, falling back to raw deltas, so compaction — and the
    deletion of superseded compact versions — can never change what
    any batch sees. Idempotent: a replay of the trigger batch finds
    its complete v=<batch_id> and skips; a crash mid-write leaves no
    _SUCCESS and the retry overwrites. At cluster scale the compact
    dir becomes a metastore bucketed table (bucketBy(layout_cols)) so
    the probe join also skips the corpus-side shuffle; the sorted
    parquet layout here is the same data arrangement without the
    single-session metastore dependency."""
    import shutil

    ids = _delta_ids(root, batch_id)
    vs = _compact_versions(root)
    if vs and vs[-1] >= batch_id:
        return  # this batch's (or a later) compaction already complete
    floor = vs[-1] if vs else 0
    tail = [i for i in ids if i >= floor]
    if len(tail) < _COMPACT_EVERY:
        return
    paths = [os.path.join(root, "compact", f"v={floor}")] if vs else []
    paths += [os.path.join(root, f"delta={i}") for i in tail]
    (
        spark.read.schema(schema)
        .parquet(*paths)
        .repartition(*layout_cols)
        .sortWithinPartitions(*layout_cols)
        .write.mode("overwrite")
        .parquet(os.path.join(root, "compact", f"v={batch_id}"))
    )
    # superseded versions: readers at-or-above batch_id use the new one,
    # readers below it fall back to the retained raw deltas either way
    for v in vs:
        shutil.rmtree(os.path.join(root, "compact", f"v={v}"), ignore_errors=True)


_HASHES_DELTA_SCHEMA = "doc_id long, hashes array<long>, sig array<long>"
_BAND_SCHEMA = "doc_id long, band int, key string"


def _band_sources(
    state_dir: str, below_batch: int
) -> "tuple[list[str], list[str]]":
    """(band-compaction paths, raw hashes-delta paths) a band reader at
    `below_batch` resolves under the r17 single-write layout: the
    newest COMPLETE (band, key)-clustered compaction v ≤ below_batch
    under bands/ plus the raw hashes deltas in [v, below_batch), whose
    band rows are DERIVED from the persisted sig column (_band_frame).
    One delta write per batch serves the signature index, the refine
    reads and the band probe; the clustered compaction — the shape a
    production probe buckets on — still materializes real band rows at
    the _COMPACT_EVERY cadence."""
    bands_root = os.path.join(state_dir, "bands")
    usable = [v for v in _compact_versions(bands_root) if v <= below_batch]
    floor = usable[-1] if usable else 0
    compact = (
        [os.path.join(bands_root, "compact", f"v={floor}")] if usable else []
    )
    h_root = os.path.join(state_dir, "hashes")
    deltas = [
        os.path.join(h_root, f"delta={i}")
        for i in _delta_ids(h_root, below_batch)
        if i >= floor
    ]
    return compact, deltas


def _band_frame(spark, state_dir: str, below_batch: int) -> DataFrame:
    """The cumulative (doc_id, band, key) index strictly below
    `below_batch`: the newest clustered compaction union the band rows
    derived from the raw hashes-delta tail — the LITERAL _band_rows
    expression over the persisted sig, so the derived rows are bitwise
    the rows the pre-r17 bands delta write materialized."""
    from cqlcopy_spark.operators.dedup import _band_rows

    compact, deltas = _band_sources(state_dir, below_batch)
    parts = []
    if compact:
        parts.append(spark.read.schema(_BAND_SCHEMA).parquet(*compact))
    if deltas:
        parts.append(
            _band_rows(
                spark.read.schema(_HASHES_DELTA_SCHEMA).parquet(*deltas)
            )
        )
    if not parts:
        return spark.createDataFrame([], _BAND_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _maybe_compact_bands(spark, state_dir: str, batch_id: int) -> None:
    """_maybe_compact_index for the VIRTUAL bands root: same trigger
    (≥ _COMPACT_EVERY tail deltas since the newest compaction, measured
    on the hashes deltas — the band deltas of the r17 layout), same
    incremental merge (previous compaction + derived tail only), same
    (band, key)-clustered output and superseded-version cleanup, same
    idempotence (a replay of the trigger batch finds its complete
    v=<batch_id> and skips; a crash leaves no _SUCCESS)."""
    import shutil

    bands_root = os.path.join(state_dir, "bands")
    ids = _delta_ids(os.path.join(state_dir, "hashes"), batch_id)
    vs = _compact_versions(bands_root)
    if vs and vs[-1] >= batch_id:
        return  # this batch's (or a later) compaction already complete
    floor = vs[-1] if vs else 0
    tail = [i for i in ids if i >= floor]
    if len(tail) < _COMPACT_EVERY:
        return
    (
        _band_frame(spark, state_dir, batch_id)
        .repartition("band", "key")
        .sortWithinPartitions("band", "key")
        .write.mode("overwrite")
        .parquet(os.path.join(bands_root, "compact", f"v={batch_id}"))
    )
    for v in vs:
        shutil.rmtree(
            os.path.join(bands_root, "compact", f"v={v}"), ignore_errors=True
        )


def _index_delta_paths(root: str, below_batch: int) -> "list[str]":
    """The exact directory set _read_index_deltas resolves: the newest
    COMPLETE compaction v ≤ below_batch plus the raw deltas in
    [v, below_batch). Factored so footer-level accounting
    (_parquet_dir_rows) counts the same files the frame reads."""
    usable = [v for v in _compact_versions(root) if v <= below_batch]
    paths = []
    floor = 0
    if usable:
        floor = usable[-1]
        paths.append(os.path.join(root, "compact", f"v={floor}"))
    paths += [
        os.path.join(root, f"delta={i}")
        for i in _delta_ids(root, below_batch)
        if i >= floor
    ]
    return paths


def _parquet_dir_rows(paths: "list[str]") -> int:
    """Exact total row count of the parquet part-files under `paths`
    (each a delta/compaction directory), read DRIVER-SIDE from the
    footers — `num_rows` is mandatory parquet metadata, not optional
    column statistics, so this is always exact and costs no Spark job
    (guide §1.4/§6: let metadata answer what metadata can)."""
    import pyarrow.parquet as pq

    n = 0
    for p in paths:
        for f in os.listdir(p):
            if f.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
    return n


def _read_index_deltas(
    spark, root: str, below_batch: int, schema: str
) -> DataFrame:
    """Index state strictly below below_batch: the newest COMPLETE
    compaction v ≤ below_batch (covering every delta < v) plus the raw
    deltas in [v, below_batch) — or all raw deltas when no usable
    compaction exists (empty frame with `schema` when none at all).
    Reading strictly BELOW the current batch id is what makes a
    replayed batch re-derive from the same corpus state it saw the
    first time; ignoring compactions NEWER than the reader keeps
    out-of-order replays correct (a middle batch replayed after later
    batches must not see a compact table that includes itself)."""
    paths = _index_delta_paths(root, below_batch)
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def minhash_apply_batch(
    batch_df: DataFrame, batch_id: int, state_dir: str
) -> None:
    """One micro-batch of the incremental MinHash-LSH dedup: the kernel
    of continuous_minhash_dedup_sink, exposed for direct replay tests.

    Per batch (all sizes ∝ batch, never ∝ corpus, except the corpus-
    index scan that production replaces with a bucketed table probe):

    1. signature + banded LSH rows for the arriving docs (the SAME
       _band_rows / _with_minhash_sig contract as dedup_fuzzy_minhash —
       a drifted banding would silently miss cross-batch candidates);
    2. candidate pairs = new band rows ⋈ (prior-corpus ∪ batch) band
       rows on (band, key). Each pair is emitted exactly ONCE, by the
       LATER-arriving side: in-batch pairs keep the smaller doc_id on
       the corpus side, and a corpus row only pairs with a new row
       regardless of id order (a doc arriving after a larger-id corpus
       doc still finds it);
    3. exact-Jaccard refine over the persisted gram-hash arrays
       (_minhash_verify_pairs — same refine rule as the batch op);
    4. append-only state writes, all keyed by batch_id with overwrite
       semantics so an at-least-once replay REWRITES rather than
       duplicates: hashes/delta=<b> carrying (doc_id, hashes, sig) —
       the signature column makes the delta self-describing, so the
       BAND rows of the tail deltas are DERIVED at read time
       (_band_frame: the literal _band_rows expression over sig) and
       the per-batch bands/delta write is gone (r17, guide §1.4: it
       duplicated a deterministic projection of the same rows as a
       second Spark action per micro-batch). bands/ holds only the
       (band, key)-clustered COMPACTIONS (_maybe_compact_bands), which
       is what makes the production probe a bucketed-table lookup —
       the derived tail is ≤ _COMPACT_EVERY-1 batch-sized explodes.
       pairs/delta=<b> is this batch's near-dup report — the streaming
       twin of dedup_incremental's output.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col

    from cqlcopy_spark.operators.dedup import (
        _band_rows,
        _minhash_verify_pairs,
        _with_minhash_sig,
    )

    spark = batch_df.sparkSession
    # effective id = batch id + persisted log epoch (0 until a vacuum
    # bumps it) — lets the same checkpoint resume after a vacuum
    batch_id = _apply_epoch(state_dir, batch_id)
    # refuse first-time writes below a compaction stamp on any of the
    # three roots (reader-invisible — silent loss); replays pass. The
    # bands root keeps its floor under bands/ while its deltas are the
    # hashes deltas (r17 single-write layout), so its replay witness is
    # the hashes delta dir.
    hashes_root = os.path.join(state_dir, "hashes")
    for sub in ("hashes", "pairs"):
        _below_floor_guard(
            os.path.join(state_dir, sub), batch_id, f"minhash_apply_batch[{sub}]"
        )
    _below_floor_guard(
        os.path.join(state_dir, "bands"),
        batch_id,
        "minhash_apply_batch[bands]",
        replay_root=hashes_root,
    )
    # compact BEFORE probing (r8 VERDICT item 2): once _COMPACT_EVERY
    # deltas sit below this batch, fold them into one (band, key)-
    # clustered dir so the probe (and the refine's hashes read) stop
    # rescanning a file set that grows with every batch — see
    # _maybe_compact_index for the out-of-order-replay safety argument.
    _maybe_compact_bands(spark, state_dir, batch_id)
    _maybe_compact_index(
        spark,
        hashes_root,
        batch_id,
        "doc_id long, hashes array<long>",
        ["doc_id"],
    )
    prev_bands = _band_frame(spark, state_dir, batch_id)
    prev_hashes = _read_index_deltas(
        spark,
        hashes_root,
        batch_id,
        "doc_id long, hashes array<long>",
    )
    # takedown masking (armed only when the state carries takedowns —
    # a takedown-free state keeps the original plan byte for byte):
    # retired docs leave the PROBE side, so later arrivals never pair
    # with retired content, and `guard_ids` below keeps their ids out
    # forever (tombstones-win-forever, the vector index's rule)
    guard_ids = prev_hashes.select("doc_id")
    if os.path.isdir(os.path.join(state_dir, "takedowns")):
        td = _minhash_takedowns(spark, state_dir, batch_id)
        prev_bands = prev_bands.join(td, "doc_id", "left_anti")
        prev_hashes = prev_hashes.join(td, "doc_id", "left_anti")
        guard_ids = guard_ids.unionByName(td)
    # FIRST-DELIVERY-WINS doc_id contract: the cumulative pair report's
    # "disjoint across deltas, plain union" property (read_minhash_pairs)
    # and the single-row-per-doc hashes index both presume a doc_id is
    # indexed exactly once. A source that re-emits a doc (CDC update,
    # upstream reprocessing outside checkpoint replay) would otherwise
    # duplicate pairs and fan out every verify join touching that id —
    # so re-deliveries are dropped here: dedup within the batch via the
    # DETERMINISTIC min-struct keeper (bare dropDuplicates picks an
    # arbitrary row on conflicting same-id payloads, letting a replay
    # write a different delta than the first run — the r13 ADVICE class),
    # then a keys-only anti-join against the prior index. Revising a
    # document's text is a DELETE+INSERT under a fresh id in this model.
    from cqlcopy_spark.functions.skew import keep_min_by

    fresh = keep_min_by(batch_df.select("doc_id", "text"), "doc_id").join(
        guard_ids, "doc_id", "left_anti"
    )
    docs = _with_minhash_sig(fresh).persist()
    new_bands = _band_rows(docs).persist()
    new_hashes = docs.select("doc_id", "hashes")

    probe_side = new_bands.select(
        col("doc_id").alias("b_id"), "band", "key"
    )
    index_side = (
        prev_bands.withColumn("is_new", F.lit(False))
        .unionByName(new_bands.withColumn("is_new", F.lit(True)))
        .select(col("doc_id").alias("a_id"), "band", "key", "is_new")
    )
    cand = (
        probe_side.join(index_side, ["band", "key"])
        # corpus rows pair with ANY new doc; new-vs-new pairs once
        # (smaller id plays the corpus role) — see step 2 above
        .filter(
            (col("a_id") != col("b_id"))
            & ((col("a_id") < col("b_id")) | ~col("is_new"))
        )
        .select(col("b_id").alias("d1"), col("a_id").alias("d2"))
        .dropDuplicates(["d1", "d2"])  # multi-band collisions
    )
    all_hashes = prev_hashes.unionByName(new_hashes)
    pairs = _minhash_verify_pairs(cand, all_hashes).select(
        col("d1").alias("new_doc"), col("d2").alias("dup_of"), "jaccard"
    )

    # the pairs write runs the heavy lineage (signature + band + refine
    # join) and FILLS the docs/new_bands caches; the hashes delta —
    # the ONLY other write since r17 (the band rows of a tail delta are
    # derived at read time from the persisted sig) — is then one cheap
    # cached scan. Crash window unchanged in kind: either root present
    # without the other is repaired by the checkpoint replay's
    # overwrite-keyed rewrite.
    pairs.write.mode("overwrite").parquet(
        os.path.join(state_dir, "pairs", f"delta={batch_id}")
    )
    docs.select("doc_id", "hashes", "sig").write.mode("overwrite").parquet(
        os.path.join(hashes_root, f"delta={batch_id}")
    )
    new_bands.unpersist()
    docs.unpersist()


def continuous_minhash_dedup_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    on_new_run: str = "error",
) -> DataStreamWriter:
    """Streaming incremental MinHash-LSH near-dup detection — the
    foreachBatch twin of dedup_incremental (operators/dedup.py) on the
    continuous_cdc_sink state discipline: each arriving micro-batch of
    (doc_id, text) probes the PERSISTED band index of everything that
    arrived before it, reports its near-dup pairs, and appends its own
    band/signature rows to the index.

    State layout under state_dir (all append-only, batch_id-keyed,
    overwrite-on-replay → exactly-once scoped to same-checkpoint
    recovery, exactly like the other versioned sinks):

      hashes/delta=<b>  (doc_id, hashes, sig)   — gram-hash arrays for
                                                  the exact refine + the
                                                  MinHash signature the
                                                  band rows derive from
      bands/compact/v=<b>  (doc_id, band, key)  — the (band, key)-
                                                  clustered LSH index
                                                  (compactions only —
                                                  tail band rows derive
                                                  from the sig column)
      pairs/delta=<b>   (new_doc, dup_of, jaccard) — per-batch report

    Candidate volume per batch is Σ_key n_new(key)·n_all(key) — batch ×
    bucket occupancy, never corpus² (the dedup_incremental asymmetry).
    The delta layout is the production shape: the index is only ever
    APPENDED (∝ batch per write — ONE delta per batch since r17, the
    sig column making band rows a derived projection), and once
    _COMPACT_EVERY deltas accumulate they are folded into a
    (band, key)-clustered ``compact/v=<b>`` dir (hashes/ clustered by
    doc_id) so the per-batch probe reads ONE compacted dir plus at most
    _COMPACT_EVERY-1 tail deltas — bounded, instead of a file set
    growing with every batch (r8 VERDICT item 2). Deltas stay on disk
    as replay truth: _read_index_deltas ignores compactions newer than
    the reading batch, so out-of-order replays still see exactly their
    original corpus state. At cluster scale the compact dir becomes a
    metastore bucketed table so the probe join also skips the
    corpus-side shuffle. The cross-run guard
    (_run_guard) refuses a foreign checkpoint ('error') or wipes the
    delta subdirs and recomputes ('restart') — merging index deltas
    across checkpoint lineages double-counts because batch ids restart.

    Docs with < 3 tokens carry no 3-gram, hence no signature: they
    never enter the index or any pair — identical to the batch ops
    (test_gram_builders_handle_short_docs).

    Read the cumulative report with read_minhash_pairs()."""
    import shutil

    if on_new_run not in ("error", "restart"):
        raise ValueError(f"on_new_run must be 'error' or 'restart', got {on_new_run!r}")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        qid = _checkpoint_query_id(checkpoint_dir)
        same_run = _run_guard(
            state_dir, qid, on_new_run, "continuous_minhash_dedup_sink"
        )
        if not same_run:
            for sub in ("bands", "hashes", "pairs", "takedowns"):
                shutil.rmtree(os.path.join(state_dir, sub), ignore_errors=True)
            _clear_log_epoch(state_dir)
        os.makedirs(state_dir, exist_ok=True)
        minhash_apply_batch(batch_df, batch_id, state_dir)
        _write_run_marker(state_dir, qid)

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )


def read_minhash_pairs(spark, state_dir: str) -> DataFrame:
    """Cumulative near-dup report of a continuous_minhash_dedup_sink
    state dir: the union of every batch's pairs delta. Pairs are
    disjoint across deltas by construction (each pair is emitted only
    by its later-arriving member's batch), so this is a plain union —
    no dedup pass needed. Takedown masking (armed only when takedowns
    exist — a takedown-free state keeps the plain-union plan): a pair
    touching a retired doc on EITHER side leaves the report, the
    right-to-be-forgotten contract for the dedup index
    (minhash_takedown_batch)."""
    pairs = _read_index_deltas(
        spark,
        os.path.join(state_dir, "pairs"),
        2**62,
        "new_doc long, dup_of long, jaccard double",
    )
    if not os.path.isdir(os.path.join(state_dir, "takedowns")):
        return pairs
    td = _minhash_takedowns(spark, state_dir)
    for c in ("new_doc", "dup_of"):
        # takedown sets are tiny: stats pick broadcast anti-joins
        pairs = pairs.join(td.withColumnRenamed("doc_id", c), c, "left_anti")
    return pairs


def curation_apply_batch(
    batch_df: DataFrame, batch_id: int, state_dir: str
) -> None:
    """One micro-batch of the streaming curation pipeline: the kernel of
    continuous_curation_sink, exposed for direct replay tests — the
    round-12 capstone's gates + dedup keeper as live ingest.

    Per batch (all sizes ∝ batch, never ∝ corpus):

    0. OPTIONAL decontamination gate (armed by a persisted eval window
       index — see decontamination_index_write / _decontaminate_batch):
       bench docs and verbatim-window contamination hits rejected
       pre-admission;
    1. BOTH quality gates in one scan (operators.text._curation_gated —
       the capstone's literal gate expression, so the streamed corpus
       can never drift from the batch relation);
    2. in-batch keeper: lowest doc_id per md5(text) among the gated
       rows (ONE partial-combining argmin aggregate — min(struct) —
       NEVER a window over the hash key: the hot-key argmin rule);
    3. FIRST-DELIVERY-WINS across batches: a keys-only anti-join of the
       batch keepers against the compacted prior text-hash index — a
       later re-delivery of an admitted text (CDC re-emit, upstream
       reprocessing outside checkpoint replay) never lands twice;
       revising a document is DELETE+INSERT under a fresh id;
    4. ONE overwrite-keyed delta write (at-least-once replay REWRITES):
       ths/delta=<b> carrying the FULL admitted row (th, doc_id,
       n_toks). The hash probe reads it with schema "th string"
       (parquet column pruning — the extra columns cost the probe
       nothing), and the survivor view is DERIVED from the same files
       at read time (_survivor_frame: doc_id, doc_id % shards, n_toks —
       deterministic projections, disjoint across deltas by
       construction of the anti-join, so the cumulative read is a
       plain union). r17, guide §1.4: the former separate
       survivors/delta=<b> write duplicated the identical row set as a
       second Spark action per micro-batch (plus the persist both
       consumers forced); one delta write per batch is the write floor.
       The survivors/ root still exists — it holds the VACUUM's pruned
       compactions (vacuum output keeps its own root because its
       lifetime policy differs: survivor rows are prunable, admitted
       hashes are permanent).

    In-batch doc_id re-deliveries collapse first via the DETERMINISTIC
    min-struct keeper — never bare dropDuplicates, which picks an
    arbitrary row when one batch carries the same doc_id with
    conflicting payloads and so lets a checkpoint replay write a
    DIFFERENT delta than the first run (r13 ADVICE); the gates are
    deterministic per document, so a re-delivered REJECTED doc
    re-rejects identically and needs no doc_id index."""
    from cqlcopy_spark.functions.skew import keep_min_by
    from cqlcopy_spark.operators.text import _curation_gated

    spark = batch_df.sparkSession
    # effective id = batch id + persisted log epoch (0 until a vacuum
    # bumps it) — lets the same checkpoint resume after a vacuum
    batch_id = _apply_epoch(state_dir, batch_id)
    ths_root = os.path.join(state_dir, "ths")
    # refuse first-time writes below a compaction/vacuum stamp on either
    # root (they would be reader-invisible — silent loss); replays pass.
    # The survivor view's floor is a VACUUM compaction under survivors/
    # while the deltas live under ths/ (the r17 single-write layout), so
    # its guard checks the survivors floor against the THS delta dirs.
    _below_floor_guard(ths_root, batch_id, "curation_apply_batch[ths]")
    _below_floor_guard(
        os.path.join(state_dir, "survivors"),
        batch_id,
        "curation_apply_batch[survivors]",
        replay_root=ths_root,
    )
    _maybe_compact_index(spark, ths_root, batch_id, "th string", ["th"])
    prior_ths = _read_index_deltas(spark, ths_root, batch_id, "th string")

    fresh = keep_min_by(batch_df.select("doc_id", "text", "n_chars"), "doc_id")
    # decontamination gate — armed only when the state dir carries a
    # persisted eval window index (decontamination_index_write); a
    # gate-free state keeps the original plan byte for byte
    ew_root = os.path.join(state_dir, _EVAL_WINDOWS)
    if os.path.isdir(ew_root):
        fresh = _decontaminate_batch(spark, fresh, ew_root)
    gated = _curation_gated(fresh)
    # in-batch keeper as a DIRECT argmin aggregate (r16, guide
    # §2.3/§2.4): min(struct(doc_id, n_toks)) per th is the min-doc_id
    # row (doc_id unique after the fresh keeper, so the struct min is
    # deterministic and n_toks rides along) — one partial-combining
    # shuffle where the former groupBy + semi-join-back pair shuffled
    # twice and ran the gate lineage on BOTH join sides (two batch
    # scans per write at any scale). Same rows, same keeper rule.
    # ONE write per batch (r17, guide §1.4): the delta carries the full
    # admitted row; the hash probe column-prunes to `th`, the survivor
    # view projects (doc_id, shard, n_tokens) from the same files
    # (_survivor_frame). No persist — single consumer, single action.
    admitted = keep_min_by(gated.select("th", "doc_id", "n_toks"), "th").join(
        prior_ths, "th", "left_anti"
    )
    admitted.write.mode("overwrite").parquet(
        os.path.join(ths_root, f"delta={batch_id}")
    )


_EVAL_WINDOWS = "eval_windows"


def decontamination_index_write(bench_docs: DataFrame, state_dir: str) -> None:
    """Persist the eval benchmark's verbatim char-window index (the
    fixed-size side of contamination_substring: every length-_SUB_N
    window, stride 1) into the curation state dir — its presence ARMS
    the per-batch decontamination gate in curation_apply_batch. Written
    once, before ingest begins (a production benchmark is frozen before
    training data arrives; re-writing it mid-stream would make the flag
    batch-dependent and break the streamed==one-shot hash contract).
    Bounded by construction: ≤ _BENCH_CAP bench docs at every SF (the
    id-cap rule, operators/text._bench_split), so the index broadcasts
    soundly at read."""
    from cqlcopy_spark.operators.text import _char_windows

    os.makedirs(state_dir, exist_ok=True)
    (
        _char_windows(bench_docs.select("doc_id", "text"), 1)
        .select("w")
        .dropDuplicates(["w"])
        .write.mode("overwrite")
        .parquet(os.path.join(state_dir, _EVAL_WINDOWS))
    )


def _decontaminate_batch(spark, batch: DataFrame, ew_root: str) -> DataFrame:
    """Streaming decontamination gate (r14 VERDICT item 6): drop the
    held-out bench docs themselves and every batch doc sharing a
    verbatim _SUB_N-char window with the persisted eval index —
    contamination_substring's exact membership rule (stride-sampled
    corpus windows vs the stride-1 eval windows), applied per
    micro-batch. Work ∝ batch: windows of THIS batch only; the eval
    index is fixed-size by construction (≤ _BENCH_CAP docs) and
    broadcasts; the flagged key set is batch-bounded, so the anti-join
    leaves the batch in place. The flag is a pure per-document function
    constant across batches, which is what keeps the streamed corpus
    hash-equal to the one-shot decontaminated capstone
    (pipeline_pretrain_pack_decontam)."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.text import _SUB_STRIDE, _bench_split, _char_windows

    clean = _bench_split(batch)[1]
    ew = spark.read.schema("w string").parquet(ew_root)
    flagged = (
        _char_windows(clean.select("doc_id", "text"), _SUB_STRIDE)
        .join(F.broadcast(ew), "w")
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )
    return clean.join(flagged, "doc_id", "left_anti")


def curation_takedown_batch(
    doc_ids: DataFrame, batch_id: int, state_dir: str
) -> None:
    """Retire admitted documents from the curation state — the
    right-to-be-forgotten half a production training-data pipeline
    needs (a copyright or privacy takedown names content already
    admitted; the corpus a trainer reads next must not contain it):
    append a TAKEDOWN delta (doc_id-keyed, overwrite-on-replay,
    compaction cadence, monotone-id floor guard — the vector index's
    tombstone discipline applied to the curation log).

    Two-layer permanence policy:
    - the doc_id leaves the reader view FOREVER (read_curation_survivors
      anti-joins takedowns), applied POST-admission — a taken-down md5
      keeper does NOT resurrect its duplicates, because their hash
      stays in the admitted-text index;
    - the admitted-text index is deliberately NOT freed: the takedown
      retires the CONTENT, so a later re-delivery of the identical text
      under any fresh doc_id stays out (first-delivery-wins already
      drops it). Re-publishing genuinely new content is a new document
      under a new id.

    Scale shape: a takedown costs one batch-sized delta write; reads add
    ONE anti-join against the compacted takedown set (tiny relative to
    survivors, broadcast by stats). Physical pruning of masked survivor
    rows is the vector_index_vacuum discipline applied verbatim to this
    root — the raw takedown deltas are the replay truth that makes it
    safe."""
    _takedown_ids_batch(doc_ids, batch_id, state_dir, "curation_takedown_batch")


def _takedown_ids_batch(
    doc_ids: DataFrame, batch_id: int, state_dir: str, what: str
) -> None:
    """The shared takedown-delta kernel (curation + minhash): an
    id-keyed tombstone delta on the full discipline — epoch mapping,
    monotone-id floor guard, compaction cadence, overwrite-on-replay."""
    spark = doc_ids.sparkSession
    batch_id = _apply_epoch(state_dir, batch_id)
    td_root = os.path.join(state_dir, "takedowns")
    _below_floor_guard(td_root, batch_id, what)
    _maybe_compact_index(spark, td_root, batch_id, "doc_id long", ["doc_id"])
    doc_ids.select("doc_id").dropDuplicates(["doc_id"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(td_root, f"delta={batch_id}"))


def minhash_takedown_batch(
    doc_ids: DataFrame, batch_id: int, state_dir: str
) -> None:
    """Right-to-be-forgotten for the DEDUP INDEX — the third delta-log
    family to get the takedown discipline (after the curation log and
    the vector index): a retired document's text-derived state must
    leave the near-dup index too, or its content keeps influencing
    processing through signatures and reported pairs. Appends an
    id-keyed takedown delta (_takedown_ids_batch); from then on

    - readers mask it: read_minhash_pairs drops pairs touching a
      retired id (EITHER side);
    - the probe masks it: minhash_apply_batch anti-joins the prior
      band/signature index against the takedowns, so later arrivals
      never pair with retired content;
    - the admission guard keeps it out forever: a re-delivery of a
      retired doc_id is dropped (tombstones-win-forever, the vector
      index's rule);
    - physical pruning is minhash_vacuum — the shared discipline over
      THREE data roots (bands, hashes, and the two-column pairs
      report) and one mask."""
    _takedown_ids_batch(doc_ids, batch_id, state_dir, "minhash_takedown_batch")


def _minhash_takedowns(spark, state_dir: str, below_batch: int = 1 << 62):
    return _read_index_deltas(
        spark, os.path.join(state_dir, "takedowns"), below_batch, "doc_id long"
    )


def minhash_vacuum(spark, state_dir: str, bump_epoch: bool = False) -> int:
    """Physically prune retired documents from all three minhash data
    roots — band rows and signature rows by doc_id, PAIR rows by either
    column — and swap the takedown mask empty, in one version stamp
    (vacuum_masked_roots; same retained-raw-delta replay truth,
    idempotence and crash-retry contract as the other two instances).
    bump_epoch=True raises the log epoch to the stamp so a live
    checkpoint resumes afterwards (see bump_log_epoch)."""
    def _bands_source():
        # the bands view is VIRTUAL (r17): clustered compactions under
        # bands/ + band rows derived from the raw hashes-delta tail.
        # Exact input accounting without reading data: every signature
        # derives exactly _N_BANDS band rows, so the derived tail
        # contributes _N_BANDS × the hashes deltas' footer row counts.
        from cqlcopy_spark.operators.dedup import _N_BANDS

        compact, deltas = _band_sources(state_dir, 1 << 62)
        rows_in = _parquet_dir_rows(compact) + _N_BANDS * _parquet_dir_rows(
            deltas
        )
        return rows_in, _band_frame(spark, state_dir, 1 << 62)

    n = vacuum_masked_roots(
        spark,
        [
            (
                os.path.join(state_dir, "bands"),
                "doc_id long, band int, key string",
                ["doc_id"],
                ["band", "key"],
                _bands_source,
            ),
            (
                os.path.join(state_dir, "hashes"),
                "doc_id long, hashes array<long>",
                ["doc_id"],
                ["doc_id"],
            ),
            (
                os.path.join(state_dir, "pairs"),
                "new_doc long, dup_of long, jaccard double",
                ["new_doc", "dup_of"],
                ["new_doc", "dup_of"],
            ),
        ],
        os.path.join(state_dir, "takedowns"),
        "doc_id",
    )
    if bump_epoch:
        bump_log_epoch(
            state_dir,
            [
                os.path.join(state_dir, sub)
                for sub in ("bands", "hashes", "pairs", "takedowns")
            ],
        )
    return n


_THS_DELTA_SCHEMA = "th string, doc_id long, n_toks long"
_SURVIVOR_SCHEMA = "doc_id long, shard long, n_tokens long"


def _survivor_sources(
    state_dir: str, below_batch: int
) -> "tuple[list[str], list[str]]":
    """(vacuum-compaction paths, raw ths-delta paths) a survivor reader
    at `below_batch` resolves under the r17 single-write layout: the
    newest COMPLETE vacuum compaction v ≤ below_batch under survivors/
    (absent until a vacuum runs) plus the raw admitted-row deltas under
    ths/ in [v, below_batch). The ths deltas ARE the survivor deltas —
    one file set serves both the hash probe (column-pruned to th) and
    the survivor view (projected to doc_id/shard/n_tokens); raw deltas
    are never deleted, so the fallback below any historical as_of or
    vacuum stamp is always on disk."""
    surv_root = os.path.join(state_dir, "survivors")
    usable = [v for v in _compact_versions(surv_root) if v <= below_batch]
    floor = usable[-1] if usable else 0
    compact = (
        [os.path.join(surv_root, "compact", f"v={floor}")] if usable else []
    )
    ths_root = os.path.join(state_dir, "ths")
    deltas = [
        os.path.join(ths_root, f"delta={i}")
        for i in _delta_ids(ths_root, below_batch)
        if i >= floor
    ]
    return compact, deltas


def _survivor_projection(frame: DataFrame) -> DataFrame:
    """(doc_id, shard, n_tokens) from an admitted-row ths frame — the
    deterministic projections the pre-r17 survivors delta write wrote:
    shard = doc_id % _PACK_SHARDS (Spark `%` matches the oracle's on
    negative ids), n_tokens = n_toks. Column dtypes identical to the
    former on-disk schema (all BIGINT)."""
    from pyspark.sql.functions import col

    from cqlcopy_spark.operators.text import _PACK_SHARDS

    return frame.select(
        "doc_id",
        (col("doc_id") % _PACK_SHARDS).alias("shard"),
        col("n_toks").alias("n_tokens"),
    )


def _survivor_frame(spark, state_dir: str, below_batch: int) -> DataFrame:
    """The cumulative survivor view strictly below `below_batch`: the
    newest vacuum compaction (already (doc_id, shard, n_tokens)) union
    the projected raw ths deltas above it. Plain union — deltas are
    disjoint first-delivery-wins sets, the compaction only ever covers
    ids strictly below its own version."""
    compact, deltas = _survivor_sources(state_dir, below_batch)
    parts = []
    if compact:
        parts.append(spark.read.schema(_SURVIVOR_SCHEMA).parquet(*compact))
    if deltas:
        parts.append(
            _survivor_projection(
                spark.read.schema(_THS_DELTA_SCHEMA).parquet(*deltas)
            )
        )
    if not parts:
        return spark.createDataFrame([], _SURVIVOR_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_curation_survivors(
    spark, state_dir: str, as_of: int = 1 << 62
) -> DataFrame:
    """Cumulative admitted set of a continuous_curation_sink state dir:
    the union of every batch's survivor delta — disjoint across deltas
    by construction (the anti-join admits each text hash exactly once),
    so this is a plain union. The takedown anti-join is added ONLY when
    takedowns exist, so a takedown-free state keeps the plain-union plan
    byte for byte. Feed it to text._pack_from_toks for the
    trainer-facing packed layout.

    `as_of` is TIME TRAVEL over the delta log: the state a reader AT
    batch id `as_of` saw — deltas (and takedown masks) strictly below
    it, exactly _read_index_deltas' replay contract. Compactions only
    ever fold deltas strictly below their own version, so a compaction
    ≤ as_of is a lossless shortcut; a vacuum version is stamped ABOVE
    every id and is therefore skipped by any historical as_of, which
    falls back to the retained raw deltas — time travel keeps working
    across physical pruning, because the raw deltas are the replay
    truth the vacuum deliberately retains."""
    surv = _survivor_frame(spark, state_dir, as_of)
    td_root = os.path.join(state_dir, "takedowns")
    if not os.path.isdir(td_root):
        return surv
    # takedowns are tiny relative to survivors: stats pick a broadcast
    # anti-join unhinted (the no-SF-scaling-broadcast-hint rule)
    return surv.join(
        _read_index_deltas(spark, td_root, as_of, "doc_id long"),
        "doc_id",
        "left_anti",
    )


def curation_state_clone(spark, src: str, dst: str, as_of: int) -> None:
    """BRANCH a curation state: copy `src`'s as-of file set (the exact
    directories a reader at batch id `as_of` resolves — survivors,
    admitted-hash index, takedown masks, each strictly below the point)
    into a fresh `dst`, and persist `dst`'s log epoch = `as_of` so a
    BRAND-NEW checkpoint's batch 0 maps exactly onto the fork point
    (the epoch lever reused: without it, fresh small batch ids would
    die at the compaction floor). The branch then evolves
    independently — ingest, takedowns, vacuums on either side never
    touch the other (a dev fork of a training corpus, the table-format
    branch primitive).

    Cost: pure driver-side file copying, ZERO Spark jobs (r16 — see
    clone_state_roots for the zero-copy argument; the previous shape
    rewrote each root's as-of view as a base compaction); every later
    branch read is the normal compact+tail-delta resolution. Faithful
    by the same argument as time travel: deltas are disjoint
    first-delivery-wins sets and the as-of read is exact — continuing
    the branch with the trunk's remaining deliveries reproduces the
    trunk relation (stream_curation_branch driver-checks that
    equality)."""
    # r17 single-write layout: the survivor view is virtual (vacuum
    # compactions under survivors/ + raw ths deltas above that floor),
    # and its floor is independent of the ths root's own compaction
    # floor — copy the exact source set the view resolves FIRST (a ths
    # compaction stamped above a vacuum would otherwise let the
    # standard ths clone skip deltas the survivor view still needs).
    # copytree(dirs_exist_ok) makes the overlap with the ths spec a
    # no-op re-copy; the epoch file still lands last, inside
    # clone_state_roots.
    compact, deltas = _survivor_sources(src, as_of)
    for p in compact + deltas:
        _copytree_marker_last(p, os.path.join(dst, os.path.relpath(p, src)))
    clone_state_roots(
        spark,
        src,
        dst,
        as_of,
        (
            ("ths", _THS_DELTA_SCHEMA, ["th"]),
            ("takedowns", "doc_id long", ["doc_id"]),
        ),
    )


def _copytree_marker_last(src_dir: str, dst_dir: str) -> None:
    """copytree with the _SUCCESS marker copied strictly LAST (r16
    ADVICE): _compact_versions treats any marker-bearing dir as a
    complete compaction, so a crash mid-copy must never leave the
    marker without every data file. Idempotent re-copy (dirs_exist_ok
    semantics) — a torn dst has no marker, is invisible to readers,
    and the retry overwrites it file by file."""
    import shutil

    os.makedirs(dst_dir, exist_ok=True)
    names = os.listdir(src_dir)
    for name in sorted(n for n in names if n != "_SUCCESS"):
        s = os.path.join(src_dir, name)
        d = os.path.join(dst_dir, name)
        if os.path.isdir(s):
            shutil.copytree(s, d, dirs_exist_ok=True)
        else:
            shutil.copyfile(s, d)
    if "_SUCCESS" in names:
        shutil.copyfile(
            os.path.join(src_dir, "_SUCCESS"), os.path.join(dst_dir, "_SUCCESS")
        )


def clone_state_roots(spark, src: str, dst: str, as_of: int, specs) -> None:
    """The shared fork mechanics behind curation_state_clone and
    vector_index_clone: for each (subdir, schema, layout) root, COPY the
    exact directory set its as-of read resolves (_index_delta_paths:
    newest complete compaction ≤ as_of plus the raw deltas in
    [floor, as_of)) into `dst` under the SAME names, then persist
    `dst`'s log epoch = as_of — the epoch lever reused so a brand-new
    checkpoint's batch 0 maps onto the fork point instead of dying at
    the compaction floor. Missing/empty-as-of roots end up absent in
    `dst`, which every reader treats as the empty view.

    ZERO-COPY fork (r16, guide §1.2 step 1): the as-of view IS those
    immutable files, so forking is pure driver-side file copying — the
    previous shape paid a Spark read + repartition + sortWithinPartitions
    + write job per root to materialize the identical rows as a base
    compaction (3 jobs per clone at bench scale; a corpus-sized rewrite
    at production scale — the one cost the table-format branch
    primitive exists to avoid). The branch's reader resolution
    (compaction-floor + tail deltas) is byte-for-byte the trunk's as-of
    resolution; the normal compaction cadence re-clusters the branch as
    it ingests. The schema/layout spec fields are kept for the callers'
    documentation of each root's contract (and for any future deep-clone
    variant); the copy itself is layout-preserving. Compactions above
    as_of — including vacuum stamps — are skipped by construction, so
    forking at a historical point below a vacuum serves the retained
    raw-delta truth (test_branch_from_vacuumed_trunk...). The epoch
    file still lands strictly LAST (a torn clone has no epoch and the
    retry's dirs_exist_ok re-copy completes it), and within each copied
    directory the _SUCCESS marker lands last too (_copytree_marker_last,
    r16 ADVICE): a plain copytree copies in listdir order, so a crash
    mid-clone could leave a marker-bearing compaction dir missing part
    files — which _compact_versions would treat as complete."""
    for sub, _schema, _layout in specs:
        root = os.path.join(src, sub)
        if not os.path.isdir(root):
            continue
        for p in _index_delta_paths(root, as_of):
            rel = os.path.relpath(p, root)
            _copytree_marker_last(p, os.path.join(dst, sub, rel))
    os.makedirs(dst, exist_ok=True)
    tmp = os.path.join(dst, _EPOCH_FILE + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(as_of))
    os.replace(tmp, os.path.join(dst, _EPOCH_FILE))


def read_curation_survivors_with_batch(spark, state_dir: str) -> DataFrame:
    """(doc_id, shard, n_tokens, admitted_batch) — every live survivor
    with the batch id that ADMITTED it, read from the RAW admitted-row
    ths deltas (the survivor deltas of the r17 single-write layout; the
    curation twin of vector_index._rows_with_batch):
    compactions are skipped on purpose, because provenance is exactly
    what compaction erases and the raw deltas are retained as replay
    truth. Driver state is one os.listdir; the loop builds a union PLAN
    (rows never collect). The takedown mask is likewise read from the
    RAW takedown deltas, symmetric with the survivor side (r15 ADVICE):
    a curation_vacuum swaps the mask root to an EMPTY compaction (its
    rows are already reflected in the pruned survivor compaction, which
    this read deliberately skips), so resolving the mask through
    _read_index_deltas would resurrect every pre-vacuum retirement on
    this compliance-audit surface — the raw deltas are retained by the
    vacuum exactly so provenance reads stay truthful."""
    from pyspark.sql import functions as F

    root = os.path.join(state_dir, "ths")
    frames = [
        _survivor_projection(
            spark.read.schema(_THS_DELTA_SCHEMA).parquet(
                os.path.join(root, f"delta={b}")
            )
        ).withColumn("admitted_batch", F.lit(b).cast("long"))
        for b in _delta_ids(root, 1 << 62)
    ]
    if not frames:
        return spark.createDataFrame([], _SURVIVOR_SCHEMA + ", admitted_batch long")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    td_root = os.path.join(state_dir, "takedowns")
    td_paths = [
        os.path.join(td_root, f"delta={b}") for b in _delta_ids(td_root, 1 << 62)
    ]
    if not td_paths:
        return out
    return out.join(
        spark.read.schema("doc_id long").parquet(*td_paths),
        "doc_id",
        "left_anti",
    )


def continuous_curation_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    on_new_run: str = "error",
) -> DataStreamWriter:
    """Streaming curation — the foreachBatch twin of
    pipeline_pretrain_pack's gates + keeper (operators/text.py) on the
    continuous_minhash_dedup_sink state discipline: each arriving
    micro-batch of (doc_id, text, n_chars) is gate-filtered, deduped
    first-delivery-wins against the persisted admitted-hash index, and
    appended to the survivor log.

    State layout under state_dir (append-only, batch_id-keyed,
    overwrite-on-replay → exactly-once scoped to same-checkpoint
    recovery):

      ths/delta=<b>   (th, doc_id, n_toks) — the admitted rows: the md5
                      probe column-prunes to th, the survivor view
                      projects (doc_id, shard, n_tokens) from the same
                      files (r17 single-write layout; survivors/ holds
                      only vacuum compactions)

    The cross-run guard (_run_guard) refuses a foreign checkpoint
    ('error') or wipes the state subdirs and recomputes ('restart') —
    batch ids restart across checkpoint lineages, so merging deltas
    across runs would re-admit every text hash. Read the cumulative
    survivor set with read_curation_survivors()."""
    import shutil

    if on_new_run not in ("error", "restart"):
        raise ValueError(
            f"on_new_run must be 'error' or 'restart', got {on_new_run!r}"
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        qid = _checkpoint_query_id(checkpoint_dir)
        same_run = _run_guard(state_dir, qid, on_new_run, "continuous_curation_sink")
        if not same_run:
            for sub in ("ths", "survivors", "takedowns"):
                shutil.rmtree(os.path.join(state_dir, sub), ignore_errors=True)
            _clear_log_epoch(state_dir)
        os.makedirs(state_dir, exist_ok=True)
        curation_apply_batch(batch_df, batch_id, state_dir)
        _write_run_marker(state_dir, qid)

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )


def continuous_vector_index_sink(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    on_new_run: str = "error",
) -> DataStreamWriter:
    """Streaming ingest for the persisted vector index — the
    foreachBatch twin of `similarity_index_incremental`'s batch
    contract (operators/vector_index.py) on the
    continuous_minhash_dedup_sink state discipline: the FIRST non-empty
    micro-batch of (vec_id, emb) trains the coarse centroids + residual
    codebooks and seeds the index (the base-slice-trains contract);
    every later batch encodes with the PERSISTED codebooks and appends
    — no retrain, no historical re-encode, first-delivery-wins on
    vec_id, tombstones honored (vector_index_delete composes with this
    sink: deletes are just another delta family in the same state dir).

    Replay semantics: a replayed batch re-derives from the state
    strictly below its own id (vector_index_append) and overwrites its
    own delta. The seed delta carries the SEED BATCH'S REAL id (r13
    ADVICE: empty leading batches are skipped, so the seed can arrive
    as batch K>0 — hard-coding delta=0 mislabeled provenance and made
    a replayed seed anti-join against its own rows and write an empty
    delta=K); a replayed seed batch therefore takes the append path —
    the codebooks exist and were trained on exactly this batch, prior
    deltas strictly below K are empty — and rewrites delta=K with the
    same rows (idempotent by construction). 'Trained' is gated on
    codebooks.parquet, which vector_index_build now renames into place
    ATOMICALLY and LAST (after the codes delta and centroids), so a
    crash mid-build cannot leave a truncated sentinel that flips every
    replay onto the append path against corrupt artifacts (r13 ADVICE)
    — the replayed seed just retrains over the partial state. An EMPTY
    batch before any training is skipped entirely: there is nothing to
    train on, and training on the first NON-empty batch keeps the
    trained artifacts a pure function of the stream prefix.

    The cross-run guard (_run_guard) refuses a foreign checkpoint
    ('error') or wipes the index state and recomputes ('restart') —
    batch ids restart across checkpoint lineages. Query the index with
    vector_index_search / read_index_codes."""
    import shutil

    if on_new_run not in ("error", "restart"):
        raise ValueError(
            f"on_new_run must be 'error' or 'restart', got {on_new_run!r}"
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from cqlcopy_spark.operators.vector_index import (
            vector_index_append,
            vector_index_build,
        )

        qid = _checkpoint_query_id(checkpoint_dir)
        same_run = _run_guard(
            state_dir, qid, on_new_run, "continuous_vector_index_sink"
        )
        if not same_run:
            for sub in ("codes", "tombstones"):
                shutil.rmtree(os.path.join(state_dir, sub), ignore_errors=True)
            _clear_log_epoch(state_dir)
            for f in ("centroids.parquet", "codebooks.parquet"):
                p = os.path.join(state_dir, f)
                shutil.rmtree(p, ignore_errors=True)
                if os.path.isfile(p):
                    os.remove(p)
        os.makedirs(state_dir, exist_ok=True)
        trained = os.path.exists(os.path.join(state_dir, "codebooks.parquet"))
        if not trained:
            if batch_df.isEmpty():
                return  # nothing to train on yet — wait for data
            vector_index_build(batch_df, state_dir, batch_id=batch_id)
        else:
            vector_index_append(batch_df, batch_id, state_dir)
        _write_run_marker(state_dir, qid)

    return stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
