"""Persisted incremental vector index — IVF/PQ artifacts as parquet state.

The r12 verdict's one architectural gap: every ANN op in similarity.py
(`similarity_ann_ivf`, `embedding_pq_topk`, `similarity_ivfpq`) retrains
its centroids/codebooks and re-encodes the corpus per invocation. The
production IVF/PQ story is a persisted index artifact plus incremental
adds — exactly the persisted-state contract `stream_minhash_incremental`
already proves for the MinHash band index, applied to embeddings:

- ``vector_index_build``   — train coarse centroids + residual codebooks
  on the BASE slice only, encode it, and persist everything as parquet
  (centroids/codebooks tiny, codes partitioned by arrival delta);
- ``vector_index_append``  — encode a NEW batch with the PERSISTED
  codebooks (no retrain), first-delivery-wins on vec_id, overwrite-keyed
  delta writes so an at-least-once replay REWRITES rather than
  duplicates (minhash_apply_batch's exact idempotence recipe, including
  its delta compaction cadence);
- ``vector_index_search``  — the IVFADC query half over the persisted
  codes: per-query LUTs + probed-cell masking inside ONE Arrow scan
  (similarity.py:2093's `_adc_scan_kernel`), exact-cosine refine.

Training on the base slice only is what makes the index INCREMENTAL:
appends never see the trainer, so batch N's codes are a pure function of
(codebooks, batch) — the parity the verify twin holds to. FAISS's
IndexIVFPQ `add()` has the same contract (public API semantics; the
reference repo, a Cassandra bulk loader, has no vector surface at all —
this extends it per the mandated LLM-pipeline scope).

Scale shape at 100 TB: index state on disk is O(N) codes (M bytes-ish
per vector) + O(cells·dim + M·K·sub) driver-resident training artifacts;
an append touches only its batch plus a keys-only anti-join against the
compacted vec_id index (asymmetric — batch probes corpus, never
corpus²); a search scans the codes ONCE with no shuffle and moves only
partitions × Q × cand candidate rows. Nothing retrains, re-encodes, or
rescans the historical corpus on either path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.functions.skew import keep_min_by
from cqlcopy_spark.plans.registry import register

_CODES_SCHEMA = "vec_id long, emb array<double>, cell int, codes string"


def _fit_from_base(base: DataFrame):
    """(coarse_centroids, residual_codebooks) trained on a capped,
    vec_id-sorted driver sample of the BASE frame only — the SHARED
    `_train_sample` + `_ivfpq_train_from_sample` recipe (similarity.py),
    so the determinism contract (layout-independent hash-TakeOrdered
    sample — never empty on a fixed-residue production id space, r13
    VERDICT item 2 — seedless strided init, deterministic per-dimension
    assignment) cannot drift from the same-session IVFADC family (r13
    review factoring). Appended batches never influence training: that
    is the incremental-index contract the verify twin checks."""
    from cqlcopy_spark.operators.similarity import (
        _PQ_TRAIN_CAP,
        _ivfpq_train_from_sample,
        _train_sample,
    )

    return _ivfpq_train_from_sample(_train_sample(base, _PQ_TRAIN_CAP))


def _encode_with(frame: DataFrame, coarse, books) -> DataFrame:
    """The SHARED `_ivfpq_encode_frame` Arrow map (similarity.py):
    deterministic per-dimension coarse assignment + the fuzzed
    `_pq_encode_batch` residual kernel — one definition for the
    same-session IVFADC encode, the index build, the appends, and the
    verify twins' one-shot parity encode, so incremental and one-shot
    codes are batch-shape-independently identical (r13 review: the
    previous gemm-form argmin was 1-ulp shape-dependent). No shuffle."""
    from cqlcopy_spark.operators.similarity import _ivfpq_encode_frame

    return _ivfpq_encode_frame(frame, coarse, books)


def vector_index_build(base: DataFrame, state_dir: str, batch_id: int = 0) -> None:
    """Train on the base slice, encode it, persist the index artifacts:

    - ``centroids.parquet``      (cell int, c array<double>)
    - ``codebooks.parquet``      (m int, k int, c array<double>)
    - ``codes/delta=<batch_id>`` ({codes schema}) — the base encode

    The training artifacts are cells×dim + M×K×sub doubles — driver-
    resident state written and read back DRIVER-SIDE via pyarrow (the
    FAISS index-header analogue: it is not a dataset, so routing ~150
    tiny rows through spark.createDataFrame+write cost two full Spark
    jobs ≈ 11s of the first bench measurement — profiled r13).

    Crash safety + provenance (both r13 ADVICE):
    - the header files are written to temp names and os.replace'd —
      rename is atomic, and codebooks.parquet (the streaming sink's
      'trained' sentinel) lands LAST, after the codes delta, so a crash
      mid-build can never leave a truncated sentinel that flips every
      replay onto the append path against corrupt artifacts; a replayed
      seed batch simply retrains over the partial state;
    - the seed delta carries the REAL batch id: with empty leading
      stream batches the seed arrives as batch K>0, and hard-coding
      delta=0 both mislabeled _rows_with_batch provenance and made a
      replay of batch K anti-join against its own rows (filed under
      delta=0 < K) and write an empty delta=K. With delta=K the replay
      re-derives from state strictly below K — nothing — and rewrites
      the same rows.
    In-batch duplicate vec_ids collapse via the DETERMINISTIC min-struct
    keeper before both training and encode, so a replay trains and
    encodes the identical row set even when the batch carries one id
    with conflicting payloads (bare dropDuplicates picked arbitrarily)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cqlcopy_spark.streaming.sinks import _apply_epoch

    # uniform effective-id mapping across every writer of this state dir
    # (a no-op on the fresh state dirs build normally targets: no epoch
    # file exists until a vacuum bumps one)
    batch_id = _apply_epoch(state_dir, batch_id)
    seed = keep_min_by(base.select("vec_id", "emb"), "vec_id")
    coarse, books = _fit_from_base(seed)
    os.makedirs(state_dir, exist_ok=True)
    _encode_with(seed, coarse, books).write.mode("overwrite").parquet(
        os.path.join(state_dir, "codes", f"delta={batch_id}")
    )

    def _atomic_write(tbl, name: str) -> None:
        tmp = os.path.join(state_dir, name + ".tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(state_dir, name))

    _atomic_write(
        pa.table(
            {
                "cell": pa.array(range(len(coarse)), type=pa.int32()),
                "c": pa.array([list(map(float, c)) for c in coarse],
                              type=pa.list_(pa.float64())),
            }
        ),
        "centroids.parquet",
    )
    rows = [
        (m, k, list(map(float, books[m][k])))
        for m in range(len(books))
        for k in range(books[m].shape[0])
    ]
    _atomic_write(
        pa.table(
            {
                "m": pa.array([r[0] for r in rows], type=pa.int32()),
                "k": pa.array([r[1] for r in rows], type=pa.int32()),
                "c": pa.array([r[2] for r in rows],
                              type=pa.list_(pa.float64())),
            }
        ),
        "codebooks.parquet",
    )


def _load_artifacts(spark: SparkSession, state_dir: str):
    """(coarse, books) back from parquet — the bounded index-header
    read, done DRIVER-SIDE with pyarrow (no Spark job: ≤ cells + M·K
    tiny rows, and every append/search/verify re-reads them)."""
    import numpy as np
    import pyarrow.parquet as pq

    ct = pq.read_table(os.path.join(state_dir, "centroids.parquet")).to_pydict()
    order = sorted(range(len(ct["cell"])), key=lambda i: ct["cell"][i])
    coarse = np.stack(
        [np.asarray(ct["c"][i], dtype=np.float64) for i in order]
    )
    bt = pq.read_table(os.path.join(state_dir, "codebooks.parquet")).to_pydict()
    idx = sorted(range(len(bt["m"])), key=lambda i: (bt["m"][i], bt["k"][i]))
    n_m = 1 + max(bt["m"])
    books = [
        np.stack(
            [
                np.asarray(bt["c"][i], dtype=np.float64)
                for i in idx
                if bt["m"][i] == m
            ]
        )
        for m in range(n_m)
    ]
    return coarse, books


def vector_index_append(new_df: DataFrame, batch_id: int, state_dir: str) -> None:
    """Encode one arriving batch with the PERSISTED codebooks — no
    retrain, no historical re-encode — and append it as
    ``codes/delta=<batch_id>``.

    Idempotence (minhash_apply_batch's two-layer contract):
    - checkpoint replay of the SAME batch_id overwrites its own delta
      dir byte-for-byte (overwrite-keyed write);
    - FIRST-DELIVERY-WINS on vec_id: in-batch dedup, then a keys-only
      anti-join against the compacted prior index ∪ the prior
      TOMBSTONES — a re-emitted vector (CDC update, upstream
      reprocessing outside checkpoint replay) never lands twice, and a
      retired id never comes back (tombstones win forever — see
      vector_index_delete); revising a vector is DELETE+INSERT under a
      fresh id in this model.
    The probe is asymmetric (batch × keys-only index scan) and the
    compaction cadence keeps the index file count O(1) per batch, not
    ∝ batches (see _maybe_compact_index). Both guard reads stop
    strictly below batch_id, so an out-of-order replay re-derives from
    exactly the state it saw the first time."""
    from cqlcopy_spark.streaming.sinks import (
        _maybe_compact_index,
        _read_index_deltas,
    )

    from cqlcopy_spark.streaming.sinks import _apply_epoch

    spark = new_df.sparkSession
    # effective id = batch id + persisted log epoch (0 until a vacuum
    # bumps it) — lets the same checkpoint resume after a vacuum
    batch_id = _apply_epoch(state_dir, batch_id)
    codes_root = os.path.join(state_dir, "codes")
    _below_floor_guard(codes_root, batch_id, "vector_index_append")
    _maybe_compact_index(spark, codes_root, batch_id, _CODES_SCHEMA, ["vec_id"])
    prior_ids = _read_index_deltas(
        spark, codes_root, batch_id, _CODES_SCHEMA
    ).select("vec_id")
    if os.path.isdir(os.path.join(state_dir, "tombstones")):
        prior_ids = prior_ids.unionByName(
            _read_tombstones(spark, state_dir, batch_id)
        )
    # deterministic in-batch keeper (min emb per vec_id), never bare
    # dropDuplicates: an arbitrary pick would let a checkpoint replay of
    # a batch carrying one vec_id with conflicting payloads write a
    # DIFFERENT delta than the first run, breaking the byte-for-byte
    # replay contract (r13 ADVICE)
    fresh = keep_min_by(new_df.select("vec_id", "emb"), "vec_id").join(
        prior_ids, "vec_id", "left_anti"
    )
    coarse, books = _load_artifacts(spark, state_dir)
    _encode_with(fresh, coarse, books).write.mode("overwrite").parquet(
        os.path.join(codes_root, f"delta={batch_id}")
    )


def _below_floor_guard(root: str, batch_id: int, what: str) -> None:
    """See streaming.sinks._below_floor_guard (the canonical home — the
    guard protects every delta-log root, not just the vector index)."""
    from cqlcopy_spark.streaming.sinks import _below_floor_guard as _guard

    _guard(root, batch_id, what)


def read_index_codes(
    spark: SparkSession, state_dir: str, as_of: int = 1 << 62
) -> DataFrame:
    """The cumulative encoded corpus (every delta + compactions resolved
    exactly once, tombstoned ids masked) — what a search scans and what
    the verify twins hold to one-shot parity. The tombstone anti-join is
    added ONLY when deletes exist, so a delete-free index keeps the
    one-scan/one-Arrow-stage query plan byte for byte (plan pin).

    `as_of` is TIME TRAVEL over the index log (the curation reader's
    contract, read_curation_survivors): codes and tombstones strictly
    below the read point — a reader at batch id `as_of`'s exact view.
    Vacuum versions stamp above every id, so historical reads skip
    them and serve the retained raw deltas: point-in-time truth
    survives physical pruning by construction."""
    from cqlcopy_spark.streaming.sinks import _read_index_deltas

    codes = _read_index_deltas(
        spark, os.path.join(state_dir, "codes"), as_of, _CODES_SCHEMA
    )
    if not os.path.isdir(os.path.join(state_dir, "tombstones")):
        return codes
    # tombstones are tiny relative to codes: stats pick a broadcast
    # anti-join unhinted (the no-SF-scaling-broadcast-hint rule)
    return codes.join(
        _read_tombstones(spark, state_dir, as_of), "vec_id", "left_anti"
    )


def vector_index_search(
    spark: SparkSession, state_dir: str, queries: list
) -> DataFrame:
    """IVFADC retrieval over the PERSISTED index: per-query LUTs against
    the stored codebooks, <q, c(cell)> constants + probed-cell masks
    against the stored centroids, ONE Arrow scan of the codes with the
    shared `_adc_scan_kernel` (per-partition top-cand state, corpus
    never shuffled), exact-cosine refine over the tiny candidate set —
    similarity_ivfpq's query half pointed at parquet instead of a
    same-session encode."""
    return _search_codes_frame(
        spark, state_dir, queries, read_index_codes(spark, state_dir)
    )


def _search_codes_frame(
    spark: SparkSession, state_dir: str, queries: list, codes: DataFrame
) -> DataFrame:
    """The search half over an EXPLICIT codes frame — factored so the
    vacuum twin can serve the snapshotted pre-vacuum view through the
    byte-identical query path it serves the vacuumed state with (the
    candidate cut is per-partition, so a served list is only comparable
    across two states scanned under the same physical layout)."""
    import numpy as np

    from cqlcopy_spark.operators.similarity import (
        _IVF_NPROBE,
        _adc_refine_topk,
        _adc_scan_kernel,
        _query_luts,
    )

    coarse, books = _load_artifacts(spark, state_dir)
    probes, consts = [], []
    for _, x, _ in queries:
        d2 = ((coarse - x) ** 2).sum(axis=1)
        probes.append({int(c) for c in np.argsort(d2)[:_IVF_NPROBE]})
        consts.append(coarse @ x)
    const_all = (
        np.stack(consts) if consts else np.zeros((0, coarse.shape[0]))
    )
    bc = spark.sparkContext.broadcast(
        ([q for q, _, _ in queries], _query_luts(books, queries), const_all, probes)
    )
    cands = codes.mapInPandas(
        _adc_scan_kernel(bc), schema="q_id long, vec_id long, emb array<double>"
    )
    return _adc_refine_topk(spark, cands, queries)


def _state_tempdir() -> str:
    """Per-call state dir kept alive until interpreter exit — the
    returned frames read it lazily (stream_minhash_incremental's
    lifecycle)."""
    import atexit
    import shutil
    import tempfile

    state = tempfile.mkdtemp(prefix="vector_index_state_")
    atexit.register(shutil.rmtree, state, ignore_errors=True)
    return state


def _sliced_corpus(spark: SparkSession, sf_dir: str):
    """(embeddings frame, three vec_id-range slices) — the arrival order
    stream_minhash_incremental uses, so 'base' and 'appends' are
    deterministic functions of the fixture."""
    from cqlcopy_spark.operators.similarity import _emb_double

    from cqlcopy_spark.catalog import parquet_col_max

    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double("embedding").alias("emb")
    )
    # footer-stats max (exact, no Spark job — guide §6); Spark fallback
    # only when a row group lacks statistics
    mx = parquet_col_max(sf_dir, "embeddings", "vec_id")
    if mx is None:
        mx = e.agg(F.max("vec_id")).first()[0] or 0
    cuts = (mx // 3, 2 * (mx // 3))
    return e, (
        e.filter(col("vec_id") <= cuts[0]),
        e.filter((col("vec_id") > cuts[0]) & (col("vec_id") <= cuts[1])),
        e.filter(col("vec_id") > cuts[1]),
    )


def _incremental_index(spark: SparkSession, sf_dir: str):
    """(corpus frame, state dir) after build + two appends over the
    sliced corpus. Factored so the registered op and its verify twin
    drive the IDENTICAL persisted index — and so each registered entry
    runs the eager max(vec_id) slicing job ONCE (r13 review: calling
    _sliced_corpus again in the op re-scanned the corpus for nothing)."""
    e, (base, b1, b2) = _sliced_corpus(spark, sf_dir)
    state = _state_tempdir()
    vector_index_build(base, state)
    vector_index_append(b1, 1, state)
    vector_index_append(b2, 2, state)
    return e, state


@register("similarity_index_incremental")  # rows-only: IVF+PQ recall < 1
def similarity_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC top-k served from a PERSISTED incrementally-built index:
    the corpus arrives as three vec_id-sliced batches — the first trains
    and seeds the index, the next two are encoded with the stored
    codebooks and appended (no retrain, no historical re-encode) — and
    retrieval runs `_adc_scan_kernel` over the parquet codes.

    Rows-only by the same recall<1 argument as similarity_ivfpq; the
    exactness claims every emitted pair DOES make (bitwise-exact refined
    cosine, no self/zero-norm pairs, dense (cosine DESC, n_id) ranks,
    ≤ top-k per query) plus one-shot encode parity of the index itself
    are driver-checked by similarity_index_verify's empty-relation
    contract, and replay/idempotence is pinned in
    tests/test_vector_index.py."""
    from cqlcopy_spark.operators.similarity import _collect_queries

    e, state = _incremental_index(spark, sf_dir)
    # no trailing orderBy: the driver hash is order-insensitive and the
    # sort would add a second (range) exchange to a one-exchange plan
    return vector_index_search(spark, state, _collect_queries(e))


_INDEX_VERIFY_ORACLE = """
SELECT CAST(NULL AS BIGINT) AS vec_id, CAST(NULL AS VARCHAR) AS kind
WHERE 1 = 0
"""


@register("similarity_index_verify", oracle=_INDEX_VERIFY_ORACLE)
def similarity_index_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable proof that the incremental index IS the one-shot
    index: rebuild the persisted artifacts via base + two appends, then
    encode the FULL corpus in one pass with the SAME base-trained
    artifacts, and emit one row per violation —

    - 'missing': a corpus vec_id absent from the persisted codes;
    - 'extra':   a persisted vec_id absent from the corpus;
    - 'dup':     a vec_id indexed more than once (the first-delivery-
                 wins contract broken);
    - 'cell':    a stored coarse assignment differing from the one-shot
                 encode (same BLAS argmin, so bitwise by construction);
    - 'codes':   stored PQ codes differing from the one-shot encode
                 (same _pq_encode_batch IEEE sequence, ditto).

    Expected output: EMPTY against the empty-relation oracle — the
    driver turns any violation red. Batch-encode parity holds because
    appends are pure functions of (persisted codebooks, batch): nothing
    about arrival slicing can change a single code. Planted-corruption
    liveness (a corrupted delta row IS flagged) pins in
    tests/test_vector_index.py, as does search exactness via
    `_ann_violations` over the served top-k."""
    e, state = _incremental_index(spark, sf_dir)
    coarse, books = _load_artifacts(spark, state)
    # the one-shot side collapses duplicate ids with the SAME
    # deterministic keeper the build/append paths use, so the parity
    # claim is well-defined even on duplicate-id inputs
    oneshot = _encode_with(
        keep_min_by(e.select("vec_id", "emb"), "vec_id"), coarse, books
    ).select(
        "vec_id", col("cell").alias("o_cell"), col("codes").alias("o_codes")
    )
    stored = read_index_codes(spark, state).select("vec_id", "cell", "codes")

    dup = (
        stored.groupBy("vec_id")
        .count()
        .filter(col("count") > 1)
        .select("vec_id", F.lit("dup").alias("kind"))
    )
    joined = oneshot.join(stored, "vec_id", "full_outer")
    missing = joined.filter(col("cell").isNull()).select(
        "vec_id", F.lit("missing").alias("kind")
    )
    extra = joined.filter(col("o_cell").isNull()).select(
        "vec_id", F.lit("extra").alias("kind")
    )
    both = joined.filter(col("cell").isNotNull() & col("o_cell").isNotNull())
    cell_bad = both.filter(col("cell") != col("o_cell")).select(
        "vec_id", F.lit("cell").alias("kind")
    )
    codes_bad = both.filter(col("codes") != col("o_codes")).select(
        "vec_id", F.lit("codes").alias("kind")
    )
    # no trailing orderBy (CLAUDE.md): an empty relation needs no sort
    return (
        dup.unionByName(missing)
        .unionByName(extra)
        .unionByName(cell_bad)
        .unionByName(codes_bad)
    )


# ---------------------------------------------------------------------------
# Deletes: tombstone deltas — the index lifecycle's retire half
# ---------------------------------------------------------------------------


def vector_index_delete(
    vec_ids: DataFrame, batch_id: int, state_dir: str
) -> None:
    """Retire vectors from the index: append a TOMBSTONE delta
    (vec_id-keyed, overwrite-on-replay like every other delta) instead
    of rewriting any code file — the versioned-state discipline
    compact_cdc_tombstones (streaming/sinks.py) already proves for CDC
    rows, applied to the vector index.

    Semantics: a tombstone wins FOREVER. Readers resolve
    codes ANTI-JOIN tombstones; appends consult codes ∪ tombstones in
    their first-delivery guard, so a re-add of a retired id is dropped —
    re-introducing a vector is INSERT under a fresh id, the same
    revise-model as the doc/minhash sinks. Permanence (not last-writer
    timestamps) is what keeps every reader one keys-only anti-join, and
    it is what makes the offline compaction lever safe: a compaction
    that physically prunes tombstoned code rows AND their tombstones
    can only be correct if no later delta ever re-admits the id — the
    exact invariant similarity_index_delete_verify's 'resurrected'
    check enforces at the raw-delta level.

    Scale shape: a delete costs one batch-sized delta write; reads add
    ONE anti-join against the compacted tombstone set (tiny relative to
    codes, broadcast by stats); physical pruning is an offline
    index-version swap, never a read-path concern."""
    from cqlcopy_spark.streaming.sinks import _apply_epoch, _maybe_compact_index

    spark = vec_ids.sparkSession
    batch_id = _apply_epoch(state_dir, batch_id)
    tomb_root = os.path.join(state_dir, "tombstones")
    _below_floor_guard(tomb_root, batch_id, "vector_index_delete")
    _maybe_compact_index(spark, tomb_root, batch_id, "vec_id long", ["vec_id"])
    vec_ids.select("vec_id").dropDuplicates(["vec_id"]).write.mode(
        "overwrite"
    ).parquet(os.path.join(tomb_root, f"delta={batch_id}"))


def _read_tombstones(
    spark: SparkSession, state_dir: str, below_batch: int = 1 << 62
) -> DataFrame:
    from cqlcopy_spark.streaming.sinks import _read_index_deltas

    return _read_index_deltas(
        spark, os.path.join(state_dir, "tombstones"), below_batch, "vec_id long"
    )


def _rows_with_batch(spark: SparkSession, root: str, schema: str) -> DataFrame:
    """(vec_id, b) provenance over the RAW deltas of an index root —
    compactions are skipped on purpose: deltas stay on disk as replay
    truth, and provenance is exactly what compaction erases. Driver
    state is one os.listdir (bounded by the delta count, which the
    compaction cadence keeps O(batches) on disk but the LOOP here only
    builds a union plan — rows never collect)."""
    from cqlcopy_spark.streaming.sinks import _delta_ids

    frames = [
        spark.read.schema(schema)
        .parquet(os.path.join(root, f"delta={b}"))
        .select("vec_id", F.lit(b).alias("b"))
        for b in _delta_ids(root, 1 << 62)
    ]
    if not frames:
        return spark.createDataFrame([], "vec_id long, b int")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def _lifecycle_state(spark: SparkSession, sf_dir: str):
    """(corpus frame, state dir) after build -> append ->
    delete(pmod 3 == 1) -> poisoned re-adds + final append, in a fresh
    temp state dir — factored so the liveness test can corrupt the same
    lifecycle the twin checks (and so the twin runs the eager slicing
    job once, r13 review)."""
    e, state, _ = _lifecycle_state_and_final(spark, sf_dir)
    return e, state


def _lifecycle_state_and_final(spark: SparkSession, sf_dir: str):
    """(corpus, state dir, final-batch payload): the delete lifecycle
    plus the exact frame its last append delivered — the branch twin
    re-delivers it to a fork, and the replay test rebuilds it."""
    e, (base, b1, b2) = _sliced_corpus(spark, sf_dir)
    state = _state_tempdir()
    vector_index_build(base, state)
    vector_index_append(b1, 1, state)
    doomed = (
        base.unionByName(b1)
        .select("vec_id")
        .filter(F.pmod(col("vec_id"), F.lit(3)) == 1)
    )
    vector_index_delete(doomed, 2, state)
    # poisoned re-adds: every deleted id returns with a shifted
    # embedding inside the next batch — the tombstone must win
    poisoned = (
        base.unionByName(b1)
        .join(doomed, "vec_id", "left_semi")
        .selectExpr("vec_id", "transform(emb, x -> x + 1.0) AS emb")
    )
    final = poisoned.unionByName(b2)
    vector_index_append(final, 3, state)
    return e, state, final


def _delete_violations(
    spark: SparkSession, corpus: DataFrame, state: str
) -> DataFrame:
    """The five lifecycle violation families over an existing state dir
    (see similarity_index_delete_verify for the kind semantics) —
    factored so tests/test_vector_index_delete.py can corrupt a delta
    and assert the exact planted rows come back."""
    coarse, books = _load_artifacts(spark, state)
    tombs = _read_tombstones(spark, state)
    survivors = corpus.join(tombs, "vec_id", "left_anti")
    oneshot = _encode_with(
        keep_min_by(survivors.select("vec_id", "emb"), "vec_id"), coarse, books
    ).select("vec_id", col("cell").alias("o_cell"), col("codes").alias("o_codes"))
    stored = read_index_codes(spark, state).select("vec_id", "cell", "codes")

    codes_prov = _rows_with_batch(
        spark, os.path.join(state, "codes"), _CODES_SCHEMA
    )
    tomb_prov = _rows_with_batch(
        spark, os.path.join(state, "tombstones"), "vec_id long"
    ).select("vec_id", col("b").alias("tb"))
    resurrected = (
        codes_prov.join(tomb_prov, "vec_id")
        .filter(col("b") > col("tb"))
        .select("vec_id", F.lit("resurrected").alias("kind"))
    )
    dup = (
        stored.groupBy("vec_id")
        .count()
        .filter(col("count") > 1)
        .select("vec_id", F.lit("dup").alias("kind"))
    )
    joined = oneshot.join(stored, "vec_id", "full_outer")
    lost = joined.filter(col("cell").isNull()).select(
        "vec_id", F.lit("lost").alias("kind")
    )
    # 'extra': a stored id with NO survivor-corpus counterpart — a
    # phantom vector that exists in no corpus row and no tombstone
    # (tombstoned ids are already masked out of `stored`), e.g. a
    # corrupted delta injecting a fabricated vec_id. Without this
    # family such a row matched neither 'lost' (stored side non-NULL)
    # nor 'mutated' (one-shot side NULL) and the twin stayed silent
    # while searches served it (r13 review finding).
    extra = joined.filter(col("o_cell").isNull()).select(
        "vec_id", F.lit("extra").alias("kind")
    )
    mutated = joined.filter(
        col("cell").isNotNull()
        & col("o_cell").isNotNull()
        & ((col("cell") != col("o_cell")) | (col("codes") != col("o_codes")))
    ).select("vec_id", F.lit("mutated").alias("kind"))
    # no trailing orderBy (CLAUDE.md): an empty relation needs no sort
    return (
        resurrected.unionByName(dup)
        .unionByName(lost)
        .unionByName(extra)
        .unionByName(mutated)
    )


# ---------------------------------------------------------------------------
# Vacuum: the offline index-version swap that physically prunes
# tombstoned rows (the lever vector_index_delete's docstring promises)
# ---------------------------------------------------------------------------


def vector_index_vacuum(
    spark: SparkSession, state_dir: str, bump_epoch: bool = False
) -> int:
    """Physically prune tombstoned code rows AND their tombstones by
    writing the current reader view (codes ANTI-JOIN tombstones) as a
    new compaction version of the codes index, stamped strictly ABOVE
    every existing delta — the version-swap lever the delete docstring
    promises, on compact_cdc_tombstones' discipline (streaming/sinks.py:
    offline, between batches, caller owns the horizon claim). Returns
    the number of code rows pruned.

    What changes and for whom:
    - Readers at-or-above the new version (every future read: searches,
      appends' first-delivery guard, read_index_codes) see the pruned
      codes plus an EMPTY tombstone compaction — the codes scan stops
      carrying dead rows and the per-read tombstone anti-join's build
      side stops growing with lifetime deletes.
    - RAW deltas (codes AND tombstones) are RETAINED as replay truth:
      a same-checkpoint replay of any batch b reads compactions ≤ b
      and raw deltas — never the vacuum version stamped above it — so
      it re-derives from exactly the state it saw the first time
      (_read_index_deltas' out-of-order contract), and
      _rows_with_batch provenance (the delete twin's 'resurrected'
      check) still sees every historical write.

    Monotone-log requirement: the vacuum version is stamped strictly
    ABOVE every existing delta and compaction, so every post-vacuum
    writer must carry a batch id above it — automatic when appends,
    deletes and the vacuum share one monotone numbering (the offline-
    between-batches contract). A first-time write numbered below the
    stamp would be invisible to every reader (the compact-floor read);
    _below_floor_guard turns that silent loss into an error while still
    admitting legitimate out-of-order REPLAYS (their delta dirs exist).

    The horizon claim (caller-owned, the lakehouse-VACUUM contract):
    pruning a tombstone removes it from the append guard, so the caller
    asserts no producer will ever re-deliver an id retired before the
    vacuum. If a producer breaks that claim the re-add LANDS — which is
    exactly why the claim is checkable after the fact: the raw-delta
    'resurrected' invariant flags it (reader-level checks cannot, by
    construction — tests/test_vector_index_vacuum.py plants one).

    Crash safety: the new codes version is a Spark overwrite write
    (_SUCCESS-gated — a partial dir is ignored by _compact_versions and
    overwritten on retry); superseded versions are removed only after
    it lands; the tombstone side is swapped last. A crash between the
    two swaps leaves pruned codes + full tombstones — a consistent,
    merely unvacuumed-tombstone state; re-running the vacuum completes
    it (idempotent; a re-run over a clean state is a no-op fast path).

    Implementation is the shared vacuum_masked_root discipline
    (streaming/sinks.py) — one code path for every (data, mask)
    delta-log pair (curation_vacuum is the other instance).

    bump_epoch=True additionally raises the state dir's persisted log
    epoch to the vacuum stamp (bump_log_epoch), which lets the SAME
    checkpoint resume ingest afterwards; the default keeps the no-epoch
    behavior (a resumed checkpoint fails loudly at _below_floor_guard).
    Quiescence contract: see bump_log_epoch."""
    from cqlcopy_spark.streaming.sinks import bump_log_epoch, vacuum_masked_root

    n = vacuum_masked_root(
        spark,
        os.path.join(state_dir, "codes"),
        os.path.join(state_dir, "tombstones"),
        _CODES_SCHEMA,
        "vec_id",
        ["vec_id"],
    )
    if bump_epoch:
        bump_log_epoch(
            state_dir,
            [os.path.join(state_dir, sub) for sub in ("codes", "tombstones")],
        )
    return n


def vector_index_clone(
    spark: SparkSession, src: str, dst: str, as_of: int
) -> None:
    """BRANCH the persisted index at an as-of point (the curation
    clone's discipline on the (codes, tombstones) pair): the trunk's
    header artifacts are copied — the branch keeps encoding with the
    TRUNK'S codebooks, the FAISS clone semantics, which is what makes
    identical payloads encode identically across the fork — the as-of
    codes and tombstone file sets are copied verbatim (zero-copy fork,
    r16 — see clone_state_roots), and the branch epoch is persisted =
    the fork point so a brand-new checkpoint's batch 0 lands exactly
    there. Fork cost: driver-side file copies only, ZERO Spark jobs;
    the trunk is never touched."""
    import shutil

    from cqlcopy_spark.streaming.sinks import clone_state_roots

    os.makedirs(dst, exist_ok=True)
    for name in ("centroids.parquet", "codebooks.parquet"):
        # temp-name + os.replace: same crash discipline as the build's
        # header writes — a torn codebooks copy is a corrupt 'trained'
        # sentinel that flips replays onto the append path
        tmp = os.path.join(dst, name + ".tmp")
        shutil.copyfile(os.path.join(src, name), tmp)
        os.replace(tmp, os.path.join(dst, name))
    clone_state_roots(
        spark,
        src,
        dst,
        as_of,
        (("codes", _CODES_SCHEMA, ["vec_id"]), ("tombstones", "vec_id long", ["vec_id"])),
    )


@register("similarity_index_branch_verify", oracle=_INDEX_VERIFY_ORACLE)
def similarity_index_branch_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fork faithfulness for the vector index, as violations vs the
    EMPTY relation: run the full delete lifecycle on a trunk, fork at
    batch 3 (post-delete, pre-final-append), re-deliver the trunk's
    exact final batch to the BRANCH as a brand-new checkpoint's batch 0
    (the branch epoch maps it onto the fork point), and diff the two
    reader views row-for-row in both directions. Equality requires four
    things at once: the as-of fork captured the exact pre-final state,
    the copied codebooks encode the payload identically on both sides
    (centroid/codebook drift would flip cells or codes), the branch's
    first-delivery guard consults the cloned tombstones (the batch's
    poisoned re-adds of deleted ids must be dropped on the branch too),
    and the epoch mapping filed the branch delta where readers resolve
    it. kinds: missing_in_branch / extra_in_branch — full-row diffs, so
    a single flipped code byte fires.

    Planted-corruption liveness + divergence isolation are pinned in
    tests/test_vector_index_branch.py; this twin is the driver-checked
    (empty-relation hash) surface."""
    e, trunk, final = _lifecycle_state_and_final(spark, sf_dir)
    branch = _state_tempdir()
    vector_index_clone(spark, trunk, branch, as_of=3)
    vector_index_append(final, 0, branch)  # fresh checkpoint numbering
    return _branch_violations(spark, trunk, branch)


def _branch_violations(
    spark: SparkSession, trunk: str, branch: str
) -> DataFrame:
    """Row-level reader-view diff of two index states — factored so the
    liveness test can corrupt the branch and assert the planted rows
    come back."""
    t = read_index_codes(spark, trunk)
    b = read_index_codes(spark, branch)
    missing = t.exceptAll(b).select(
        "vec_id", F.lit("missing_in_branch").alias("kind")
    )
    extra = b.exceptAll(t).select(
        "vec_id", F.lit("extra_in_branch").alias("kind")
    )
    return missing.unionByName(extra)


def _read_index_deltas_codes(spark: SparkSession, state_dir: str) -> DataFrame:
    """The cumulative codes state WITHOUT the tombstone mask — the
    physical row set read_index_codes starts from."""
    from cqlcopy_spark.streaming.sinks import _read_index_deltas

    return _read_index_deltas(
        spark, os.path.join(state_dir, "codes"), 1 << 62, _CODES_SCHEMA
    )


@register("similarity_index_vacuum_verify", oracle=_INDEX_VERIFY_ORACLE)
def similarity_index_vacuum_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract of the vacuum swap over the full delete
    lifecycle (build → append → delete → poisoned re-adds → append →
    VACUUM) — one row per violation against the empty relation:

    - 'search_drift': a served (q_id, n_id, cosine, rank) row present on
      only one side of the swap — the vacuumed index must serve
      byte-identical results. The comparison serves the SNAPSHOTTED
      pre-vacuum view through the identical query path and identical
      physical layout (the ADC candidate cut is per-partition, so a
      live multi-delta pre state packs into different scan partitions
      than the compacted post state and drifts for reasons the vacuum
      does not own — caught at sf0.01);
    - 'view_drift': a reader-view codes row (vec_id, emb, cell, codes)
      on only one side — bitwise invariance of the full visible corpus,
      which subsumes lost/extra/mutated/dup in one exceptAll pair (the
      pre view is snapshotted to parquet inside the temp state dir, not
      collected: it is corpus-sized);
    - 'dead_row': a tombstoned id PHYSICALLY present in the post-vacuum
      compacted codes — the vacuousness guard: without it a no-op
      vacuum would pass both drift checks trivially;
    - 'tombstone_residue': a reader-visible tombstone surviving the
      swap — the anti-join build side must be empty after vacuum.

    What this twin deliberately does NOT claim: that a retired id can
    never return POST-vacuum. Pruning the tombstone removes it from the
    append guard by design (the caller-owned horizon claim), and a
    reader-level check here would be vacuous anyway (the masked layer
    is gone). The raw-delta 'resurrected' invariant remains the
    checkable truth and tests/test_vector_index_vacuum.py plants a
    post-vacuum re-add to prove it fires.

    Expected output: EMPTY."""
    from cqlcopy_spark.operators.similarity import _collect_queries

    e, state = _lifecycle_state(spark, sf_dir)
    qlist = _collect_queries(e)
    pre_view_dir, raw_tombs = _pre_vacuum_snapshot(spark, state)
    vector_index_vacuum(spark, state)
    return _vacuum_violations(spark, state, qlist, pre_view_dir, raw_tombs)


def _pre_vacuum_snapshot(spark: SparkSession, state: str):
    """(view snapshot dir, raw tombstone frame) captured BEFORE the
    swap: the corpus-sized reader view is snapshotted to parquet inside
    the temp state dir (never collected) under the vacuum's EXACT
    physical layout recipe — hash-clustered and sorted on vec_id — so
    serving the snapshot and serving the vacuumed state scan identical
    partitions and the per-partition candidate cut cannot manufacture
    drift (the ADC scan's served list is layout-dependent by design;
    first caught at sf0.01 where the multi-delta pre state and the
    single-dir vacuumed state packed differently). The raw tombstones
    are persisted and materialized now because the swap empties the
    reader-visible set they derive from."""
    pre_view_dir = os.path.join(state, "pre_vacuum_view")

    def _snapshot_view() -> None:
        (
            read_index_codes(spark, state)
            .repartition("vec_id")
            .sortWithinPartitions("vec_id")
            .write.mode("overwrite")
            .parquet(pre_view_dir)
        )

    raw_tombs = _read_tombstones(spark, state).persist()
    # the corpus-view snapshot write and the tombstone materialization
    # are independent read-only jobs over the pre-vacuum state — overlap
    # them (guide §2.6); both must complete before the swap empties what
    # they derive from (the pool join below guarantees exactly that)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(_snapshot_view), pool.submit(raw_tombs.count)]
        for f in futs:
            f.result()
    return pre_view_dir, raw_tombs


def _vacuum_violations(
    spark: SparkSession,
    state: str,
    qlist: list,
    pre_view_dir: str,
    raw_tombs: DataFrame,
) -> DataFrame:
    """The four post-swap violation families over an existing vacuumed
    state dir (kind semantics in similarity_index_vacuum_verify) —
    factored so tests/test_vector_index_vacuum.py can corrupt the
    vacuumed state and assert the exact planted rows come back."""
    # both searches feed BOTH exceptAll directions: persist and
    # materialize (≤ Q×k rows each) or the two drift branches recompute
    # the whole scan+refine lineage per direction (the cache-race rule —
    # see similarity._retrieval_metrics)
    post_search = vector_index_search(spark, state, qlist).persist()
    pre_search = _search_codes_frame(
        spark,
        state,
        qlist,
        spark.read.schema(_CODES_SCHEMA).parquet(pre_view_dir),
    ).persist()
    # the two search pipelines are independent (vacuumed state vs the
    # parquet snapshot) — materialize them CONCURRENTLY (guide §2.6) so
    # each scan's stragglers back-fill the other's idle cores
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        list(pool.map(lambda f: f.count(), (post_search, pre_search)))
    search_drift = (
        pre_search.exceptAll(post_search)
        .unionByName(post_search.exceptAll(pre_search))
        .select(col("n_id").alias("vec_id"), F.lit("search_drift").alias("kind"))
    )
    # the views are single parquet scans (plus one broadcast anti-join
    # on the post side) — cheaper to scan twice than to cache a
    # corpus-sized relation, so they stay unpersisted on purpose
    post_view = read_index_codes(spark, state)
    pre_view = spark.read.schema(_CODES_SCHEMA).parquet(pre_view_dir)
    view_drift = (
        pre_view.exceptAll(post_view)
        .unionByName(post_view.exceptAll(pre_view))
        .select("vec_id", F.lit("view_drift").alias("kind"))
    )
    dead = (
        _read_index_deltas_codes(spark, state)
        .join(raw_tombs, "vec_id", "left_semi")
        .select("vec_id", F.lit("dead_row").alias("kind"))
    )
    residue = _read_tombstones(spark, state).select(
        "vec_id", F.lit("tombstone_residue").alias("kind")
    )
    # no trailing orderBy (CLAUDE.md): an empty relation needs no sort
    return (
        search_drift.unionByName(view_drift)
        .unionByName(dead)
        .unionByName(residue)
    )


# ---------------------------------------------------------------------------
# Promotion gate: retrieval quality of the PERSISTED index
# ---------------------------------------------------------------------------


@register("similarity_index_eval")  # rows-only: IVF/PQ list isn't SQL-expressible
def similarity_index_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion gate for the persisted incremental index — the index a
    production loop would actually swap into serving: recall@k /
    precision@k / MRR of vector_index_search's served list against the
    exact top-k ground truth, via the LITERAL metric kernel the fully-
    oracled grid evaluation is driver-hash-checked on
    (similarity._retrieval_metrics — r13 VERDICT item 6, the
    retrieval_eval_metrics factoring), so the gate's arithmetic cannot
    drift from the verified one. Rows-only because the IVF/PQ candidate
    list isn't SQL-expressible (trained artifacts); the metric
    arithmetic itself is pinned by the pure-Python recompute in
    tests/test_index_eval.py (the test_retrieval_eval.py contract) and
    every served pair's exactness by similarity_index_verify.

    Scale shape: both inputs are ≤ Q×k relations (the search's one-scan
    plan and the exact side's broadcast-Q scan carry the corpus cost);
    the metrics are three Q-sized aggregates and two Q-key joins."""
    from cqlcopy_spark.operators.similarity import (
        _collect_queries,
        _dense_topk,
        _retrieval_metrics,
    )

    e, state = _incremental_index(spark, sf_dir)
    ann = vector_index_search(spark, state, _collect_queries(e))
    return _retrieval_metrics(ann, _dense_topk(spark, sf_dir))


@register("similarity_index_delete_verify", oracle=_INDEX_VERIFY_ORACLE)
def similarity_index_delete_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract of the index's FULL lifecycle —
    build → append → DELETE → poisoned re-adds → append — one row per
    violation against the empty relation:

    - 'resurrected': a RAW codes delta written AFTER an id's tombstone
      batch contains that id (the first-delivery guard failed; the
      lifecycle re-delivers every deleted id with a shifted embedding
      to force the attempt). Reader-level exclusion is vacuous to test —
      the anti-join hides tombstoned ids BY CONSTRUCTION — but this raw
      invariant is what makes tombstone-pruning compaction safe;
    - 'lost':     a surviving corpus id missing from the reader view;
    - 'extra':    a stored id with no corpus counterpart and no
      tombstone — a phantom the searches would serve (r13 review);
    - 'dup':      a surviving id visible more than once;
    - 'mutated':  a surviving row whose (cell, codes) differ from the
      one-shot encode of the SURVIVOR set with the same base-trained
      artifacts (deletes must not perturb anything they didn't target).

    Expected output: EMPTY. Replay idempotence and planted-corruption
    liveness pin in tests/test_vector_index_delete.py."""
    e, state = _lifecycle_state(spark, sf_dir)
    return _delete_violations(spark, e, state)
