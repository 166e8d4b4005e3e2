"""Source/sink format surface beyond CSV (SURVEY.md §2A ops 1/20
generalized): JSONL roundtrip and partition-pruned parquet layout.

The reference moves data only as CSV↔Cassandra; a Spark-native engine
gets every columnar/semi-structured format through the same DataFrame
reader/writer API. These queries prove the two properties that matter
operationally:

- lossless roundtrip (schema-first read back of what we wrote, exact to
  the driver's value hash, doubles included), and
- a partition layout the scan planner actually prunes (the difference
  between reading one directory and reading 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import register

_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

_EVENTS_IDENTITY_ORACLE = (
    "SELECT event_id, ts, user_id, event_type, value, props FROM events"
)


def _stage(sf_dir: str, leaf: str) -> str:
    return os.path.join("/tmp/cqlcopy_spark", leaf, os.path.basename(sf_dir.rstrip("/")))


@register("jsonl_roundtrip", oracle=_EVENTS_IDENTITY_ORACLE)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON Lines → schema-first read back → identical table.
    Doubles survive (Jackson shortest-round-trip text), NTZ timestamps
    survive via the default ISO micro format, and the embedded-JSON
    `props` string survives as an escaped string (it is data, not
    structure, until from_json is applied — multimodal_props does that).
    Both legs are shuffle-free full-width scans; JSONL is splittable, so
    the read parallelizes per block at any scale."""
    out = _stage(sf_dir, "jsonl")
    e = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    # Default NTZ JSON format truncates to milliseconds — pin micros.
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    e.write.mode("overwrite").option("timestampNTZFormat", fmt).json(out)
    return (
        spark.read.schema(_EVENTS_SCHEMA)
        .option("timestampNTZFormat", fmt)
        .json(out)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )


@register("xml_roundtrip", oracle=_EVENTS_IDENTITY_ORACLE)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → XML (Spark 4's built-in source) → schema-first read back
    → identical table. XML is the interchange format enterprise feeds
    still arrive in; the row-tag reader splits files and parallelizes
    like any text source. Doubles survive (shortest-round-trip text),
    NTZ timestamps are pinned to the micro format on both legs, and the
    JSON-in-a-string `props` column round-trips through XML escaping —
    three nested quoting layers deep, which is exactly what an identity
    oracle is for."""
    out = _stage(sf_dir, "xml")
    e = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    (
        e.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "events")
        .option("rowTag", "event")
        .option("timestampNTZFormat", fmt)
        .save(out)
    )
    return (
        spark.read.format("xml")
        .schema(_EVENTS_SCHEMA)
        .option("rowTag", "event")
        .option("timestampNTZFormat", fmt)
        .load(out)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )


@register("orc_roundtrip", oracle=_EVENTS_IDENTITY_ORACLE)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → ORC → read back → identical table. The oracle reads the
    ORIGINAL parquet fixture, so this checks cross-format losslessness
    end-to-end (DuckDB never sees the ORC). ORC is the second columnar
    format a lake migration typically touches; Spark's reader/writer
    make it a one-line swap, splits and pushdown included."""
    out = _stage(sf_dir, "orc")
    e = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    e.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


_PRUNE_ORACLE = """
SELECT event_id, ts, user_id, value, event_type
FROM events WHERE event_type = 'purchase'
"""


@register("partitioned_scan_prune", oracle=_PRUNE_ORACLE)
def partitioned_scan_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events hive-partitioned by event_type, read back only the
    purchase partition. The filter binds to the DIRECTORY layout
    (PartitionFilters in the scan, asserted by tests/test_plans.py) —
    at 100 TB the other partitions' files are never opened, the scan
    cost is proportional to the selected slice. This is the layout
    decision (partition on the coarse, always-filtered key) that no
    downstream optimizer can recover if skipped at write time."""
    out = _stage(sf_dir, "partitioned")
    e = table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value", "event_type"
    )
    e.write.mode("overwrite").partitionBy("event_type").parquet(out)
    return (
        spark.read.parquet(out)
        .filter(col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "value", "event_type")
    )


# ---------------------------------------------------------------------------
# binary_roundtrip — opaque binary blobs via the binaryFile source
# ---------------------------------------------------------------------------

_N_BLOBS = 50  # fixed doc subset staged as one blob file each

_BINARY_ORACLE = f"""
SELECT 'doc_' || lpad(CAST(doc_id AS VARCHAR), 5, '0') || '.bin' AS fname,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
WHERE doc_id < {_N_BLOBS}
ORDER BY fname
"""


@register("binary_roundtrip", oracle=_BINARY_ORACLE)
def binary_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal ingestion front door: opaque per-object files
    (images/audio/video in production) read as whole blobs with
    spark.read.format("binaryFile") → (path, length, content binary).
    Staging writes a fixed small doc subset as one .bin file per doc —
    test plumbing only; at scale the blobs already sit in object
    storage and this operator is read-only. The read is one task per
    file (binaryFile is non-splittable by design — a blob is an atom),
    so parallelism = file count; downstream feature extraction stays in
    Arrow batches (multimodal_features). Verified end-to-end: filename,
    byte length, and content digest against DuckDB's read_blob on the
    same files."""
    import shutil

    docs = (
        table(spark, sf_dir, "documents")
        .filter(col("doc_id") < _N_BLOBS)
        .select("doc_id", "text")
    )
    out = _stage(sf_dir, "blobs")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    # Driver-side staging loop: bounded at _N_BLOBS tiny files by
    # construction (test fixture generation, not a data path).
    for r in docs.collect():
        with open(os.path.join(out, f"doc_{r['doc_id']:05d}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))

    blobs = spark.read.format("binaryFile").load(out)
    return (
        blobs.select(
            F.element_at(F.split(col("path"), "/"), -1).alias("fname"),
            col("length").alias("n_bytes"),
            F.md5(col("content")).alias("content_md5"),
        )
        .orderBy("fname")
    )


# ---------------------------------------------------------------------------
# json_props_stats — schema-on-read JSON extraction + rollup
# ---------------------------------------------------------------------------

_JSON_ORACLE = """
WITH j AS (
  SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events
)
SELECT event_type,
       COUNT(*) AS n,
       COUNT(k) AS n_with_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE) / COUNT(k) AS avg_k
FROM j
GROUP BY 1
ORDER BY 1
"""


@register("json_props_stats", oracle=_JSON_ORACLE)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the JSON `props` column: extract $.k with
    get_json_object (DuckDB: ->> path), aggregate per event type. The
    extraction is a pure codegen string op — the JSON never leaves the
    JVM and the scan still prunes to (event_type, props). Integer k
    keeps every aggregate exact; the mean is one int→double division.
    Malformed/missing JSON yields NULL k (counted by n − n_with_k),
    which is the PERMISSIVE contract the rest of the engine uses."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# layout_zorder — space-filling-curve clustering for multi-column pruning
# ---------------------------------------------------------------------------

_Z_BITS = 16


def _z_expr_sql(x: str, y: str) -> str:
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


_ZX = "((o_custkey - cx.lo) * 65535 // greatest(cx.hi - cx.lo, 1))"
_ZY = "((o_orderkey - cy.lo) * 65535 // greatest(cy.hi - cy.lo, 1))"

_ZORDER_ORACLE = f"""
WITH cx AS (SELECT MIN(o_custkey) AS lo, MAX(o_custkey) AS hi FROM orders),
cy AS (SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders),
z AS (
  SELECT o_orderkey, o_custkey,
         {_z_expr_sql(_ZX, _ZY)} AS zval
  FROM orders, cx, cy
)
SELECT o_orderkey, o_custkey, zval FROM z
ORDER BY zval, o_orderkey
"""


@register("layout_zorder", oracle=_ZORDER_ORACLE)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over two predicate columns — the
    data-LAYOUT operator behind multi-dimensional pruning at 100 TB:
    rewrite a table sorted by the interleaved bits of its two hottest
    filter columns and every parquet row group becomes a tight
    rectangle in (custkey, orderkey) space, so min/max statistics prune
    scans on EITHER column (a plain sort prunes only its leading
    column). Each column is min-max-normalized to the full 16-bit grid
    first — interleaving RAW values lets the wider domain's high bits
    dominate the ordering and degrade to a single-column sort (the
    classic z-order pitfall; production rewrites use range-ids the same
    way). All-integer: normalize is exact BIGINT math off two 1-row
    min/max scalars, the interleave is 32 shift/mask terms — pure
    codegen, identical in both engines; the global sort is Spark's
    sampled range partitioning, the same mechanism a real OPTIMIZE
    ZORDER rewrite rides. o_orderkey tiebreak keeps the order total."""
    o = table(spark, sf_dir, "orders")
    lox, hix, loy, hiy = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_orderkey"), F.max("o_orderkey")
    ).first()
    # integer DIV on both sides — a double divide + floor can disagree
    # with // at exact-quotient boundaries by one ulp
    x = F.expr(f"(o_custkey - {lox}) * 65535 DIV {max(hix - lox, 1)}")
    y = F.expr(f"(o_orderkey - {loy}) * 65535 DIV {max(hiy - loy, 1)}")
    zval = None
    for b in range(_Z_BITS):
        tx = F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        ty = F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        term = tx + ty
        zval = term if zval is None else zval + term
    return (
        o.select("o_orderkey", "o_custkey", zval.alias("zval"))
        .orderBy("zval", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# layout_compact_plan — small-partition bin-packing (OPTIMIZE planner)
# ---------------------------------------------------------------------------

# The planning half of a compaction pass (Delta OPTIMIZE / Iceberg
# rewrite_data_files): group undersized partitions into target-sized
# output bins so a rewrite job can coalesce each bin with one task.
# Here the partition unit is the (source, lang) slice of documents and
# the size measure is row count; on a real lake the same plan runs over
# the file listing with byte sizes — identical window arithmetic.

_COMPACT_TARGET_ROWS = 4_096

_COMPACT_ORACLE = f"""
WITH s AS (
  SELECT source, lang, COUNT(*) AS n_rows
  FROM documents GROUP BY 1, 2
),
c AS (
  SELECT source, lang, n_rows,
         SUM(n_rows) OVER (ORDER BY source, lang
                           ROWS UNBOUNDED PRECEDING) AS cum_rows
  FROM s
)
SELECT source, lang, n_rows,
       CAST((cum_rows - n_rows) // {_COMPACT_TARGET_ROWS} AS BIGINT) AS bin,
       CAST(cum_rows - n_rows AS BIGINT) AS bin_start_row
FROM c
ORDER BY source, lang
"""


@register("layout_compact_plan", oracle=_COMPACT_ORACLE)
def layout_compact_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential first-fit bin packing of partition slices into
    ~4k-row compaction bins: cumulative row count over the slices in
    (source, lang) order, bin = the starting offset's target-size
    quotient. A slice larger than the target gets its own bin(s) —
    the quotient formula handles it without a special case.

    Plan: one shuffle to the slice-count aggregate (map-side partial),
    then a running-sum window over the SLICE table — partition-count
    sized, orders of magnitude smaller than the data, which is why
    compaction planning is cheap even when the rewrite it drives is
    not. The executing rewrite is `repartitionByRange(bin)` + write
    with maxRecordsPerFile, reusing layout_zorder's write path. All
    integer arithmetic; the bin quotient is explicit FLOOR division on
    both sides — DuckDB's `/` on BIGINT is FLOAT division and CAST
    rounds half away from zero, so the oracle must use `//` (a slice
    ending past the .5 point of a bin would otherwise round up and
    disagree with Spark's floor; fixture slices never cross a bin at
    sf0.01, which is exactly why this latent divergence needed fixing
    by inspection rather than by a red driver row)."""
    s = (
        table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = Window.orderBy("source", "lang").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = s.withColumn("cum_rows", F.sum("n_rows").over(w))
    start = col("cum_rows") - col("n_rows")
    return c.select(
        "source",
        "lang",
        "n_rows",
        F.floor(start / F.lit(_COMPACT_TARGET_ROWS)).cast("long").alias("bin"),
        start.cast("long").alias("bin_start_row"),
    ).orderBy("source", "lang")


# ---------------------------------------------------------------------------
# layout_zorder_stats — per-file skipping statistics of the Z-ordered layout
# ---------------------------------------------------------------------------

# Companion to layout_zorder above: that operator produces the row-level
# Morton clustering KEY (the rewrite's sort key); this one produces what
# the scan planner actually consumes — per-FILE min/max statistics under
# a z-PREFIX file assignment (no global sort: the prefix bucket is a
# pure map, and OPTIMIZE-style bin packing — layout_compact_plan —
# evens file sizes downstream). Each file covers a small RANGE OF BOTH
# dimensions at once, so min/max stats prune point/range queries on
# EITHER dimension, where a single-column sort gives perfect stats on
# one dimension and useless ones on the other. Pure integer bit
# arithmetic (shifts/masks < 2^32, shared _Z_BITS grid), identical in
# both engines → fully value-hash oracled; the pruning-power assertion
# vs a linear layout lives in tests/test_zorder.py.

_Z_PREFIX = 6  # files = z >> (2*BITS - PREFIX)  → up to 2^PREFIX files


def _zorder_oracle() -> str:
    # reuse the one Morton-interleave contract (_z_expr_sql) — two
    # copies over the shared _Z_BITS grid would have to stay in sync
    z = "(" + _z_expr_sql("d1", "d2") + ")"
    shift = 2 * _Z_BITS - _Z_PREFIX
    top = (1 << _Z_BITS) - 1
    return f"""
WITH raw AS (
  SELECT event_id,
         user_id AS r1,
         epoch_us(ts) // 3600000000 AS r2
  FROM events
),
ext AS (
  SELECT MIN(r1) AS lo1, GREATEST(MAX(r1) - MIN(r1), 1) AS sp1,
         MIN(r2) AS lo2, GREATEST(MAX(r2) - MIN(r2), 1) AS sp2
  FROM raw
),
d AS (
  SELECT event_id,
         ((r1 - lo1) * {top}) // sp1 AS d1,
         ((r2 - lo2) * {top}) // sp2 AS d2
  FROM raw CROSS JOIN ext
),
z AS (SELECT event_id, d1, d2, {z} >> {shift} AS file_id FROM d)
SELECT file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(d1) AS d1_min, MAX(d1) AS d1_max,
       MIN(d2) AS d2_min, MAX(d2) AS d2_max
FROM z
GROUP BY file_id
ORDER BY file_id
"""


@register("layout_zorder_stats", oracle=_zorder_oracle())
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file skipping statistics of a Z-ordered events layout on
    (user_id, hour): per output file, the row count and both
    dimensions\' min/max — the skipping statistics a scan planner
    consults. Dimensions first RESCALE to the data\'s own min/max (the
    range-based bit allocation real OPTIMIZE ZORDER performs — raw
    values rarely fill the bit budget), then interleave into a Morton
    value whose prefix is the file id. Because the Z prefix fixes
    leading bits of BOTH dimensions, every file\'s d1 AND d2 ranges are
    narrow (tests/test_zorder.py pins both normalized spans far below
    the ~1.0 a single-dimension sort leaves on its non-sort dimension).

    Scale: the extent scan is a 1-row broadcast (min/max agg); file
    assignment is then a PURE MAP (z-prefix bucket — no global sort,
    unlike rank-based file splitting; file sizes follow data density,
    which OPTIMIZE-style bin packing evens out downstream —
    layout_compact_plan is exactly that consumer). One hash aggregate
    on file_id for the stats. The rescale is exact int64 arithmetic
    ((x-lo)·65535 fits for any span < 2^47); shifts/masks stay below
    2^32 — bit-identical across engines; hour = epoch_us DIV 3.6e9 is
    exact int64 division at any magnitude, matching the oracle's //."""
    from pyspark.sql.functions import broadcast

    top = (1 << _Z_BITS) - 1
    raw = table(spark, sf_dir, "events").select(
        "event_id",
        col("user_id").alias("r1"),
        # integer DIV, not floor(x / 3.6e9): the double route is exact
        # only below 2^53/divisor, while the oracle's // is exact int64
        # at any magnitude — same reason d1/d2 below use DIV (r7 ADVICE
        # item 2)
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000"
        ).alias("r2"),
    )
    ext = raw.agg(
        F.min("r1").alias("lo1"),
        F.greatest(F.max("r1") - F.min("r1"), F.lit(1)).alias("sp1"),
        F.min("r2").alias("lo2"),
        F.greatest(F.max("r2") - F.min("r2"), F.lit(1)).alias("sp2"),
    )
    # SQL DIV: exact int64 division at ANY magnitude — the pmod/double
    # route this replaces was exact only below 2^53, and layout_zorder
    # above already uses DIV for the same reason (review finding)
    d = raw.crossJoin(broadcast(ext)).select(
        "event_id",
        F.expr(f"(r1 - lo1) * {top} DIV sp1").alias("d1"),
        F.expr(f"(r2 - lo2) * {top} DIV sp2").alias("d2"),
    )
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z + F.shiftleft(F.shiftright(col("d1"), i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(F.shiftright(col("d2"), i).bitwiseAND(1), 2 * i + 1)
    shift = 2 * _Z_BITS - _Z_PREFIX
    return (
        d.withColumn("file_id", F.shiftright(z, shift))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("d1").alias("d1_min"),
            F.max("d1").alias("d1_max"),
            F.min("d2").alias("d2_min"),
            F.max("d2").alias("d2_max"),
        )
        .orderBy("file_id")
    )


# ---------------------------------------------------------------------------
# schema_evolution_scan — mergeSchema over drifting parquet producers
# ---------------------------------------------------------------------------

# Long-lived ingestion directories accumulate files written by EVOLVING
# producers — early files lack columns later ones carry. The scan-side
# contract: read every generation in one pass, surface the union schema,
# null-fill the columns a file predates. The oracle never sees the
# staged files: the merged result is derivable from the fixture alone
# (generation = event_id parity), the same identity-oracle trick as the
# roundtrip queries above.

_EVOLVE_ORACLE = """
SELECT event_id, user_id,
       CASE WHEN event_id % 2 = 1 THEN value END AS value
FROM events
ORDER BY event_id
"""


@register("schema_evolution_scan", oracle=_EVOLVE_ORACLE)
def schema_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-schema scan over two parquet generations: generation g=1
    (even event_ids) was written before the `value` column existed;
    g=2 (odd event_ids) carries it. One mergeSchema read returns the
    union schema with nulls where a generation predates a column —
    bit-identical to deriving the same null pattern from the source
    table (the oracle's CASE).

    Scale: mergeSchema's cost is a FOOTER-ONLY pass over file metadata
    (schema union on the driver), not a data pass; the scan itself
    stays columnar + splittable. Production hygiene at 100 TB: pin the
    merged schema in a catalog after first contact so later reads skip
    footer merging (spark.read.schema(...)), exactly what this
    operator's read-back demonstrates is safe."""
    import shutil

    out = _stage(sf_dir, "evolve")
    shutil.rmtree(out, ignore_errors=True)
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    e.filter(col("event_id") % 2 == 0).select("event_id", "user_id").write.parquet(
        os.path.join(out, "g=1")
    )
    e.filter(col("event_id") % 2 == 1).write.parquet(os.path.join(out, "g=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(out)
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )
