"""CSV source with the reference's typing semantics (SURVEY.md §2A ops 1-9, 13).

Two paths, mirroring SURVEY.md §7 "hard part 2":

1. **Schema-first (the scale path)** — `read_csv`: `spark.read.csv` with a
   declared schema and option mapping from CopyConfig. Vectorized JVM-side
   parsing, splittable files, pushdown-friendly. This is what a 100 TB load
   uses; it matches reference behavior for homogeneous columns.

2. **Cell-dynamic (the fidelity path)** — `parse_csv_dynamic`: the
   reference types each CELL by inspecting its text and quoting
   (write.go:199-223): quoted→string; false/true literal; unquoted null
   literal; timestamp layout; int64; (engine upgrade) float; else string.
   Spark's CSV parser discards quote information, so this path reads raw
   lines (`spark.read.text` — still distributed and splittable) and parses
   each line with an Arrow-batched pandas UDF that PRESERVES the
   quoted-flag per field, then resolves each cell against the TARGET
   column type with `cast_dynamic`'s precedence, exactly as a Cassandra
   insert would coerce it. Limitation (documented): embedded newlines in
   quoted fields need the schema-first path with multiLine=true.

Error budget (op 13): schema-first uses PERMISSIVE mode + corrupt-record
accounting; the dynamic path counts per-line parse failures the same way
the reference counts csv.Reader errors (write.go:140-147).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import col

from cqlcopy_spark.config import DEFAULT_CONFIG, CopyConfig

CORRUPT_COL = "_corrupt_record"


def csv_read_options(cfg: CopyConfig) -> dict[str, str]:
    """CopyConfig → spark.read.csv options (reference flag mapping)."""
    return {
        "header": str(cfg.header).lower(),
        "quote": '"',
        "escape": '"',  # RFC 4180 doubles quotes; univocity expresses that as escape='"'
        "nullValue": cfg.null_literal,
        "timestampFormat": cfg.time_format,
        "timestampNTZFormat": cfg.time_format_ntz,
        # Always PERMISSIVE: the budget (including 0) is enforced by
        # enforce_parse_budget with a proper error; FAILFAST would surface
        # an opaque task failure instead (write.go:140-147 also keeps
        # reading until the budget trips).
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
    }


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    cfg: CopyConfig = DEFAULT_CONFIG,
    multi_line: bool = False,
) -> DataFrame:
    """Schema-first CSV scan (ops 1-2, 7-9) with the --max-parse-errors
    budget (op 13) enforced up front.

    When a finite budget is set, a dedicated counting scan tallies corrupt
    rows first (map-side combined count — cheap relative to the load it
    gates, and the reference pays a full parse per row anyway,
    write.go:140-147).

    Malformed-row dropping is subtle under Spark's CSV column pruning:
    DROPMALFORMED silently stops dropping when a downstream plan prunes
    all columns (a bare .count() then parses nothing), and a plain
    corrupt-marker filter is rejected outright when it is the only
    referenced column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_
    COLUMN). So the clean frame filters on the corrupt marker AND an
    opaque-to-the-optimizer reference to the first data column, which
    pins full-row parsing without disabling pruning globally."""
    opts = csv_read_options(cfg)
    if multi_line:
        opts["multiLine"] = "true"
    if cfg.max_parse_errors >= 0:
        bad = count_malformed(spark, path, schema, cfg, multi_line)
        if bad > cfg.max_parse_errors:
            raise ValueError(
                f"parse-error budget exceeded: {bad} malformed rows > "
                f"--max-parse-errors={cfg.max_parse_errors}"
            )
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    df = spark.read.options(**opts).schema(full).csv(path)
    data0 = col(schema.fields[0].name)
    keep = col(CORRUPT_COL).isNull() & (
        F.length(F.coalesce(data0.cast("string"), F.lit(""))) >= 0
    )
    return df.filter(keep).drop(CORRUPT_COL)


def count_malformed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    cfg: CopyConfig = DEFAULT_CONFIG,
    multi_line: bool = False,
) -> int:
    """One aggregate pass counting rows the CSV parser rejects. The agg
    references a data column alongside the corrupt marker to satisfy
    Spark's corrupt-record-only restriction."""
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    opts = csv_read_options(cfg)
    if multi_line:
        opts["multiLine"] = "true"
    df = spark.read.options(**opts).schema(full).csv(path)
    data_col = schema.fields[0].name
    row = df.agg(
        F.count(F.when(col(CORRUPT_COL).isNotNull(), 1)).alias("bad"),
        F.count(col(data_col)).alias("_touch"),
    ).collect()[0]
    return row["bad"]


# ---------------------------------------------------------------------------
# Cell-dynamic path
# ---------------------------------------------------------------------------

#: Raw parse output: per-field value + quoted flag (mirrors the reference's
#: csv.Column {Value string, Quoted bool}, write.go:122).
def _raw_field_schema(ncols: int) -> T.StructType:
    fields = []
    for i in range(ncols):
        fields.append(T.StructField(f"v{i}", T.StringType()))
        fields.append(T.StructField(f"q{i}", T.BooleanType()))
    fields.append(T.StructField("_parse_error", T.StringType()))
    return T.StructType(fields)


def _split_rfc4180(line: str, ncols: int) -> tuple[list[tuple[str | None, bool]], str | None]:
    """Tiny RFC-4180 field scanner preserving the quoted flag.

    Returns (fields, error). Unterminated quotes or wrong arity are parse
    errors (the reference surfaces these via csv.Reader, write.go:140-147).
    """
    fields: list[tuple[str | None, bool]] = []
    i, n = 0, len(line)
    while True:
        if i < n and line[i] == '"':
            buf = []
            i += 1
            while True:
                j = line.find('"', i)
                if j < 0:
                    return fields, "unterminated quoted field"
                if j + 1 < n and line[j + 1] == '"':
                    buf.append(line[i:j + 1])
                    i = j + 2
                else:
                    buf.append(line[i:j])
                    i = j + 1
                    break
            fields.append(("".join(buf), True))
            if i < n:
                if line[i] != ",":
                    return fields, f"garbage after closing quote at {i}"
                i += 1
            else:
                break
        else:
            j = line.find(",", i)
            if j < 0:
                fields.append((line[i:], False))
                break
            fields.append((line[i:j], False))
            i = j + 1
    if len(fields) != ncols:
        return fields, f"expected {ncols} fields, got {len(fields)}"
    return fields, None


def parse_csv_dynamic(
    spark: SparkSession,
    path: str,
    column_names: list[str],
    cfg: CopyConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Distributed quote-preserving CSV parse → one (value, quoted) pair per
    column plus `_parse_error`. mapInPandas keeps the Python work
    Arrow-batched; text input stays splittable so this scales out."""
    ncols = len(column_names)
    out_schema = _raw_field_schema(ncols)
    header = cfg.header

    # the parse closure references module-level _split_rfc4180, which
    # cloudpickle serializes BY REFERENCE — executors must be able to
    # import cqlcopy_spark (CLAUDE.md UDF-shipping rule)
    from cqlcopy_spark.catalog import _ship_package

    _ship_package(spark)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                if line == "":
                    # blank separator lines are skipped, not arity
                    # errors: Go's encoding/csv (the reference's reader)
                    # and Spark's schema-first reader both ignore them —
                    # counting them against --max-parse-errors would
                    # make the two ingest paths disagree on one file
                    continue
                fields, err = _split_rfc4180(line, ncols)
                rec: dict[str, object] = {}
                for i in range(ncols):
                    v, q = fields[i] if i < len(fields) else (None, False)
                    rec[f"v{i}"], rec[f"q{i}"] = v, q
                rec["_parse_error"] = err
                rows.append(rec)
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    lines = spark.read.text(path)
    if header:
        # The reference reads and DISCARDS the header row (write.go:135-137):
        # column names come from the caller. Drop the first line of EVERY
        # input file — a directory of CSV parts (what write_csv emits)
        # carries one header per part, so a global single-line drop would
        # leak the later files' headers in as data rows (r03 ADVICE).
        # Per-row "first line of its file" isn't computable without an
        # aggregate: text reads assign monotonic ids that increase with
        # in-file row order (splits are index-ordered), so each file's
        # header is its min id. The per-file min agg is map-side partial
        # → one row per FILE survives the shuffle, and joins back as a
        # broadcast — the line data itself is never shuffled. A value
        # filter on the header TEXT would also delete any data row that
        # happens to equal it.
        lines = lines.withColumn("_file", F.input_file_name()).withColumn(
            "_mid", F.monotonically_increasing_id()
        )
        firsts = lines.groupBy("_file").agg(F.min("_mid").alias("_first_id"))
        lines = (
            lines.join(F.broadcast(firsts), "_file")
            .filter(col("_mid") != col("_first_id"))
            .drop("_file", "_mid", "_first_id")
        )
    raw = lines.mapInPandas(parse, schema=out_schema)
    renamed = raw
    for i, name in enumerate(column_names):
        renamed = renamed.withColumnRenamed(f"v{i}", name).withColumnRenamed(f"q{i}", f"{name}__quoted")
    return renamed


def cast_cell(value: Column, quoted: Column, target: T.DataType, cfg: CopyConfig) -> Column:
    """Reference per-cell precedence (write.go:207-223) resolved against a
    target type — the coercion a Cassandra INSERT of the parsed value
    would perform. Pure Spark expressions (whole-stage codegen)."""
    t, f = cfg.true_literal.lower(), cfg.false_literal.lower()
    is_null = (~quoted) & (value == cfg.null_literal)  # unquoted NULL only (write.go:214-215)
    if isinstance(target, T.StringType):
        return F.when(is_null, F.lit(None).cast("string")).otherwise(value)
    if isinstance(target, T.BooleanType):
        lower = F.lower(value)
        return (
            F.when(is_null, F.lit(None).cast("boolean"))
            .when(lower == f, F.lit(False))   # false checked before true (write.go:210-213)
            .when(lower == t, F.lit(True))
            .otherwise(F.lit(None).cast("boolean"))
        )
    if isinstance(target, (T.TimestampType, T.TimestampNTZType)):
        fmt = cfg.time_format if isinstance(target, T.TimestampType) else cfg.time_format_ntz
        parsed = F.try_to_timestamp(value, F.lit(fmt)).cast(target.simpleString())
        return F.when(is_null, F.lit(None).cast(target.simpleString())).otherwise(parsed)
    if isinstance(target, T.DateType):
        # ISO yyyy-MM-dd, what Spark's CSV inference recognizes as DATE
        # (prefersDate) — keep the inferred type instead of downgrading
        # the column to string
        return F.when(is_null, F.lit(None).cast("date")).otherwise(
            value.try_cast("date")
        )
    if isinstance(target, T.LongType) or isinstance(target, T.IntegerType):
        # try_cast straight to the TARGET type: routing through long and
        # then cast('int') would silently wrap values that overflow int32
        # (non-ANSI) or throw (ANSI) — try_cast yields NULL like every
        # other unparseable cell on this path
        return F.when(is_null, F.lit(None).cast(target.simpleString())).otherwise(
            value.try_cast(target.simpleString())
        )
    if isinstance(target, (T.DoubleType, T.FloatType)):
        # engine upgrade: reference has no float support (README.md:11)
        return F.when(is_null, F.lit(None)).otherwise(value.try_cast(target.simpleString()))
    raise TypeError(f"cast_dynamic: unsupported target type {target}")


def cast_dynamic(df: DataFrame, schema: T.StructType, cfg: CopyConfig = DEFAULT_CONFIG) -> DataFrame:
    """Apply `cast_cell` per column over a parse_csv_dynamic result."""
    cols = [
        cast_cell(col(fld.name), col(f"{fld.name}__quoted"), fld.dataType, cfg).alias(fld.name)
        for fld in schema.fields
    ]
    keep = [c for c in df.columns if c == "_parse_error"]
    return df.select(*cols, *[col(k) for k in keep])
