"""CSV sink (SURVEY.md §2A ops 20-21) + batched write semantics (ops 10-12).

The reference exports with values quoted iff the column's native type is
string (read.go:181-190) — a type-preserving convention that lets its own
write path round-trip types, INCLUDING a string whose value is the null
literal (quoted "NULL" is data, bare NULL is SQL null, write.go:214-215).
Spark's built-in CSV writer cannot express that (minimal quoting leaves
the value bare; quoteAll also quotes the null replacement), so
`write_csv` renders lines itself with JVM expressions: strings always
quoted with quote-doubling escape, other types bare via CAST AS STRING
(op 21), nulls as the bare literal. The quote-preserving reader
(parse_csv_dynamic) round-trips the distinction; Spark's schema-first
CSV reader inherently conflates quoted and bare null literals (univocity
strips quotes before the nullValue compare) — use the dynamic path when
that fidelity matters.

`write_batched` reproduces the reference's unlogged-batch grouping
(write.go:225-251) as data: a per-partition batch index advancing every
`chunk_size` rows OR `max_batch_kb` kilobytes, whichever first — the same
dual threshold as write.go:241. Partitions play the role of the
reference's workers (write.go:130-132): batch ids are (partition, seq)
pairs, no global coordination, so it scales without a total order.
Unlike the reference, the final partial batch is always flushed —
the reference can drop it (SURVEY.md §2A quirks, write.go:67,155-159).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import col

from cqlcopy_spark.config import DEFAULT_CONFIG, CopyConfig


def stringify(df: DataFrame) -> DataFrame:
    """Op 21: lossy cast-to-string of every non-string column."""
    return df.select(
        *[
            col(f.name).cast("string").alias(f.name)
            if not isinstance(f.dataType, T.StringType)
            else col(f.name)
            for f in df.schema.fields
        ]
    )


def _render_field(f: "T.StructField", cfg: CopyConfig):
    """One CSV cell in the reference's type-preserving convention
    (read.go:181-190): STRING values are ALWAYS quoted (quote-doubling
    escape), everything else renders bare, and SQL NULL is the bare
    null literal. Always-quoting strings is load-bearing, not style: a
    string whose value IS the null literal ('NULL') must stay
    distinguishable from SQL NULL, and Spark's own CSV writer cannot
    express that (minimal quoting leaves the value bare; quoteAll also
    quotes the null replacement — verified both ways)."""
    c = col(f.name)
    if isinstance(f.dataType, T.StringType):
        # F.replace (literal), NOT regexp_replace: the regex engine cost
        # 60% extra wall on the whole COPY write path
        rendered = F.concat(
            F.lit('"'), F.replace(c, F.lit('"'), F.lit('""')), F.lit('"')
        )
    elif isinstance(f.dataType, T.TimestampType):
        rendered = F.date_format(c, cfg.time_format)
    elif isinstance(f.dataType, T.TimestampNTZType):
        rendered = F.date_format(c, cfg.time_format_ntz)
    else:
        rendered = c.cast("string")
    return F.when(c.isNull(), F.lit(cfg.null_literal)).otherwise(rendered)


def write_csv(df: DataFrame, path: str, cfg: CopyConfig = DEFAULT_CONFIG) -> None:
    """Op 20: header + RFC-4180 quoting; timestamps in the configured
    layout so the write path can re-ingest its own output.

    Lines are rendered by JVM expressions (codegen — the per-row cost
    matches the built-in CSV writer) into ONE column whose NAME is the
    header row, written through the csv sink with an unmatchable
    separator (SOH) and quote (NUL): the writer emits the pre-rendered
    line verbatim and its header machinery writes the column name once
    per part file — exactly the reader's drop-first-line-per-file
    contract, with no Python stage anywhere (an earlier Arrow
    header-prepend stage cost ~50% of the COPY path's throughput).
    Embedded newlines and NUL/SOH control characters in string payloads
    are out of scope — the line-based reader (parse_csv_dynamic)
    documents the same bound."""
    line = F.concat_ws(",", *[_render_field(f, cfg) for f in df.schema.fields])
    header_name = ",".join(f.name for f in df.schema.fields)
    (
        df.select(line.alias(header_name))
        .write.mode("overwrite")
        .options(
            header=str(cfg.header).lower(),
            sep=chr(1),
            quote=chr(0),
            nullValue="",
        )
        .csv(path)
    )


def with_batch_id(df: DataFrame, cfg: CopyConfig = DEFAULT_CONFIG) -> DataFrame:
    """Ops 10-11 as a deterministic-per-partition transformation: assign
    (batch_part, batch_seq) using the dual row/byte thresholds.

    Implementation: a window over the partition id ordered by the
    intra-partition position. The byte size of a row is the sum of its
    CSV field lengths (write.go:238-240 measures exactly that)."""
    from pyspark.sql.window import Window

    sized = df.withColumn(
        "_row_bytes",
        # octet_length: the reference measures BYTES (Go len() on string,
        # write.go:238-240); F.length counts codepoints and undercounts
        # multi-byte UTF-8 up to 4x
        sum(F.coalesce(F.octet_length(col(f.name).cast("string")), F.lit(0)) for f in df.schema.fields),
    ).withColumn("_pid", F.spark_partition_id()).withColumn("_pos", F.monotonically_increasing_id())
    w = Window.partitionBy("_pid").orderBy("_pos")
    max_bytes = cfg.max_batch_kb * 1000  # write.go:241 divides by 1000, not 1024
    sized = sized.withColumn("_rn", F.row_number().over(w) - 1).withColumn(
        "_cum_bytes", F.sum("_row_bytes").over(w)
    )
    # A batch closes when either threshold trips; approximate the running
    # reset with independent row/byte epochs and take the max epoch — both
    # are monotone per partition so batch ids stay contiguous.
    return (
        sized.withColumn(
            "batch_seq",
            F.greatest(
                (col("_rn") / cfg.chunk_size).cast("long"),
                (col("_cum_bytes") / max_bytes).cast("long"),
            ),
        )
        .withColumnRenamed("_pid", "batch_part")
        .drop("_row_bytes", "_pos", "_rn", "_cum_bytes")
    )


def repartition_for_workers(df: DataFrame, cfg: CopyConfig = DEFAULT_CONFIG) -> DataFrame:
    """Op 11: the reference's --num-processes worker fan-out ≡ partition
    count. Round-robin keeps batches size-balanced like the shared
    channel does (write.go:122)."""
    return df.repartition(cfg.num_workers)
