"""Cassandra connector surface (SURVEY.md §2A ops 10-12, 16-19).

No Cassandra cluster (or spark-cassandra-connector jar) exists in this
environment, so this module does what the reference's flags do — assemble
the exact connector configuration — and provides a parquet-backed
stand-in for the token-range scan so the range/resume logic is testable
and DuckDB-verifiable (SURVEY.md §7 step 3).

Option assembly maps each reference flag to its connector equivalent:

  --chunk-size        → (deliberately unmapped: batch.size.rows is
                         mutually exclusive with batch.size.bytes in the
                         connector — the byte threshold below carries
                         the batching contract; see write_options)
  --max-batch-size    → spark.cassandra.output.batch.size.bytes (write.go:38)
  --num-processes     → spark.cassandra.output.concurrent.writes (write.go:35)
  --max-attempts      → spark.cassandra.query.retry.count        (write.go:33)
  --page-size         → spark.cassandra.input.fetch.sizeInRows   (read.go:28)
  unlogged batches    → spark.cassandra.output.batch.grouping.key=partition
                        (write.go:93: UnloggedBatch per partition key)

The connector's own token-range input splits reproduce ops 16-18
(read.go:113-130) natively; Spark task retry reproduces op 17/19 resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.config import DEFAULT_CONFIG, CopyConfig, require_identifiers

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def split_table(qualified: str) -> tuple[str, str]:
    """'keyspace.table' → (keyspace, table); identifier-validated
    (util.go:3-18 whitelist)."""
    require_identifiers(qualified)
    if qualified.count(".") != 1:
        raise ValueError(f"expected exactly keyspace.table, got {qualified!r}")
    ks, tbl = qualified.split(".")
    if not ks or not tbl:
        raise ValueError(f"empty keyspace or table in {qualified!r}")
    return ks, tbl


def write_options(qualified: str, cfg: CopyConfig = DEFAULT_CONFIG) -> dict[str, str]:
    ks, tbl = split_table(qualified)
    return {
        "keyspace": ks,
        "table": tbl,
        # batch.size.rows and batch.size.bytes are MUTUALLY EXCLUSIVE in
        # the connector (WriteConf rejects both) — map the reference's
        # dual threshold to bytes only, the limit that usually trips first
        "spark.cassandra.output.batch.size.bytes": str(cfg.max_batch_kb * 1000),
        "spark.cassandra.output.batch.grouping.key": "partition",
        "spark.cassandra.output.concurrent.writes": str(cfg.num_workers),
        # reference sentinel: max_attempts=0 means retry FOREVER
        # (write.go:33); the connector's retry.count=0 means no retries,
        # so translate the sentinel to an effectively-unbounded count
        "spark.cassandra.query.retry.count": str(
            cfg.max_attempts if cfg.max_attempts > 0 else 2_147_483_647
        ),
    }


def read_options(qualified: str, cfg: CopyConfig = DEFAULT_CONFIG) -> dict[str, str]:
    ks, tbl = split_table(qualified)
    return {
        "keyspace": ks,
        "table": tbl,
        "spark.cassandra.input.fetch.sizeInRows": str(cfg.page_size),
    }


def copy_to_cassandra(df: DataFrame, qualified: str, cfg: CopyConfig = DEFAULT_CONFIG) -> None:
    """`cqlcopy write` as a Spark job (requires the connector on the
    classpath; not invocable in this container — see module docstring)."""
    (
        df.write.format(CASSANDRA_FORMAT)
        .options(**write_options(qualified, cfg))
        .mode("append")
        .save()
    )


def read_from_cassandra(
    spark: SparkSession, qualified: str, columns: list[str] | None = None,
    cfg: CopyConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """`cqlcopy read`: full-table scan; column projection pushes into the
    connector (read.go:113-117's SELECT list, done by Catalyst)."""
    df = spark.read.format(CASSANDRA_FORMAT).options(**read_options(qualified, cfg)).load()
    if columns:
        require_identifiers(*columns)
        df = df.select(*columns)
    return df


# ---------------------------------------------------------------------------
# Parquet stand-in: token-range scan with resume offset (ops 16-17)
# ---------------------------------------------------------------------------

def scan_token_range(
    df: DataFrame,
    key_col: str | list[str],
    offset: int | None = None,
    cfg: CopyConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Emulate `SELECT token(pk), ... WHERE token(pk) > offset`
    (read.go:113-119) over any DataFrame with a portable multiplicative
    hash in [0, 2^32) standing in for Cassandra's ring token. The `>` is
    exclusive, matching the reference's resume semantics (read.go:107 —
    including its documented skip-on-shared-token caveat). A list of
    key columns tokens the COMPOSITE partition key, the reference's
    --partition-key-size semantics (read.go:20,29).

    At scale the token is a pure projection over the scan — no shuffle;
    the predicate stays in whole-stage codegen."""
    from cqlcopy_spark.functions.portable import portable_token_composite

    off = cfg.offset if offset is None else offset
    if "token" in df.columns:
        # withColumn would silently REPLACE the user's column with the
        # ring hash (and cli.run_read then drops it from the export)
        raise ValueError(
            "scan_token_range: input already has a 'token' column; "
            "rename it before resuming by token"
        )
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    tok = portable_token_composite([col(k) for k in keys])
    return df.withColumn("token", tok).filter(col("token") > F.lit(off))
