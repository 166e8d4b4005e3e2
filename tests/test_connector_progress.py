"""Connector option assembly (the reference flag → connector config
mapping, SURVEY.md §2A ops 10-12/18) and the progress reporter (op 15)."""

from __future__ import annotations

import pytest

from cqlcopy_spark.config import CopyConfig
from cqlcopy_spark.progress import ProgressReporter
from cqlcopy_spark.sources.cassandra import read_options, split_table, write_options


def test_write_options_map_reference_flags():
    cfg = CopyConfig(chunk_size=500, max_batch_kb=10, num_workers=4, max_attempts=3)
    opts = write_options("ks.tbl", cfg)
    assert opts["keyspace"] == "ks" and opts["table"] == "tbl"
    # rows and bytes sizing are mutually exclusive in the connector's
    # WriteConf: only the bytes threshold maps
    assert "spark.cassandra.output.batch.size.rows" not in opts
    assert opts["spark.cassandra.output.batch.size.bytes"] == "10000"
    assert opts["spark.cassandra.output.concurrent.writes"] == "4"
    assert opts["spark.cassandra.query.retry.count"] == "3"
    # reference sentinel 0 = retry forever, connector 0 = never: translated
    assert int(
        write_options("ks.tbl", CopyConfig(max_attempts=0))[
            "spark.cassandra.query.retry.count"
        ]
    ) > 1_000_000
    assert opts["spark.cassandra.output.batch.grouping.key"] == "partition"


def test_read_options_map_reference_flags():
    opts = read_options("ks.tbl", CopyConfig(page_size=128))
    assert opts["spark.cassandra.input.fetch.sizeInRows"] == "128"


def test_split_table_validates_identifiers():
    assert split_table("ks.tbl") == ("ks", "tbl")
    with pytest.raises(ValueError):
        split_table("no_keyspace")
    with pytest.raises(ValueError):
        split_table("ks.bad;drop")


def test_progress_reporter_counts_rows(spark):
    lines: list[str] = []
    with ProgressReporter(spark.sparkContext, report=lines.append, freq_s=0.1) as pr:
        n = pr.instrument(spark.range(1000).repartition(4)).count()
    assert n == 1000
    assert pr.rows.value == 1000
    assert lines and "1000 rows done" in lines[-1]


def test_paged_source_partitions_are_disjoint_complete_row_group_spans():
    """Input splits are row-group spans planned from the parquet FOOTER
    only: together they cover every row group exactly once (no task
    scans the whole file), and the split count respects n_ranges."""
    import pyarrow.parquet as pq

    from cqlcopy_spark.sources.paged_source import PagedTokenRangeReader
    from tests.conftest import SF_SMALL

    path = f"{SF_SMALL}/orders.parquet"
    n_rg = pq.ParquetFile(path).metadata.num_row_groups
    r = PagedTokenRangeReader(
        None, {"path": path, "key_col": "o_orderkey", "n_ranges": "4"}
    )
    parts = r.partitions()
    assert 1 <= len(parts) <= 4
    covered = sorted(rg for p in parts for rg in p.row_groups)
    assert covered == list(range(n_rg))  # disjoint AND complete


def test_batched_sink_two_phase_commit_roundtrip(spark, tmp_path):
    """Custom DataSource writer: batched flush (final partial batch
    INCLUDED — the reference drops it, write.go:97-101), staging made
    invisible until the driver-side commit renames, and no stray files
    afterwards."""
    import os

    from cqlcopy_spark.catalog import _ship_package, table
    from cqlcopy_spark.sinks.batched_sink import register_batched_sink
    from tests.conftest import SF_SMALL

    _ship_package(spark)
    register_batched_sink(spark)
    out = str(tmp_path / "landed")
    src = table(spark, SF_SMALL, "orders").select("o_orderkey", "o_orderstatus")
    n = src.count()
    (
        src.repartition(4)
        .write.format("cql_batched")
        .option("path", out)
        .option("chunk_size", "100")
        .mode("append")
        .save()
    )
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files and not os.path.exists(os.path.join(out, "_staging"))
    landed = sum(
        1
        for f in files
        for _ in open(os.path.join(out, f), encoding="utf-8")
    )
    assert landed == n  # every row, including final partial batches


def test_batched_sink_timestamp_roundtrip(spark, tmp_path):
    """Timestamps staged by the batched sink must carry the UTC offset
    the default --time-format layout expects ('+0000', Go '-0700'
    semantics), and re-ingest through the engine's own dynamic parser to
    the same instants. PySpark hands the Python writer tz-NAIVE
    datetimes, so a bare strftime('%z') renders empty — the r04 ADVICE
    regression this pins."""
    import os

    import pyspark.sql.types as T

    from cqlcopy_spark.catalog import _ship_package
    from cqlcopy_spark.config import DEFAULT_CONFIG
    from cqlcopy_spark.sinks.batched_sink import register_batched_sink
    from cqlcopy_spark.sources.csv_source import cast_dynamic, parse_csv_dynamic

    _ship_package(spark)
    register_batched_sink(spark)
    out = str(tmp_path / "ts_sink")
    src = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-06-30 23:59:59")],
        "id long, s string",
    ).selectExpr("id", "CAST(s AS TIMESTAMP) AS ts")
    src.coalesce(1).write.format("cql_batched").option("path", out).mode(
        "append"
    ).save()
    lines = [
        ln
        for f in os.listdir(out)
        if f.endswith(".csv")
        for ln in open(os.path.join(out, f), encoding="utf-8").read().splitlines()
    ]
    assert sorted(lines) == [
        "1,2024-01-01 00:00:00+0000",
        "2,2024-06-30 23:59:59+0000",
    ]
    import dataclasses

    cfg = dataclasses.replace(DEFAULT_CONFIG, header=False)  # sink emits no header
    raw = parse_csv_dynamic(spark, out, ["id", "ts"], cfg)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    back = cast_dynamic(raw, schema, cfg)
    got = {r["id"]: r["ts"] for r in back.select("id", "ts").collect()}
    want = {r["id"]: r["ts"] for r in src.collect()}
    assert got == want


def test_batch_byte_threshold_counts_utf8_octets(tmp_path):
    """The byte threshold must measure UTF-8 octets of the staged
    (quoted) line — codepoint-counting unquoted fields undercounts
    multi-byte text ~2× and drifts from the reference's byte budget
    (write.go:238-240; r03 ADVICE)."""
    from cqlcopy_spark.sinks.batched_sink import BatchedCsvWriter

    w = BatchedCsvWriter(
        {"path": str(tmp_path / "sink"), "chunk_size": "1000", "max_batch_kb": "1"}
    )
    # 100 codepoints, 200 UTF-8 bytes per row (+1 newline): octet
    # counting trips the 1000-byte budget at 5 rows → 12 rows = 3
    # batches; codepoint counting would trip at 10 → 2 batches
    msg = w.write(("é" * 100,) for _ in range(12))
    assert msg.n_rows == 12
    assert msg.n_batches == 3
