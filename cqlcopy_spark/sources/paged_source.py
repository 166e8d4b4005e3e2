"""Custom PySpark DataSource reproducing the reference's read path as a
real Spark source (SURVEY.md §2A ops 16-19): token-range splits become
`InputPartition`s, per-partition iteration is paged, and resume-from-token
is an option — the same planning the spark-cassandra-connector does
natively, expressed through PySpark 4's Python DataSource API.

Reference parity (riptl/cqlcopy):
- read.go:113-119 — `SELECT ... WHERE token(pk) > offset` resumable scan →
  `resume_after` option, exclusive `>`.
- read.go:28 — `--page-size` (default 128 rows/page) → `page_size` option;
  each partition yields Arrow batches capped at page_size rows, emulating
  Cassandra's paged result fetch.
- Ring splits: the [0, 2^32) portable-token ring is divided into
  `n_ranges` half-open slices, one Spark task each — the distributed
  version of the reference's single-process sequential scan.

Scale posture: partition planning happens on the driver from metadata
only (no data touched); each task reads the backing parquet with a
row-group-level filter, so work ∝ its ring slice. On a 1000-executor
cluster n_ranges is the parallelism knob exactly as connector splits are.
The token math is `portable_token` (functions/portable.py), so results
are DuckDB-verifiable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from cqlcopy_spark.functions.portable import KNUTH, M32

RING_MAX = M32  # tokens live in [0, 2^32)


@dataclass
class TokenRangePartition(InputPartition):
    """One half-open ring slice [lo, hi) — the Spark unit of work."""

    lo: int
    hi: int


class PagedTokenRangeReader(DataSourceReader):
    def __init__(self, schema, options):
        self.path = options["path"]
        self.key_col = options["key_col"]
        self.n_ranges = int(options.get("n_ranges", "8"))
        self.page_size = int(options.get("page_size", "128"))
        self.resume_after = int(options.get("resume_after", "-1"))

    def partitions(self):
        """Driver-side planning from metadata only: slice the ring into
        n_ranges half-open spans; drop spans entirely below the resume
        token (the reference's offset fast-forward, read.go:107)."""
        step = RING_MAX // self.n_ranges
        bounds = [i * step for i in range(self.n_ranges)] + [RING_MAX]
        return [
            TokenRangePartition(lo, hi)
            for lo, hi in zip(bounds, bounds[1:])
            if hi > self.resume_after + 1
        ]

    def read(self, partition):
        """Executor-side: scan the backing parquet, keep rows whose token
        falls in this slice (and past the resume point), emit Arrow
        batches of ≤ page_size rows — the paged fetch loop. Token math is
        vectorized in uint64 (exact: key·KNUTH < 2⁶⁴ for any 32-bit-ish
        key, and modular arithmetic wraps identically anyway)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        lo = max(partition.lo, self.resume_after + 1)
        hi = partition.hi
        f = pq.ParquetFile(self.path)
        for batch in f.iter_batches():
            keys = batch.column(self.key_col).to_numpy().astype(np.uint64)
            tokens = (keys * np.uint64(KNUTH)) % np.uint64(M32)
            mask = (tokens >= lo) & (tokens < hi)
            if not mask.any():
                continue
            tbl = pa.Table.from_batches([batch]).append_column(
                "token", pa.array(tokens.astype(np.int64), type=pa.int64())
            )
            kept = tbl.filter(pa.array(mask))
            # Spark's Arrow bridge accepts only µs timestamps; parquet
            # files commonly carry ms (or ns) — normalize losslessly.
            target = pa.schema(
                [
                    pa.field(f.name, pa.timestamp("us"))
                    if pa.types.is_timestamp(f.type)
                    else f
                    for f in kept.schema
                ]
            )
            kept = kept.cast(target)
            for page_start in range(0, kept.num_rows, self.page_size):
                page = kept.slice(page_start, self.page_size)
                yield from page.to_batches()


class PagedTokenRangeDataSource(DataSource):
    """spark.read.format("cql_paged") — options: path, key_col, schema is
    inferred from the parquet footer plus the synthesized token column."""

    @classmethod
    def name(cls):
        return "cql_paged"

    def schema(self):
        import pyarrow.parquet as pq

        arrow_schema = pq.read_schema(self.options["path"])
        _ARROW_TO_SPARK = {
            "int64": "bigint",
            "int32": "int",
            "double": "double",
            "float": "float",
            "string": "string",
            "large_string": "string",
            "bool": "boolean",
            "timestamp[ms]": "timestamp_ntz",
            "timestamp[us]": "timestamp_ntz",
        }
        cols = [
            f"{f.name} {_ARROW_TO_SPARK[str(f.type)]}" for f in arrow_schema
        ]
        return ", ".join(cols + ["token bigint"])

    def reader(self, schema):
        return PagedTokenRangeReader(schema, self.options)


def register_paged_source(spark) -> None:
    """Idempotent per-session registration."""
    key = "cqlcopy_spark._paged_source_registered"
    if spark.conf.get(key, None) == "1":
        return
    spark.dataSource.register(PagedTokenRangeDataSource)
    spark.conf.set(key, "1")
