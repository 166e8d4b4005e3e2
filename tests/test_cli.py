"""CLI surface tests: the reference's two commands (`write`, `read` —
main.go:13-50) reproduced over the parquet stand-in backend, including
the COPY round-trip, the resume offset, stdout quoting semantics, and
flag validation."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from cqlcopy_spark.cli import main
from tests.conftest import SF_SMALL

_CSV = """\
"id","name","price","ok","when"
1,widget,9.5,true,2024-01-02 03:04:05+0000
2,"quoted,name",0.25,false,2024-01-02 03:04:06+0000
3,"NULL",NULL,true,2024-01-02 03:04:07+0000
"""


def _write_input(tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(_CSV, encoding="utf-8")
    return str(p)


def test_cli_write_schema_first_roundtrip(spark, tmp_path):
    """write: CSV → parquet with declared types; quoted "NULL" stays a
    string while unquoted NULL is null (write.go:208-215) — on the
    --dynamic path below; the schema-first path maps both to null for
    string columns only when unquoted (Spark nullValue semantics)."""
    out = str(tmp_path / "t.parquet")
    rc = main(
        [
            "write", "items", "id", "name", "price", "ok", "when",
            "--input", _write_input(tmp_path),
            "--types", "long,string,double,bool,timestamp",
            "--path", out,
            "--num-processes", "2",
        ],
        spark=spark,
    )
    assert rc == 0
    df = spark.read.parquet(out)
    assert df.count() == 3
    got = {r["id"]: r for r in df.collect()}
    assert got[1]["name"] == "widget" and abs(got[1]["price"] - 9.5) < 1e-12
    assert got[2]["name"] == "quoted,name" and got[2]["ok"] is False
    assert got[3]["price"] is None  # unquoted NULL literal → SQL null
    assert got[1]["when"] is not None


def test_cli_write_dynamic_preserves_quoted_null(spark, tmp_path):
    """--dynamic: the cell-typing fidelity path keeps quoted "NULL" as
    the string it is (write.go:208-209 vs 214-215)."""
    out = str(tmp_path / "t2.parquet")
    rc = main(
        [
            "write", "items", "id", "name", "price", "ok", "when",
            "--input", _write_input(tmp_path),
            "--types", "long,string,double,bool,timestamp",
            "--dynamic",
            "--path", out,
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["id"]: r for r in spark.read.parquet(out).collect()}
    assert got[3]["name"] == "NULL"  # quoted → stays a string
    assert got[3]["price"] is None   # unquoted → null


def test_cli_read_stdout_quotes_strings_only(spark, tmp_path):
    """read --output -: header quoted, string values quoted, numerics
    bare (read.go:181-190 type-preserving convention)."""
    src = str(tmp_path / "t3.parquet")
    main(
        [
            "write", "items", "id", "name", "price", "ok", "when",
            "--input", _write_input(tmp_path),
            "--types", "long,string,double,bool,timestamp",
            "--path", src,
        ],
        spark=spark,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            ["read", "items", "id", "name", "--path", src, "--output", "-"],
            spark=spark,
        )
    assert rc == 0
    lines = buf.getvalue().strip().split("\n")
    assert lines[0] == '"id","name"'
    body = sorted(lines[1:])
    assert body[0] == '1,"widget"'
    assert '2,"quoted,name"' in body  # embedded comma survives quoting


def test_cli_read_resume_offset_matches_token_scan(spark, tmp_path):
    """--offset replays only the ring after the last token, exactly like
    scan_token_range (read.go:100-119)."""
    from cqlcopy_spark.functions.portable import KNUTH, M32

    src = f"{SF_SMALL}/orders.parquet"
    full = spark.read.parquet(src).select("o_orderkey")
    offset = 2 ** 31  # mid-ring
    expected = full.filter(
        (full.o_orderkey * KNUTH) % M32 > offset
    ).count()
    out = str(tmp_path / "resumed")
    rc = main(
        [
            "read", "orders", "o_orderkey",
            "--path", src, "--output", out, "--offset", str(offset),
        ],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.options(header="true").csv(out).count()
    assert got == expected > 0


def test_cli_rejects_bad_identifiers(spark, tmp_path):
    with pytest.raises(ValueError, match="invalid identifier"):
        main(
            ["read", "orders; DROP", "o_orderkey",
             "--path", "x", "--output", "-"],
            spark=spark,
        )


def test_cli_write_parse_budget_enforced(spark, tmp_path):
    """--max-parse-errors 0 with a malformed line must abort the load
    (write.go:140-147; the engine enforces what the reference logs)."""
    bad = tmp_path / "bad.csv"
    bad.write_text('"id","name"\n1,ok\n"unterminated,oops\n', encoding="utf-8")
    with pytest.raises(ValueError, match="budget"):
        main(
            [
                "write", "items", "id", "name",
                "--input", str(bad),
                "--types", "long,string",
                "--dynamic",
                "--max-parse-errors", "0",
                "--path", str(tmp_path / "never.parquet"),
            ],
            spark=spark,
        )


def test_cli_stdin_spool_cleaned_on_error(spark, tmp_path, monkeypatch):
    """A piped invocation that FAILS (parse budget, here) must not leak
    the spooled stdin in the temp dir (r04 ADVICE: cleanup ran only on
    the success path)."""
    import io as _io
    import os
    import tempfile

    spool_dir = tmp_path / "spools"
    spool_dir.mkdir()
    monkeypatch.setattr(tempfile, "tempdir", str(spool_dir))
    monkeypatch.setattr(
        "sys.stdin", _io.StringIO('"id","name"\n1,ok\n"unterminated,oops\n')
    )
    with pytest.raises(ValueError, match="budget"):
        main(
            [
                "write", "items", "id", "name",
                "--input", "-",
                "--types", "long,string",
                "--dynamic",
                "--max-parse-errors", "0",
                "--path", str(tmp_path / "never_spool.parquet"),
            ],
            spark=spark,
        )
    assert os.listdir(spool_dir) == []  # spool unlinked on the error path


def test_cli_write_inference_parse_budget_binds(spark, tmp_path):
    """Inference path (no --types): the parse-error budget must bind too.
    r03 ADVICE: the old corrupt-column check was dead code because
    inferSchema never materializes the corrupt-record field."""
    bad = tmp_path / "bad_inf.csv"
    # extra-column row: malformed against the inferred 2-column schema
    # (an unterminated quote would just widen the inferred type to string
    # and parse cleanly — inference is deliberately forgiving there)
    bad.write_text('"id","name"\n1,ok\n2,x,extra,cols\n3,fine\n', encoding="utf-8")
    with pytest.raises(ValueError, match="budget"):
        main(
            [
                "write", "items", "id", "name",
                "--input", str(bad),
                "--max-parse-errors", "0",
                "--path", str(tmp_path / "never_inf.parquet"),
            ],
            spark=spark,
        )
    # inside the budget: malformed row skipped, good rows load
    out = str(tmp_path / "ok_inf.parquet")
    rc = main(
        [
            "write", "items", "id", "name",
            "--input", str(bad),
            "--max-parse-errors", "1",
            "--path", out,
        ],
        spark=spark,
    )
    assert rc == 0
    assert spark.read.parquet(out).count() == 2


def test_cli_read_resume_composite_partition_key(spark, tmp_path):
    """--partition-key-size 2 must token the COMPOSITE (first two)
    columns when resuming — tokening only columns[0] resumes from the
    wrong ring position (read.go:20,29)."""
    from cqlcopy_spark.functions.portable import KNUTH, M32

    src = f"{SF_SMALL}/orders.parquet"
    full = spark.read.parquet(src).select("o_orderkey", "o_custkey")
    offset = 2 ** 31
    t1 = (full.o_orderkey * KNUTH) % M32
    t2 = (full.o_custkey * KNUTH) % M32
    expected = full.filter((t1 * 31 + t2) % M32 > offset).count()
    single = full.filter(t1 > offset).count()
    assert expected != single  # the two semantics genuinely differ here
    out = str(tmp_path / "resumed_composite")
    rc = main(
        [
            "read", "orders", "o_orderkey", "o_custkey",
            "--path", src, "--output", out,
            "--offset", str(offset), "--partition-key-size", "2",
        ],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.options(header="true").csv(out).count()
    assert got == expected > 0


def test_cli_write_inference_keeps_inferred_dates(spark, tmp_path):
    """An ISO-date CSV column infers as DATE and must land in parquet as
    DATE, not be silently downgraded to string (review finding on the
    inference-path rewrite)."""
    p = tmp_path / "dated.csv"
    p.write_text('"id","d"\n1,2024-01-03\n2,2024-02-29\n', encoding="utf-8")
    out = str(tmp_path / "dated.parquet")
    rc = main(
        ["write", "items", "id", "d", "--input", str(p), "--path", out],
        spark=spark,
    )
    assert rc == 0
    got = spark.read.parquet(out)
    import pyspark.sql.types as T2

    assert isinstance(got.schema["d"].dataType, T2.DateType), got.schema
    assert got.count() == 2


def test_cli_read_rejects_oversized_partition_key(spark, tmp_path):
    """--partition-key-size larger than the exported column list must
    error, not silently token a truncated key (wrong ring position)."""
    src = f"{SF_SMALL}/orders.parquet"
    with pytest.raises(ValueError, match="partition-key-size"):
        main(
            [
                "read", "orders", "o_orderkey", "o_custkey",
                "--path", src, "--output", str(tmp_path / "never"),
                "--offset", "0", "--partition-key-size", "3",
            ],
            spark=spark,
        )


def test_cli_write_declared_date_type(spark, tmp_path):
    """--types date must be accepted on the dynamic path, reaching
    cast_cell's DateType branch from a declared schema too."""
    p = tmp_path / "declared_date.csv"
    p.write_text('"id","d"\n1,2024-01-03\n2,notadate\n', encoding="utf-8")
    out = str(tmp_path / "declared_date.parquet")
    rc = main(
        [
            "write", "items", "id", "d",
            "--input", str(p), "--types", "long,date", "--dynamic",
            "--path", out,
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["id"]: r["d"] for r in spark.read.parquet(out).collect()}
    import datetime

    assert got[1] == datetime.date(2024, 1, 3)
    assert got[2] is None  # unparseable cell → null, row survives
