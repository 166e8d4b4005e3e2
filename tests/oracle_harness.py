"""Local replica of the driver's DuckDB-oracle compare (SURVEY.md §5).

Runs a registered Spark query and its oracle SQL over the same sf dir,
sorts columns by name (like the driver), sorts rows canonically, and
compares values EXACTLY (bitwise for floats) — the strictest emulation of
an order-insensitive value hash. Used by tests/test_oracle_parity.py.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from cqlcopy_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        kind = df[c].dtype.kind
        if kind in "iu":
            df[c] = df[c].astype("int64")
        elif kind == "M":
            # tz-aware (e.g. DuckDB TIMESTAMPTZ) normalizes through UTC
            # — a bare astype raises on tz-aware input and would crash
            # the harness instead of producing a verdict
            s = pd.to_datetime(df[c])
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif kind == "O":
            # probe past leading nulls; convert null-safely (tuple(None)
            # raises — a nulled list cell must stay None, not crash)
            probe = df[c].dropna()
            if len(probe) and isinstance(probe.iloc[0], (list, np.ndarray)):
                df[c] = df[c].apply(
                    lambda v: None
                    if v is None
                    else tuple(np.asarray(v).tolist())
                )
    # stable order-insensitive row order
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _kind_class(s: pd.Series) -> str:
    """Coarse dtype class for driver-hash parity. The driver's value hash is
    dtype-sensitive across the int/float and date/datetime boundaries (round-2
    evidence: DuckDB SUM(int)->HUGEINT->float64 and floor()->DOUBLE hash-
    mismatched Spark's int64 despite equal values), while integer *widths*
    (int32 vs int64) hash the same. Classes: int-like, float, datetime,
    other."""
    k = s.dtype.kind
    if k in "iub":
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "O" and len(s):
        v = s.dropna()
        if len(v) and type(v.iloc[0]).__name__ == "date":
            return "datetime?"  # datetime.date objects vs datetime64 — asymmetric
    return "other"


def compare(spark_df, oracle_pdf: pd.DataFrame, float_exact: bool = True) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    raw_got, raw_want = spark_df.toPandas(), oracle_pdf
    problems: list[str] = []
    for c in sorted(set(raw_got.columns) & set(raw_want.columns)):
        if raw_got[c].count() == 0 or raw_want[c].count() == 0:
            # no non-null values on one side: object-typed Spark columns
            # carry no evidence of their element class, so a dtype-class
            # verdict would be a guess (e.g. an empty DATE column reads
            # as 'other' vs datetime64) — let the value compare decide
            continue
        a, b = _kind_class(raw_got[c]), _kind_class(raw_want[c])
        if a != b:
            problems.append(
                f"col {c}: dtype-class asymmetry spark={raw_got[c].dtype}({a}) "
                f"oracle={raw_want[c].dtype}({b}) — driver hash is dtype-sensitive"
            )
    if problems:
        return problems
    got = _canon(raw_got)
    want = _canon(raw_want)
    if list(got.columns) != list(want.columns):
        return [f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"]
    if len(got) != len(want):
        problems.append(f"row count differs: spark={len(got)} oracle={len(want)}")
        return problems
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            a = a.astype("float64")
            b = b.astype("float64")
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
            if not float_exact:
                eq |= np.isclose(a, b, rtol=1e-12, atol=1e-12, equal_nan=True)
            if not eq.all():
                i = int(np.argmin(eq))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={a[i]!r} oracle={b[i]!r}"
                )
        else:
            eq = pd.Series(a).eq(pd.Series(b)) | (pd.Series(a).isna() & pd.Series(b).isna())
            if not eq.all():
                i = int(eq.idxmin())
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={a[i]!r} oracle={b[i]!r}"
                )
    return problems
