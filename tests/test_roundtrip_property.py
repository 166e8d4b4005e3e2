"""Property test (SURVEY.md §5): CSV COPY round-trip is lossless for
arbitrary scalar rows — hypothesis searches the corner space (quotes,
commas, the null literal as data, signed 64-bit extremes, doubles
needing shortest-round-trip)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from cqlcopy_spark.config import CopyConfig
from cqlcopy_spark.sinks.csv_sink import write_csv
from cqlcopy_spark.sources.csv_source import read_csv

CFG = CopyConfig()

SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("n", T.LongType()),
        T.StructField("x", T.DoubleType()),
    ]
)

# printable-ish text without newlines (multiline CSV is a reader option,
# not a typing-semantics concern) and without NUL (parquet/JVM hostile)
_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), blacklist_characters="\r\n\x00"
    ),
    max_size=24,
)

_row = st.tuples(
    st.one_of(_text, st.none()),
    st.one_of(st.booleans(), st.none()),
    st.one_of(st.integers(min_value=-(2**63), max_value=2**63 - 1), st.none()),
    st.one_of(
        st.floats(allow_nan=False, allow_infinity=False, width=64), st.none()
    ),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=40))
def test_csv_roundtrip_lossless(spark, tmp_path_factory, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = str(tmp_path_factory.mktemp("prop") / "roundtrip")
    write_csv(df, out, CFG)
    back = read_csv(spark, out, SCHEMA, CFG)

    def canon(frame):
        return sorted(
            ((r["name"], r["flag"], r["n"], r["x"]) for r in frame.collect()),
            key=lambda t: tuple((v is None, v) for v in t),
        )

    assert canon(back) == canon(df)
