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


# ---------------------------------------------------------------------------
# union-find (dedup_components driver path) vs brute-force reachability
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=0, max_size=40
    )
)
def test_union_find_matches_bruteforce_reachability(edges):
    """The driver-side fast path of dedup_components must label every
    edge endpoint with the minimum node reachable from it — checked
    against an O(V·E) brute-force closure on small random graphs."""
    from cqlcopy_spark.operators.dedup import _union_find_min_labels

    got = dict(_union_find_min_labels(edges))
    nodes = {n for e in edges for n in e}
    assert set(got) == nodes
    # brute force: iterate min-label propagation to fixpoint
    label = {n: n for n in nodes}
    changed = True
    while changed:
        changed = False
        for u, v in edges:
            m = min(label[u], label[v])
            if label[u] != m or label[v] != m:
                label[u] = label[v] = m
                changed = True
    assert got == label
