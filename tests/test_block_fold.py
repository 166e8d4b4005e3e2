"""portable.block_fold_agg — the bounded-memory deterministic float fold.

Pins the three contract properties the r5 audit asked for:
  1. BITWISE Spark ↔ DuckDB parity of the fold tree on groups that span
     every level boundary (1, block-1, block, block+1, multi-super-block),
     on full-precision doubles where the decimal route is known to drift.
  2. Numerical equivalence to the flat ordered fold (the tree reorders
     IEEE adds, so equality is rel-tol, not bitwise).
  3. Plan shape: ONE shuffle serves the rank window and all three fold
     levels — the whole point is bounding task state WITHOUT adding
     exchanges; and no group-sized collect_list remains (every
     collect_list buffer is block- or super-block-bounded).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from cqlcopy_spark.functions.portable import (
    BLOCK,
    block_fold_agg,
    sql_block_fold_agg,
)

def _fixture(group_sizes: dict[str, int]) -> pd.DataFrame:
    """Deterministic full-precision doubles (multiplicative-hash noise —
    values like 0.4373187603… whose shortest repr is 17 digits, the class
    where dsum's decimal cast diverges between engines)."""
    rows = []
    for g, n in group_sizes.items():
        seed = sum(ord(c) for c in g)  # NOT hash(): that's per-process salted
        for i in range(n):
            h = (seed % 1000003 + i) * 2654435761 % (2**32)
            rows.append((g, i, (h / 2**32 - 0.5) * 1e6))
    return pd.DataFrame(rows, columns=["g", "k", "v"])


GROUP_SIZES = {
    "one": 1,
    "under": BLOCK - 1,
    "exact": BLOCK,
    "over": BLOCK + 1,
    "super": BLOCK * BLOCK + 7,  # spans level 3: 65 blocks, 2 super-blocks
}


def test_block_fold_bitwise_matches_duckdb_twin(spark):
    pdf = _fixture(GROUP_SIZES)
    sdf = spark.createDataFrame(pdf)
    got = (
        block_fold_agg(
            sdf,
            ["g"],
            "k",
            sums={"s": F.col("v"), "sq": F.col("v") * F.col("v")},
            mins={"lo": F.col("v")},
            maxs={"hi": F.col("v")},
        )
        .orderBy("g")
        .collect()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    sql = sql_block_fold_agg(
        "SELECT * FROM t",
        ["g"],
        "k",
        sums={"s": "v", "sq": "v * v"},
        mins={"lo": "v"},
        maxs={"hi": "v"},
    )
    want = {r[0]: r for r in con.execute(sql + " ORDER BY g").fetchall()}
    assert len(got) == len(want) == len(GROUP_SIZES)
    for r in got:
        w = want[r["g"]]
        assert r["n"] == w[1] == GROUP_SIZES[r["g"]]
        # BITWISE float equality — the whole reason the tree exists
        assert r["s"] == w[2] and r["sq"] == w[3], (r, w)
        assert r["lo"] == w[4] and r["hi"] == w[5]


def test_block_fold_equivalent_to_flat_fold(spark):
    pdf = _fixture(GROUP_SIZES)
    sdf = spark.createDataFrame(pdf)
    tree = {
        r["g"]: (r["n"], r["s"])
        for r in block_fold_agg(sdf, ["g"], "k", sums={"s": F.col("v")}).collect()
    }
    for g, n in GROUP_SIZES.items():
        sub = pdf[pdf.g == g].sort_values("k")
        flat = 0.0
        for v in sub.v:
            flat += v
        tn, ts = tree[g]
        assert tn == n
        assert math.isclose(ts, flat, rel_tol=1e-12), (g, ts, flat)
        if n <= BLOCK:
            # single-block groups degenerate to the flat fold EXACTLY
            # (each upper level folds one element: 0.0 + x == x)
            assert ts == flat


def test_block_fold_plan_one_exchange_no_group_sized_state(spark):
    from tests.test_plans import plan_of, shuffle_exchanges

    sdf = spark.createDataFrame(_fixture({"a": 10}))
    p = plan_of(block_fold_agg(sdf, ["g"], "k", sums={"s": F.col("v")}))
    # the rank window's hash(g) exchange is the ONLY shuffle: every fold
    # level clusters on a superset of the window keys
    assert shuffle_exchanges(p) == 1, p
    # three fold levels present (level-1 keyed by _b1, level-2 by _b2,
    # level-3 by the group alone), each a final+partial aggregate pair =
    # 6 nodes; explain("formatted") lists each node twice (tree + detail)
    assert p.count("ObjectHashAggregate") == 12, p


def test_block_fold_rejects_nothing_but_handles_empty(spark):
    empty = spark.createDataFrame([], "g string, k long, v double")
    out = block_fold_agg(empty, ["g"], "k", sums={"s": F.col("v")}).collect()
    assert out == []


def test_block_fold_queries_exercise_multilevel_at_driver_sf():
    """The sf0.01 fixtures (the scale the DRIVER hash-checks at) must
    actually take the multi-block path, so the driver verdict covers the
    tree rather than just its degenerate single-block case: events has
    ~2000 rows per event_type (winsorize, ~31 blocks) and up to 86 per
    user (trend, 2 blocks)."""
    con = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    per_user = con.execute(
        "SELECT max(cnt) FROM (SELECT count(*) cnt FROM "
        f"'{sf}/events.parquet' GROUP BY user_id)"
    ).fetchone()[0]
    per_type = con.execute(
        "SELECT min(cnt) FROM (SELECT count(*) cnt FROM "
        f"'{sf}/events.parquet' GROUP BY event_type)"
    ).fetchone()[0]
    assert per_user > BLOCK  # timeseries_trend spans ≥2 blocks
    assert per_type > BLOCK  # winsorize/decile source spans many blocks


def test_block_fold_bitwise_parity_fuzz(spark):
    """Randomized sizes/values (hypothesis): every example builds a
    multi-group frame of extreme doubles (huge/tiny magnitudes, mixed
    signs, sub-1 fractions) and asserts BITWISE Spark↔DuckDB equality
    of the fold tree. Few examples, one Spark job each — the value
    classes extend the deterministic boundary tests above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vals = st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, width=64
    ) | st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=64)

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(1, 300), st.lists(vals, min_size=0, max_size=0)),
            min_size=1,
            max_size=6,
        ),
        st.data(),
    )
    def run(group_specs, data):
        rows = []
        for gi, (n, _) in enumerate(group_specs):
            draws = data.draw(
                st.lists(vals, min_size=n, max_size=n), label=f"g{gi}"
            )
            for i, v in enumerate(draws):
                rows.append((f"g{gi}", i, float(v)))
        pdf = pd.DataFrame(rows, columns=["g", "k", "v"])
        got = {
            r["g"]: (r["n"], r["s"])
            for r in block_fold_agg(
                spark.createDataFrame(pdf), ["g"], "k", sums={"s": F.col("v")}
            ).collect()
        }
        con = duckdb.connect()
        con.register("t", pdf)
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                sql_block_fold_agg("SELECT * FROM t", ["g"], "k", sums={"s": "v"})
            ).fetchall()
        }
        assert got == want  # bitwise: tuple equality on raw doubles

    run()
