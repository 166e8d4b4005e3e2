"""Pins for the shared hash-TakeOrdered training sample and the
deterministic min-struct keeper (r13 VERDICT item 2 + r13 ADVICE).

The defect these pin against: through r13, five training sites sampled
with `filter(pmod(vec_id, stride) == 0).collect()`. On a fixed-residue
id space — an all-odd sharded/snowflake id sequence with an even
stride, a perfectly realistic production id scheme — residue class 0 is
EMPTY, so training died at np.stack([]) (or silently trained on a
garbage-small sample when the class was merely sparse). The shared
`_train_sample` helper (similarity.py) uses the r11 k-means recipe —
the cap smallest portable_token multiplicative-hash rows — which yields
min(n, cap) rows on ANY non-empty id space.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _odd_snowflake_frame(spark, n=3000, dim=8):
    """An all-odd, snowflake-scale (> 2^40), stride-hostile id space:
    every id ≡ 1 (mod 2), so any even stride's residue class 0 is empty.
    Embeddings are deterministic functions of the id (no RNG)."""
    from pyspark.sql import functions as F

    base = 1 << 41
    return (
        spark.range(n)
        .select((F.lit(base) + F.col("id") * 2 + 1).alias("vec_id"))
        .select(
            "vec_id",
            F.expr(
                f"transform(sequence(1, {dim}), "
                "j -> CAST(pmod(vec_id * j, 97) AS DOUBLE) / 97.0)"
            ).alias("emb"),
        )
    )


def test_train_sample_never_empty_on_all_odd_ids(spark):
    """The r13 crash repro: an all-odd id space with n >> cap. The old
    pmod-stride filter (stride = n // cap, even for these sizes) returns
    ZERO rows; _train_sample must return exactly `cap` rows."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.similarity import _train_sample

    e = _odd_snowflake_frame(spark, n=3000)
    cap = 100
    # the old recipe, verbatim — demonstrates the failure mode is real
    stride = max(1, 3000 // cap)  # 30, even
    assert stride % 2 == 0
    old = e.filter(F.pmod(F.col("vec_id"), F.lit(stride)) == 0).count()
    assert old == 0, "precondition: the stride filter IS empty here"

    sample = _train_sample(e, cap)
    assert len(sample) == cap
    # vec_id-sorted (layout-independent accumulation order, r11 ADVICE)
    ids = [r["vec_id"] for r in sample]
    assert ids == sorted(ids)
    assert len(set(ids)) == cap


def test_train_sample_small_corpus_returns_everything(spark):
    from cqlcopy_spark.operators.similarity import _train_sample

    e = _odd_snowflake_frame(spark, n=7)
    sample = _train_sample(e, 100)
    assert len(sample) == 7


def test_train_sample_deterministic_across_layouts(spark):
    """Same rows regardless of partitioning: the sample is a pure
    function of the id set, not the scan layout."""
    from cqlcopy_spark.operators.similarity import _train_sample

    e = _odd_snowflake_frame(spark, n=500)
    a = _train_sample(e, 50)
    b = _train_sample(e.repartition(7), 50)
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    assert [list(r["emb"]) for r in a] == [list(r["emb"]) for r in b]


def test_index_build_survives_all_odd_ids(spark, tmp_path):
    """End-to-end: the persisted-index build (the NEW r13 site at
    vector_index._fit_from_base) trains and encodes an all-odd
    snowflake-scale corpus without crashing, and the stored codes cover
    every id. Before the fix this died at np.stack([]) whenever
    n > _PQ_TRAIN_CAP put an even stride over the odd ids; at this n the
    stride was 1 — the pin uses a monkeypatched cap to force the
    stride>1 regime the crash needed."""
    import cqlcopy_spark.operators.similarity as sim
    from cqlcopy_spark.operators.vector_index import (
        read_index_codes,
        vector_index_build,
    )

    e = _odd_snowflake_frame(spark, n=600, dim=64)
    state = str(tmp_path / "idx")
    orig = sim._PQ_TRAIN_CAP
    sim._PQ_TRAIN_CAP = 64
    try:
        vector_index_build(e, state)
    finally:
        sim._PQ_TRAIN_CAP = orig
    stored = read_index_codes(spark, state)
    assert stored.count() == 600
    assert stored.select("vec_id").distinct().count() == 600


def test_all_five_sites_share_the_helper():
    """AST regrow guard: no operator module may reintroduce the
    pmod-stride sample collect. Every `.collect()`ed training sample in
    similarity.py / vector_index.py must route through _train_sample."""
    import ast
    import inspect

    import cqlcopy_spark.operators.similarity as sim
    import cqlcopy_spark.operators.vector_index as vix

    for mod in (sim, vix):
        tree = ast.parse(inspect.getsource(mod))
        for node in ast.walk(tree):
            # the old site's fingerprint: F.pmod(col("vec_id"), F.lit(stride))
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "pmod"
                and any(
                    isinstance(a, ast.Call)
                    and isinstance(a.func, ast.Name)
                    and a.func.id == "col"
                    and a.args
                    and isinstance(a.args[0], ast.Constant)
                    and a.args[0].value == "vec_id"
                    for a in node.args
                )
                and any(
                    isinstance(a, ast.Call)
                    and isinstance(a.func, ast.Attribute)
                    and a.func.attr == "lit"
                    and a.args
                    and isinstance(a.args[0], ast.Name)
                    and a.args[0].id == "stride"
                    for a in node.args
                )
            ):
                raise AssertionError(
                    f"{mod.__name__}: pmod-stride training sample "
                    f"reintroduced at line {node.lineno} — use "
                    "_train_sample (r13 VERDICT item 2)"
                )


def test_keep_min_by_deterministic_on_conflicting_payloads(spark):
    """keep_min_by picks the minimum payload struct per key regardless
    of row order / partitioning — the property bare dropDuplicates lacks
    (r13 ADVICE: replay idempotence of the sink deltas)."""
    from cqlcopy_spark.functions.skew import keep_min_by

    rows = [(1, "b", 9), (1, "a", 5), (2, "z", 1), (1, "a", 4)]
    df = spark.createDataFrame(rows, "k long, s string, v long")
    for frame in (df, df.repartition(5), df.orderBy("v")):
        got = sorted(
            tuple(r) for r in keep_min_by(frame, "k").collect()
        )
        assert got == [(1, "a", 4), (2, "z", 1)]
    # column order preserved, including key-not-first layouts
    df2 = df.select("s", "k", "v")
    out = keep_min_by(df2, "k")
    assert out.columns == ["s", "k", "v"]


def test_keep_min_by_keys_only_frame(spark):
    from cqlcopy_spark.functions.skew import keep_min_by

    df = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    assert sorted(r["k"] for r in keep_min_by(df, "k").collect()) == [1, 2]


def test_keep_min_by_no_window(spark):
    """Shape: partial-combining groupBy, never a window over the key."""
    from cqlcopy_spark.functions.skew import keep_min_by

    from tests.test_plans import plan_of

    df = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    p = plan_of(keep_min_by(df, "doc_id"))
    assert "Window" not in p, p
