"""Round-5 curation operators: BPE merge training verified against a
pure-Python reference implementation (the op itself has no SQL oracle —
data-dependent iteration), plus sharding invariants."""

from __future__ import annotations

from collections import Counter

import duckdb

from cqlcopy_spark.operators.curation import _BPE_STEPS, _N_SHARDS
from cqlcopy_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

QUERIES = all_queries()


def _reference_bpe(word_counts: dict[str, int], steps: int):
    """Sennrich et al. 2016 reference: repeatedly merge the most frequent
    adjacent symbol pair (leftmost-first, non-overlapping), ties broken
    by pair string ascending."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, steps + 1):
        pair_freq: Counter[tuple[str, str]] = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pair_freq[(syms[i], syms[i + 1])] += c
        if not pair_freq:
            break
        # max by (freq, then pair ascending) — match the Spark orderBy
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), freq = best
        merges.append((step, f"{a} {b}", freq))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_matches_reference(spark):
    got = [
        (r["merge_rank"], r["pair"], r["freq"])
        for r in QUERIES["bpe_train_merges"](spark, SF_SMALL).collect()
    ]
    wc = dict(
        duckdb.sql(
            f"""
            SELECT token, COUNT(*) FROM (
              SELECT unnest(string_split(lower(text), ' ')) AS token
              FROM read_parquet('{SF_SMALL}/documents.parquet'))
            WHERE regexp_matches(token, '^[a-z]+$')
            GROUP BY token
            """
        ).fetchall()
    )
    want = _reference_bpe(wc, _BPE_STEPS)
    assert got == want
    assert len(got) == _BPE_STEPS  # corpus is rich enough to not run dry


def test_bpe_greedy_merge_is_leftmost_nonoverlapping(spark):
    """'aaa' under merge (a,a) must become [aa, a], not [aa, aa]."""
    from pyspark.sql import functions as F

    df = (
        spark.createDataFrame([("aaa",), ("a",), ("abab",)], "token string")
        .withColumn(
            "s",
            F.expr("transform(sequence(1, length(token)), i -> substring(token, i, 1))"),
        )
        .withColumn(
            "m",
            F.expr(
                "aggregate(slice(s, 2, greatest(size(s) - 1, 0)),"
                " array(element_at(s, 1)),"
                " (acc, x) -> IF(element_at(acc, -1) = 'a' AND x = 'a',"
                " concat(slice(acc, 1, size(acc) - 1), array('aa')),"
                " concat(acc, array(x))))"
            ),
        )
    )
    got = {r["token"]: r["m"] for r in df.collect()}
    assert got["aaa"] == ["aa", "a"]
    assert got["a"] == ["a"]
    assert got["abab"] == ["a", "b", "a", "b"]


def test_shard_assign_covers_all_docs(spark):
    rows = QUERIES["shard_assign"](spark, SF_SMALL).collect()
    n_docs = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(0 <= r["shard"] < _N_SHARDS for r in rows)


def test_bpe_segment_matches_reference(spark):
    """Per-doc subword counts must equal applying the reference merges
    (test_bpe_matches_reference's oracle) to each document's words."""
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in QUERIES["bpe_segment_docs"](spark, SF_SMALL).collect()
    }
    rows = duckdb.sql(
        f"SELECT doc_id, lower(text) FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    import re as _re

    wc: Counter[str] = Counter()
    doc_words = {}
    for doc_id, text in rows:
        ws = [w for w in text.split(" ") if _re.fullmatch("[a-z]+", w)]
        doc_words[doc_id] = ws
        wc.update(ws)
    merges = _reference_bpe(dict(wc), _BPE_STEPS)
    seg = {w: list(w) for w in wc}
    for _, pair, _freq in merges:
        a, b = pair.split(" ")
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[w] = out
    want = {
        doc_id: (len(ws), sum(len(seg[w]) for w in ws))
        for doc_id, ws in doc_words.items()
        if ws
    }
    assert got == want


def test_hll_union_is_exact_and_estimate_bounded(spark):
    """HLL register updates are order-insensitive maxes, so the union of
    per-type sketches must estimate IDENTICALLY to one global sketch —
    the mergeability contract that makes shard→global rollups re-scan
    free. The estimate itself must sit within 5% of the true distinct."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.catalog import table

    rows = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["sketch_distinct_users"](spark, SF_SMALL).collect()
    }
    e = table(spark, SF_SMALL, "events")
    direct = e.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))).collect()[0][0]
    assert rows["ALL"] == direct  # union-of-parts == sketch-of-whole
    exact = e.select("user_id").distinct().count()
    assert abs(rows["ALL"] - exact) / exact < 0.05


def test_sketch_distinct_verify_empty_and_liveness(spark):
    """The driver-checkable HLL verification relation must be EMPTY on
    the honest pipeline, and each invariant must fire on a corruption
    of the OP'S OUTPUT (the verify consumes sketch_distinct_users'
    rows — a regression in the op itself must reach the driver): a
    negative tolerance trips both accuracy checks; shifting the ALL
    row breaks the bitwise mergeability equality; dropping / inventing
    / duplicating rows trips the row-set checks."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.analytics import _sketch_distinct_violations

    out = QUERIES["sketch_distinct_verify"](spark, SF_SMALL)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["kind", "event_type", "metric"]

    kinds = {
        r["kind"]
        for r in _sketch_distinct_violations(spark, SF_SMALL, tol=-1.0).collect()
    }
    assert {"type_estimate_out_of_bounds", "global_estimate_out_of_bounds"} <= kinds

    honest = QUERIES["sketch_distinct_users"](spark, SF_SMALL)
    shifted = honest.withColumn(
        "approx_users",
        F.when(
            F.col("event_type") == "ALL", F.col("approx_users") + 7
        ).otherwise(F.col("approx_users")),
    )
    kinds = {
        r["kind"]
        for r in _sketch_distinct_violations(spark, SF_SMALL, got=shifted).collect()
    }
    assert "union_not_bitwise_equal_to_whole" in kinds

    one_type = honest.filter(F.col("event_type") != "ALL").limit(1)
    doctored = (
        honest.join(one_type.select("event_type"), "event_type", "left_anti")
        .unionByName(
            spark.createDataFrame(
                [("bogus_type", 3), ("ALL", 1)],
                "event_type string, approx_users long",
            )
        )
    )
    kinds = {
        r["kind"]
        for r in _sketch_distinct_violations(spark, SF_SMALL, got=doctored).collect()
    }
    assert {"missing_type_row", "extra_type_row", "all_row_count_wrong"} <= kinds

    # a doubled per-type row inner-matches the exact side and a NULL
    # event_type slips both ALL filters — each needs its own check
    doubled = honest.unionByName(one_type).unionByName(
        spark.createDataFrame(
            [(None, 5)], "event_type string, approx_users long"
        )
    )
    kinds = {
        r["kind"]
        for r in _sketch_distinct_violations(spark, SF_SMALL, got=doubled).collect()
    }
    assert {"duplicate_type_row", "null_type_row"} <= kinds


def test_bpe_verify_empty_and_liveness(spark):
    """bpe_verify must be EMPTY on the honest trainer output, and every
    invariant must be able to fire on a planted corruption."""
    from pyspark.sql import functions as F

    from cqlcopy_spark.operators.curation import (
        _bpe_learn,
        _bpe_violations,
        _bpe_word_counts,
    )

    out = QUERIES["bpe_verify"](spark, SF_SMALL)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["kind", "item", "detail"]

    words = _bpe_word_counts(spark, SF_SMALL).persist()
    merges, syms = _bpe_learn(words)

    def kinds(m, s):
        return {r["kind"] for r in _bpe_violations(spark, m, s).collect()}

    # rank gap + nonpositive freq
    doctored = [(r + 1 if i == 2 else r, p, f) for i, (r, p, f) in enumerate(merges)]
    assert "rank_integrity_violation" in kinds(doctored, syms)
    # frequency increasing with rank
    doctored = list(merges)
    doctored[-1] = (doctored[-1][0], doctored[-1][1], doctored[0][2] + 10)
    assert "freq_increased_with_rank" in kinds(doctored, syms)
    # lossy fold: drop every word's first symbol
    lossy = syms.withColumn("syms", F.slice(F.col("syms"), 2, 10_000))
    assert "fold_not_lossless" in kinds(merges, lossy)
    # off-alphabet symbol: replace the symbol array wholesale
    alien = syms.withColumn("syms", F.array(F.col("token"), F.lit("zz")))
    assert "symbol_outside_merge_closure" in kinds(merges, alien)


def test_sketch_verify_ignores_null_user_ids(spark, tmp_path):
    """hll_sketch_agg IGNORES NULL inputs; the verify's exact references
    must too (r8 ADVICE) — with NULL user_ids planted in every type the
    exact-vs-estimate comparison would otherwise drift by one per type
    and the honest pipeline would flag spurious violations."""
    import datetime

    from cqlcopy_spark.operators.analytics import (
        _sketch_distinct_violations,
        sketch_distinct_users,
    )

    sf = str(tmp_path / "sf_nulls")
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0, (i % 37) if i % 5 else None, f"type_{i % 3}", 1.0, "{}")
        for i in range(600)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")

    got = sketch_distinct_users(spark, sf)
    out = _sketch_distinct_violations(spark, sf, got=got)
    assert out.count() == 0, out.collect()
