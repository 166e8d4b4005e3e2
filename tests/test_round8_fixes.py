"""Pins for the round-8 latent-defect closures (r7 VERDICT items 3a-c).

Each test pins a divergence that the sf fixtures never exercise — NULL
document text, hour keys beyond double's exact-integer range, concurrent
block-fold plan builds — so the fix can't silently regress just because
the driver's fixture data keeps passing.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tests.oracle_harness import compare


def test_boilerplate_strip_keeps_null_and_empty_docs(spark, tmp_path):
    """r7 ADVICE item 1: a NULL-text doc must SURVIVE boilerplate_strip
    as one ''-chunk row on BOTH engines. Pre-fix, posexplode of the
    NULL chunk array silently dropped the doc while the oracle's CROSS
    JOIN kept it (hash mismatch the fixtures never trip — they have no
    NULL/empty text). Exercised on a synthetic corpus with NULL text,
    empty text, sub-window docs, and enough repetition to strip."""
    from cqlcopy_spark.operators.text import _BP_ORACLE, boilerplate_strip

    rows = [
        (1, None),
        (2, ""),
        (3, "a"),                       # sub-window doc: one short chunk
        (4, "x y z a"),                 # 'x y z' boilerplate + 'a' tail
        (5, "x y z b"),
        (6, "x y z c d e"),             # df('x y z') = 3 -> stripped
        (7, "c d e unique tail words"),
    ]
    d = tmp_path / "corpus"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    out = boilerplate_strip(spark, str(d))

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet/*.parquet')"
        )
        want = con.sql(_BP_ORACLE).df()
    finally:
        con.close()
    assert compare(out, want) == []
    got = {r["doc_id"]: r for r in out.collect()}
    # NULL and empty docs both present, canonicalized to one '' chunk
    for doc in (1, 2):
        assert got[doc]["clean_text"] == "" and got[doc]["n_chunks"] == 1
    assert got[6]["n_stripped"] == 1  # 'x y z' hit the df threshold
    assert got[6]["clean_text"] == "c d e"


def test_zorder_hour_key_exact_beyond_double_range(spark):
    """r7 ADVICE item 2: layout_zorder_stats' hour key must be integer
    DIV, not floor(epoch_us / 3.6e9) — double division rounds across
    the hour boundary once epoch_us exceeds 2^53 (the oracle's // is
    exact int64 at any magnitude). 9216003599999999 µs is the smallest
    hour-boundary witness past 2^53: double division yields 2560001,
    exact division 2560000."""
    witness = 9216003599999999
    row = (
        spark.range(1)
        .select(
            F.lit(witness).alias("us"),
        )
        .select(
            F.expr("us DIV 3600000000").alias("div_hour"),
            F.floor(F.col("us") / F.lit(3_600_000_000)).alias("dbl_hour"),
        )
        .first()
    )
    assert row["div_hour"] == witness // 3_600_000_000 == 2560000
    assert row["dbl_hour"] == 2560001  # the bug the operator no longer has
    # and the operator source actually routes through DIV
    import inspect

    from cqlcopy_spark.operators.formats import layout_zorder_stats

    src = inspect.getsource(layout_zorder_stats)
    assert "DIV 3600000000" in src
    assert "unix_micros(col(\"ts\").cast(\"timestamp\")) / " not in src


def test_block_fold_agg_concurrent_plan_builds(spark):
    """r7 ADVICE item 3: block_fold_agg names its temp view with a
    per-call uuid, so CONCURRENT plan builds in the shared session
    can't interleave one builder's createOrReplaceTempView with
    another's spark.sql analysis (the module-global counter could).
    Four threads build and execute folds simultaneously; every result
    must equal the single-threaded answer, and no _bf_input_* view may
    leak afterwards."""
    from concurrent.futures import ThreadPoolExecutor

    from cqlcopy_spark.functions.portable import block_fold_agg

    df = (
        spark.range(1000)
        .select(
            (F.col("id") % 7).alias("g"),
            F.col("id").alias("k"),
            (F.col("id") * 0.123).alias("v"),
        )
    )

    def run(_):
        out = block_fold_agg(df, ["g"], "k", {"s": F.col("v")})
        return {r["g"]: (r["n"], r["s"]) for r in out.collect()}

    single = run(0)
    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(run, range(4)))
    for r in results:
        assert r == single  # bitwise: same fold order regardless of races
    leaked = [
        v.name for v in spark.catalog.listTables() if v.name.startswith("_bf_input_")
    ]
    assert leaked == []


def test_rotation_ledger_update_is_idempotent_and_mistiming_safe(tmp_path):
    """update_ledger must be a NO-OP on rounds it already processed (a
    mid-round re-run after editing modules would otherwise overwrite a
    verdict's sha with post-edit content, suppressing the fronting), and
    FAILED verdicts in a skipped intermediate round must still remove
    ledger rows when a later round is processed."""
    import json

    from cqlcopy_spark.plans.registry import all_queries
    from cqlcopy_spark.plans.rotation import (
        META_KEY,
        load_ledger,
        module_sha,
        update_ledger,
    )

    names = sorted(all_queries())
    a, b = names[0], names[1]
    ok = {"rows_match": True, "schema_match": True, "hash_match": True}
    bad = {"rows_match": True, "schema_match": True, "hash_match": False}

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({a: ok, b: ok}))
    led = update_ledger(tmp_path)
    assert led[a]["round"] == 1 and led[META_KEY]["last_round"] == 1
    true_sha = module_sha(all_queries()[a])
    assert led[a]["module_sha"] == true_sha

    # simulate the mid-round hazard: doctor the stored sha (stands in
    # for 'module edited after the driver checked'), re-run — the
    # already-processed round must NOT be re-hashed
    led[a]["module_sha"] = "0" * 64
    (tmp_path / "rotation_ledger.json").write_text(json.dumps(led))
    led2 = update_ledger(tmp_path)
    assert led2[a]["module_sha"] == "0" * 64  # untouched: round 1 done

    # r02 fails `a` but the ritual is skipped; r03 greens `b` only.
    # Processing r03 must still REMOVE a's row (failure is round-
    # independent) while b gets a fresh sha from the newest round.
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({a: bad}))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({b: ok}))
    led3 = update_ledger(tmp_path)
    assert a not in led3
    assert led3[b]["round"] == 3 and led3[META_KEY]["last_round"] == 3
    assert load_ledger(tmp_path)[META_KEY]["last_round"] == 3


def test_minhash_sink_drops_redelivered_doc_ids(spark, tmp_path):
    """First-delivery-wins: a doc_id re-emitted in a later micro-batch
    (or twice within one batch) must not re-enter the index or
    duplicate pairs — the cumulative report stays a disjoint union."""
    import os

    from cqlcopy_spark.streaming.sinks import (
        minhash_apply_batch,
        read_minhash_pairs,
    )

    base = " ".join(f"w{i}" for i in range(30))
    dup = " ".join(f"w{i}" for i in range(29)) + " zz"
    state = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(1, base), (7, dup), (7, dup)], "doc_id long, text string"
    )  # in-batch duplicate row for 7
    minhash_apply_batch(b0, 0, state)
    # batch 1 re-delivers 7 with REVISED text plus a genuinely new dup
    b1 = spark.createDataFrame(
        [(7, "completely different revised text here now"), (9, base)],
        "doc_id long, text string",
    )
    minhash_apply_batch(b1, 1, state)

    hashes = spark.read.parquet(os.path.join(state, "hashes"))
    assert hashes.filter("doc_id = 7").count() == 1  # first delivery only
    pairs = [
        (r["new_doc"], r["dup_of"], round(r["jaccard"], 3))
        for r in read_minhash_pairs(spark, state).collect()
    ]
    assert sorted(p[:2] for p in pairs) == [(7, 1), (9, 1), (9, 7)]
    assert len(pairs) == len(set(pairs))


def test_span_dedup_first_occurrence_wins(spark):
    """dedup_spans kernel semantics on planted docs: global
    (doc_id, block_idx) first occurrence survives, later copies are
    excised (across docs AND within one doc), partial tail blocks are
    units too, and empty texts drop out before the explode."""
    from cqlcopy_spark.operators.dedup import _span_dedup

    d = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x"),
            (3, "d e f a b c"),
            (4, "z z z z z z"),
            (5, ""),
            (6, "p q"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in _span_dedup(d).collect()}
    assert set(got) == {1, 2, 3, 4, 6}  # empty doc 5 filtered
    assert (got[1]["clean_text"], got[1]["n_blocks"], got[1]["n_kept"]) == (
        "a b c d e f", 2, 2,
    )
    assert (got[2]["clean_text"], got[2]["n_blocks"], got[2]["n_kept"]) == (
        "x", 2, 1,
    )
    assert (got[3]["clean_text"], got[3]["n_blocks"], got[3]["n_kept"]) == (
        "", 2, 0,
    )
    assert (got[4]["clean_text"], got[4]["n_blocks"], got[4]["n_kept"]) == (
        "z z z", 2, 1,
    )
    assert (got[6]["clean_text"], got[6]["n_blocks"], got[6]["n_kept"]) == (
        "p q", 1, 1,
    )


def test_semdedup_verdict_invariants(spark):
    """dedup_semdedup: every drop names a smaller-id within-cell pruner
    at/above threshold, and the (pruner, dropped) pair must be contained
    in the EXHAUSTIVE near-dup pair set (cells restrict candidates, they
    can never invent a pair), with the bitwise-identical cosine."""
    from cqlcopy_spark.operators.similarity import _NEARDUP_COS
    from cqlcopy_spark.plans.registry import all_queries
    from tests.conftest import SF_SMALL

    qs = all_queries()
    verdicts = qs["dedup_semdedup"](spark, SF_SMALL).collect()
    exact = {
        (r["v1"], r["v2"]): r["cosine"]
        for r in qs["dedup_embedding_cosine"](spark, SF_SMALL).collect()
    }
    dropped = [r for r in verdicts if not r["keep"]]
    assert dropped, "fixture should produce at least one drop"
    for r in verdicts:
        if r["keep"]:
            assert r["pruned_by"] is None and r["prune_cos"] is None
        else:
            assert r["pruned_by"] < r["vec_id"]
            assert r["prune_cos"] >= _NEARDUP_COS
            key = (r["pruned_by"], r["vec_id"])
            assert key in exact, key
            assert exact[key] == r["prune_cos"]  # bitwise


def test_span_dedup_matches_pure_python_reference_fuzz(spark):
    """Seeded-random fuzz of dedup_spans' kernel against an independent
    pure-Python first-occurrence simulation: a 5-word alphabet and short
    docs force heavy block collisions (cross-doc, in-doc, partial-tail),
    exercising the slice arithmetic at every length mod 3."""
    import random

    from cqlcopy_spark.operators.dedup import _span_dedup

    rng = random.Random(80801)
    words = ["aa", "bb", "cc", "dd", "ee"]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 10))))
        for i in range(300)
    ]

    seen: set[str] = set()
    expected = {}
    for doc_id, text in docs:
        if not text:
            continue
        ws = text.split(" ")
        blocks = [" ".join(ws[3 * i : 3 * i + 3]) for i in range((len(ws) + 2) // 3)]
        kept = []
        for b in blocks:
            if b not in seen:
                seen.add(b)
                kept.append(b)
        expected[doc_id] = (" ".join(kept), len(blocks), len(kept))

    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_blocks"], r["n_kept"])
        for r in _span_dedup(d).collect()
    }
    assert got == expected


def test_rotation_ledger_halts_at_unparseable_round(tmp_path):
    """A truncated/mid-write round file must NOT advance last_round past
    itself (its verdicts would be lost forever once the file heals) —
    processing stops there and resumes next invocation."""
    import json

    from cqlcopy_spark.plans.registry import all_queries
    from cqlcopy_spark.plans.rotation import META_KEY, update_ledger

    names = sorted(all_queries())
    a, b = names[0], names[1]
    ok = {"rows_match": True, "schema_match": True, "hash_match": True}
    bad = {"rows_match": True, "schema_match": True, "hash_match": False}

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({a: ok, b: ok}))
    led = update_ledger(tmp_path)
    assert led[META_KEY]["last_round"] == 1

    # r02 is mid-write (truncated JSON), r03 is complete and fails `a`
    (tmp_path / "CORRECTNESS_r02.json").write_text('{"trunc')
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({a: bad}))
    led2 = update_ledger(tmp_path)
    assert led2[META_KEY]["last_round"] == 1  # halted AT r02
    assert a in led2  # r03's failure not applied out of order

    # the write completes; the next invocation drains r02 then r03
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({b: ok}))
    led3 = update_ledger(tmp_path)
    assert led3[META_KEY]["last_round"] == 3
    assert a not in led3  # r03's failure finally applied
    assert b in led3

    # complete-but-wrong-type file ('[]' decodes fine, never 'heals'):
    # it carries no verdicts, so it is skipped and advanced PAST —
    # r05 behind it must still apply this same invocation
    (tmp_path / "CORRECTNESS_r04.json").write_text("[]")
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({a: ok}))
    led4 = update_ledger(tmp_path)
    assert led4[META_KEY]["last_round"] == 5
    assert a in led4 and led4[a]["round"] == 5


def test_lm_transition_score_hand_computed(spark, tmp_path):
    """lm_transition_score semantics on a corpus small enough to compute
    by hand: bigram counts c2(a,b)=2, c2(b,a)=1, prefix counts c1(a)=2,
    c1(b)=1, and vocabulary {a, b, solo} → V=3 (the 1-token doc carries
    no bigram but DOES widen the smoothing denominator), so doc 1
    ('a b a') scores [(2+1)/(2+3), (1+1)/(1+3)] = [0.6, 0.5] and doc 2
    ('a b') scores [0.6]."""
    import os

    d = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "solo"), (4, None)],
        "doc_id long, text string",
    )
    d.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))

    from cqlcopy_spark.plans.registry import all_queries

    rows = {
        r["doc_id"]: r
        for r in all_queries()["lm_transition_score"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {1, 2}  # <2 tokens and NULL text carry no bigram
    r1, r2 = rows[1], rows[2]
    assert r1["n_bigrams"] == 2
    assert r1["avg_trans_prob"] == (0.6 + 0.5) / 2  # ordered fold
    assert r1["min_trans_prob"] == 0.5
    assert (r2["n_bigrams"], r2["avg_trans_prob"], r2["min_trans_prob"]) == (
        1, 0.6, 0.6,
    )

    # cross-engine pin ON THIS corpus: the oracle must agree on the
    # 1-token-doc vocabulary widening too (the review-caught latent
    # divergence — the fixture SFs have no <2-token docs to catch it)
    import duckdb

    from cqlcopy_spark.operators.text import _LM_ORACLE
    from tests.oracle_harness import compare

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(str(tmp_path), 'documents.parquet')}/*.parquet')"
        )
        want = con.sql(_LM_ORACLE).df()
    finally:
        con.close()
    got_df = all_queries()["lm_transition_score"](spark, str(tmp_path))
    assert not compare(got_df, want)


def test_curation_funnel_dedup_gate_planted(spark, tmp_path):
    """The driver fixture has no duplicate texts at sf0.01, so the
    funnel's exact-dedup keeper gate never fires there — pin it on a
    planted corpus where it is the discriminating gate, and pin the
    whole relation against the DuckDB oracle on the same corpus."""
    import os

    # 10 words, all gates green: lang 'en' wins ties (no foreign
    # markers), 4 stopwords, ttr 1.0, quality 0.6+10/256*0.4 >= 0.5
    base = "the data value table one two three four five six"
    other = "the data value table seven eight nine ten eleven twelve"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),   # dup: fails ONLY the keeper gate
        (3, base, "en", "s", len(base)),   # dup
        (4, other, "en", "s", len(other)),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(rows, schema).write.parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )

    from cqlcopy_spark.operators.text import _funnel_oracle
    from cqlcopy_spark.plans.registry import all_queries
    from tests.oracle_harness import compare

    got = all_queries()["curation_funnel"](spark, str(tmp_path))
    r = got.collect()[0]
    assert (
        r["n_total"], r["n_lang"], r["n_gopher"], r["n_dedup"], r["n_quality"]
    ) == (4, 4, 4, 2, 2)

    import duckdb

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(str(tmp_path), 'documents.parquet')}/*.parquet')"
        )
        want = con.sql(_funnel_oracle()).df()
    finally:
        con.close()
    assert not compare(got, want)


def test_rotation_skipped_round_green_records_empty_sha_row(tmp_path):
    """r8 ADVICE: a green verdict in a SKIPPED intermediate round with no
    pre-existing ledger row must still record a row (round + EMPTY sha)
    — without it a later rewrite of that module never triggers
    content-hash fronting and falls silently to the oldest-first sweep.
    __spark_entry__.queries() treats the empty-sha row as
    front-on-next-window."""
    import json

    from cqlcopy_spark.plans.registry import all_queries
    from cqlcopy_spark.plans.rotation import META_KEY, update_ledger

    names = sorted(all_queries())
    a, b = names[0], names[1]
    ok = {"rows_match": True, "schema_match": True, "hash_match": True}

    # r01 greens `a` in a SKIPPED round (never processed alone), r02 is
    # the newest and greens only `b`: processing both at once makes r01
    # an intermediate round whose module state is gone.
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({a: ok}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({b: ok}))
    led = update_ledger(tmp_path)
    assert led[META_KEY]["last_round"] == 2
    assert led[a] == {"round": 1, "module_sha": ""}  # front next window
    assert led[b]["round"] == 2 and led[b]["module_sha"] != ""
