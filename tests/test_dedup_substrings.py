"""dedup_substrings semantics: arbitrary-length exact-substring dedup.

Pins the three contract points that distinguish it from dedup_spans'
fixed 3-word blocks (r8 VERDICT item 4), plus a seeded-random fuzz
against an independent pure-Python simulation — the SQL oracle shares
the window/LOCF algorithm, so a shared mistake would hash-match; the
Python reference is the genuinely independent implementation.
"""

from __future__ import annotations

import random

from cqlcopy_spark.operators.dedup import _SUBSTR_K, _span_dedup, _substring_dedup


def _ref(docs: list[tuple[int, str]], k: int) -> dict[int, tuple[str, int, int]]:
    """Independent pure-Python reference: first occurrence of each
    k-token window (by (doc_id, start) order) wins; a token is removed
    iff covered by a window whose content occurred earlier."""
    first: dict[str, tuple[int, int]] = {}
    for doc_id, text in sorted(docs):
        if not text:
            continue
        ws = text.split(" ")
        for s in range(len(ws) - k + 1):
            sub = " ".join(ws[s : s + k])
            first.setdefault(sub, (doc_id, s))
    out = {}
    for doc_id, text in docs:
        if not text:
            continue
        ws = text.split(" ")
        removed = [False] * len(ws)
        for s in range(len(ws) - k + 1):
            sub = " ".join(ws[s : s + k])
            if first[sub] != (doc_id, s):
                for j in range(s, s + k):
                    removed[j] = True
        kept = [w for w, r in zip(ws, removed) if not r]
        out[doc_id] = (" ".join(kept), len(ws), sum(removed))
    return out


def _run(spark, docs, k=_SUBSTR_K):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in _substring_dedup(d, k).collect()
    }


def test_long_run_excised_where_block_dedup_leaves_residue(spark):
    """The planted case r8 VERDICT demands: an 8-word run repeated at a
    block-PHASE offset. dedup_spans' non-overlapping 3-word blocks
    align differently in the two docs, so NO block matches and the
    duplicate survives verbatim; dedup_substrings' stride-1 windows are
    phase-free and excise the whole run."""
    run = " ".join(f"w{i}" for i in range(8))
    docs = [
        (1, f"p1 p2 {run} t1 t2"),  # run starts at token 2
        (2, f"x1 {run} y1 y2"),  # run starts at token 1 — phase shifted
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")

    spans = {r["doc_id"]: r["clean_text"] for r in _span_dedup(d).collect()}
    assert "w0" in spans[2] and "w7" in spans[2], (
        "planted case no longer shows block residue — the 3-word blocks "
        "unexpectedly aligned; rephase the fixture"
    )

    subs = _run(spark, docs)
    assert subs[1] == (f"p1 p2 {run} t1 t2", 12, 0)  # first occurrence intact
    assert subs[2] == ("x1 y1 y2", 11, 8)  # the whole run gone, no stubs


def test_short_repeats_untouched_and_boundaries(spark):
    """Runs shorter than k survive everywhere; docs shorter than k have
    no windows and pass through; empty/NULL texts are dropped like
    dedup_spans; a FULL-doc duplicate empties the later doc."""
    five = "a b c d e"
    docs = [
        (1, f"{five} one two"),
        (2, f"{five} six seven"),  # shares only a 5-token run: kept
        (3, "tiny doc"),
        (4, ""),
        (5, None),
        (6, f"{five} one two"),  # exact full duplicate of doc 1
    ]
    got = _run(spark, docs)
    assert got[1] == (f"{five} one two", 7, 0)
    assert got[2] == (f"{five} six seven", 7, 0)
    assert got[3] == ("tiny doc", 2, 0)
    assert 4 not in got and 5 not in got
    assert got[6] == ("", 7, 7)


def test_periodic_self_overlap_keeps_first_occurrence(spark):
    """Within ONE doc, a periodic run ('a' * 12) self-overlaps: the
    first window (start 0) is the argmin and always survives — the
    conservative resolution removes every token covered only by later
    duplicate windows, leaving the first k tokens... minus the ones a
    duplicate window still covers. Pin the exact fold so the contract
    is explicit: starts 1..6 are duplicates, covering tokens 1..11."""
    docs = [(1, " ".join(["a"] * 12))]
    got = _run(spark, docs)
    assert got[1] == ("a", 12, 11)


def test_matches_pure_python_reference_fuzz(spark):
    """Seeded-random fuzz vs the independent reference: a 3-word
    alphabet and 4..14-token docs force dense window collisions —
    cross-doc, in-doc, periodic, and boundary-phase cases all occur.
    k=4 keeps windows likely while still exercising multi-token
    coverage arithmetic."""
    rng = random.Random(90901)
    words = ["aa", "bb", "cc"]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randrange(0, 15))))
        for i in range(250)
    ]
    assert _run(spark, docs, k=4) == _ref(docs, k=4)
