"""ab_experiment_lift kernel property fuzz (the round's convention:
every new numeric kernel fuzzes against a pure-Python reference).

The readout is exact integer-cents sums feeding a FIXED IEEE tree
(mean → sample variance → lift/SE/z). The fuzz replays that exact tree
in Python — integer sums as Python ints (exact, like the decimal(38,0)
accumulator), then the same op order in doubles — over random event
sets with adversarial shapes: single-user variants (filtered), variance
zero (all-equal values → se may be 0 → z NULL), heavy ties, negative
values, and values at the 2-decimal contract boundary. Bitwise float
equality end to end, including the sqrt-based z."""

from __future__ import annotations

import math
import random

from tests.conftest import SF_SMALL  # noqa: F401  (repo path side effect)

from cqlcopy_spark.functions.portable import KNUTH, M32


def _variant(user_id: int) -> int:
    k1 = user_id % M32
    hi, lo = k1 // 65536, k1 % 65536
    tok = ((KNUTH * hi % M32) * 65536 % M32 + KNUTH * lo) % M32
    return tok % 2


def _ref(rows):
    """rows: (user_id, event_type, value with exactly 2 decimals)."""
    acc: dict[str, list] = {}
    for uid, et, val in rows:
        v = _variant(uid)
        c = round(val * 100)  # exact: values are 2-decimal by contract
        a = acc.setdefault(et, [0, 0, 0, 0, 0, 0])  # nc nt sc st qc qt
        if v == 0:
            a[0] += 1; a[2] += c; a[4] += c * c
        else:
            a[1] += 1; a[3] += c; a[5] += c * c
    out = set()
    for et, (nc, nt, sc, st, qc, qt) in acc.items():
        if nc <= 1 or nt <= 1:
            continue
        mean_c = (float(sc) / 100.0) / nc
        mean_t = (float(st) / 100.0) / nt
        # max(_, 0.0) mirrors the operator's greatest() clamp: the
        # cancellation lands a hair negative for constant-valued
        # variants, and sqrt of that is NaN/error territory
        var_c = max(((float(qc) / 10000.0) - ((nc * mean_c) * mean_c)) / (nc - 1), 0.0)
        var_t = max(((float(qt) / 10000.0) - ((nt * mean_t) * mean_t)) / (nt - 1), 0.0)
        lift = mean_t - mean_c
        se = math.sqrt(var_c / nc + var_t / nt)
        z = lift / se if se > 0 else None
        out.add((et, nc, nt, mean_c.hex(), mean_t.hex(), lift.hex(), se.hex(),
                 None if z is None else z.hex()))
    return out


def _run(spark, rows):
    from cqlcopy_spark.operators.behavior import _ab_lift_kernel

    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    return {
        (r["event_type"], r["n_control"], r["n_treatment"],
         r["mean_control"].hex(), r["mean_treatment"].hex(),
         r["lift"].hex(), r["se"].hex(),
         None if r["z_score"] is None else r["z_score"].hex())
        for r in _ab_lift_kernel(df).collect()
    }


def _random_rows(seed, n_rows, n_users, n_types, cents_domain):
    rng = random.Random(seed)
    return [
        (
            rng.randrange(n_users),
            f"e{rng.randrange(n_types)}",
            rng.randrange(-cents_domain, cents_domain) / 100.0,
        )
        for _ in range(n_rows)
    ]


def test_ab_lift_reference_parity_fuzz(spark):
    cases = [
        (200, 30, 4, 60000),   # full-range money incl. negatives
        (80, 6, 3, 500),       # tie-dense small domain
        (50, 50, 2, 10000),    # ~1 event/user — many filtered types
        (120, 10, 1, 100),     # single event_type, heavy ties
    ]
    for trial, (n_rows, n_users, n_types, dom) in enumerate(cases):
        for seed in range(3):
            rows = _random_rows(9000 + 10 * trial + seed, n_rows, n_users, n_types, dom)
            assert _run(spark, rows) == _ref(rows), (trial, seed)


def test_ab_lift_constant_variants_clamp_to_null_z(spark):
    """Constant-valued variants are the catastrophic-cancellation case:
    (ssq − n·mean²) lands a hair NEGATIVE (e.g. −19.99 at these group
    sizes — verified), so without the greatest(_, 0.0) clamp Spark's
    sqrt yields NaN and DuckDB ERRORS the whole oracle query. With the
    clamp, the cancellation residue is either clamped to se = 0 (z NULL,
    never an engine-dependent infinity) or a tiny positive se with a
    bitwise-zero lift (z exactly 0.0) — both "no significance", both
    engine-agreed; means come out bitwise equal either way."""
    for value in (-19.99, 3.21, 0.07):
        rows = [(u, "e", value) for u in range(40)]
        got = _run(spark, rows)
        assert got == _ref(rows)
        (row,) = got
        assert row[7] in (None, (0.0).hex()), (value, row)  # z_score
        assert row[3] == row[4], (value, row)  # identical means bitwise


def test_ab_lift_constant_per_type_fuzz(spark):
    """Fuzz shape the random generator cannot produce: every event_type
    carries ONE fixed price (the fixed-price-SKU case) — exercises the
    negative-radicand clamp across many (value, group-size) pairs."""
    rng = random.Random(77)
    for seed in range(4):
        prices = {f"e{k}": rng.randrange(-60000, 60000) / 100.0 for k in range(6)}
        rows = [
            (rng.randrange(40), et, price)
            for et, price in prices.items()
            for _ in range(rng.randrange(4, 50))
        ]
        assert _run(spark, rows) == _ref(rows), seed
