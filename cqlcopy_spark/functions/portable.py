"""Portable column expressions: deterministic across Spark and the DuckDB
oracle regardless of row/partition order.

Floating-point SUM is order-dependent, and Spark's partition-parallel
aggregation visits rows in a different order than DuckDB's scan. The fix:
cast each per-row DOUBLE term to DECIMAL(38,10) (deterministic rounding of
the identical IEEE value in both engines), SUM exactly in decimal, and cast
the exact result back to DOUBLE. Every step is order-insensitive, so the
final double is bit-identical in both engines. Use `dsum` / `davg` for any
aggregated float the driver will value-hash (SURVEY.md §5 oracle-parity
hazards).

At scale this costs one decimal codegen path per agg — still whole-stage
codegen, still map-side partial aggregation; no Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,10)"


# The final decimal→double conversion goes THROUGH A STRING on purpose:
# DuckDB's direct decimal→double cast is not correctly rounded (int128 →
# double, then ÷10^scale — two roundings), while decimal→varchar is exact
# and varchar→double is correctly rounded in both engines. Observed at
# sf0.01: direct cast gave 1061400897.6700001 in DuckDB vs ...897.67 in
# Spark. Cost: one string format per OUTPUT GROUP, not per row.


def dsum(col: Column) -> Column:
    """Order-insensitive double SUM (exact decimal accumulation)."""
    return F.sum(col.cast(_DEC)).cast("string").cast("double")


def davg(col: Column) -> Column:
    """Order-insensitive double AVG = exact decimal sum / count."""
    return F.sum(col.cast(_DEC)).cast("string").cast("double") / F.count(col)


#: SQL fragments mirroring dsum/davg for the DuckDB oracle strings.
def sql_dsum(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    # parenthesized so embedding in larger arithmetic keeps the Spark
    # grouping: `0.2 * sql_davg(x)` must be 0.2*(S/n), not (0.2*S)/n —
    # the two differ in the last ulp and can flip threshold comparisons
    return f"({sql_dsum(expr)} / COUNT({expr}))"


# --- exact integer-moment route (preferred for 2-decimal money data) ------
# When the inputs are exactly representable scaled integers (prices in
# cents, integral quantities, 2-decimal rates), sums should accumulate as
# INTEGERS: per-row long arithmetic stays in whole-stage codegen (measured
# 2.3× faster than the decimal(38,10)-per-row dsum route on agg_stats) and
# the result is the exact rational, not a sum of rounded doubles. Spark
# accumulates in overflow-proof decimal(38,0); the DuckDB twin's
# SUM(BIGINT) widens to HUGEINT. Both convert to double ONCE per group via
# the exact varchar route. Caller contract: the per-ROW expression must be
# int64-safe (document the bound at the call site).


def exact_sum(c: Column) -> Column:
    """Exact integer sum → correctly-rounded double (once per group)."""
    return F.sum(c.cast("decimal(38,0)")).cast("string").cast("double")


def sql_exact_sum(expr: str) -> str:
    """DuckDB twin of exact_sum; `expr` must be BIGINT-valued."""
    return f"CAST(CAST(SUM({expr}) AS VARCHAR) AS DOUBLE)"


def cents(c: Column) -> Column:
    """Exact integer cents of a 2-decimal money double."""
    return F.round(c * 100).cast("long")


def sql_cents(expr: str) -> str:
    return f"CAST(round({expr} * 100) AS BIGINT)"


# --- two-level fixed-block ordered fold (full-precision float sums) -------
# For FULL-PRECISION doubles the decimal dsum route diverges by a 1-ulp
# digit-string artifact (similarity.py's centroid note), so grouped sums of
# raw float data use a DETERMINISTIC-ORDER BINARY FOLD: both engines add the
# same terms in the same order, bit-identical by IEEE determinism. The naive
# form (collect the whole group, sort, fold) holds one GROUP-sized list in a
# single aggregation buffer — the one OOM shape a hot key can hit at 100×.
#
# block_fold_agg bounds that state with a fixed-depth fold TREE: rows get a
# rank within their group (row_number over the caller's unique order key),
# blocks of `block` consecutive ranks fold first (level 1, ≤ block terms of
# state), `block` block-sums fold per super-block (level 2, ≤ block terms),
# and the super-block sums fold per group (level 3, ≤ n/block² terms). With
# block=64 a 10^9-row group tops out at ~244k level-3 terms (a few MB) while
# groups ≥ 65 rows — including the sf0.01 fixtures — genuinely exercise the
# multi-block path the driver hash-verifies. The SQL twin emits the SAME
# tree, so every IEEE add matches; when a level folds a single element the
# result equals the flat fold exactly (0.0 + x == x), which keeps small
# groups bit-identical with the pre-tree formulation.
#
# Plan shape: the rank window shuffles on hash(group); every subsequent
# groupBy clusters on a SUPERSET of the window keys, so HashPartitioning
# (group) satisfies each ClusteredDistribution — ONE exchange total for
# window + all three fold levels (pinned in test_plans.py).

BLOCK = 64


def block_fold_agg(
    df,
    group_cols: "list[str]",
    order_col: "str | list[str]",
    sums: "dict[str, Column]",
    mins: "dict[str, Column] | None" = None,
    maxs: "dict[str, Column] | None" = None,
    count_alias: str = "n",
    block: int = BLOCK,
):
    """Group df by group_cols with bounded-memory deterministic float sums.

    Returns a DataFrame[group_cols…, count_alias, *sums, *mins, *maxs]
    where each `sums` column is the three-level block fold of its per-row
    expression in order_col order (order_col MUST be unique per group),
    and mins/maxs are plain MIN/MAX of their expressions (combined
    per-level — order-insensitive, so levels don't change them). Use
    sql_block_fold_agg for the DuckDB twin; results are bit-identical.

    Build-cost note (measured on timeseries_trend at sf0.1): PySpark
    analyzes each Dataset EAGERLY, so composing the three fold levels
    through the DataFrame API re-analyzed a deepening lambda-heavy tree
    on every plan build — ~0.6s of driver-side Catalyst work per call,
    doubling the bench wall of every caller. The tree is therefore
    assembled as ONE Spark-SQL text over a pre-projected temp view
    (single analysis pass, ~0.1s); the physical plan is identical, and
    all sums fold in one aggregate pass with a struct accumulator whose
    per-field add sequence is bitwise-equal to the SQL twin's per-list
    folds.
    """
    mins, maxs = mins or {}, maxs or {}
    names = list(sums)
    # order_col: one column name or a list (composite order — the
    # combination must still be unique per group). Passing the order a
    # caller's plan ALREADY sorts by (e.g. winsorize's (value,
    # event_id) rank order) lets the fold's rank window reuse that
    # sort instead of adding one.
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    # pre-project every expression to a plain column so the SQL text
    # only references simple names (callers keep passing Columns)
    proj = df.select(
        *group_cols,
        *[F.col(c).alias(f"_ok{i}") for i, c in enumerate(order_cols)],
        *[e.alias(f"_v_{nm}") for nm, e in sums.items()],
        *[e.alias(f"_mn_{nm}") for nm, e in mins.items()],
        *[e.alias(f"_mx_{nm}") for nm, e in maxs.items()],
    )
    # uuid-derived view name (r7 ADVICE item 3): the module-global
    # counter this replaces could interleave under CONCURRENT plan
    # builds in the shared session — two threads incrementing then
    # createOrReplaceTempView'ing the same name race between one
    # builder's registration and the other's spark.sql analysis. A
    # per-call random name makes each build's view private; it is
    # still dropped right after the eager analysis below.
    import uuid

    view = f"_bf_input_{uuid.uuid4().hex}"
    proj.createOrReplaceTempView(view)

    g = ", ".join(f"`{c}`" for c in group_cols)

    def _lvl(src: str, keys: str, order: str, first: bool) -> str:
        if first:
            payload = ", ".join(f"`_v_{nm}` AS `{nm}`" for nm in names)
            cnt = "COUNT(1)"
            mn = ", ".join(f"MIN(`_mn_{nm}`) AS `{nm}`" for nm in mins)
            mx = ", ".join(f"MAX(`_mx_{nm}`) AS `{nm}`" for nm in maxs)
        else:
            payload = ", ".join(f"`{nm}` AS `{nm}`" for nm in names)
            cnt = f"SUM(`{count_alias}`)"
            mn = ", ".join(f"MIN(`{nm}`) AS `{nm}`" for nm in mins)
            mx = ", ".join(f"MAX(`{nm}`) AS `{nm}`" for nm in maxs)
        acc0 = ", ".join(f"0.0d AS `{nm}`" for nm in names)
        merge = ", ".join(f"acc.`{nm}` + s.`{nm}` AS `{nm}`" for nm in names)
        outs = ", ".join(f"_acc.`{nm}` AS `{nm}`" for nm in names)
        agg_extras = "".join(f", {x}" for x in (mn, mx) if x)
        ref_extras = "".join(f", `{nm}`" for nm in [*mins, *maxs])
        return f"""
SELECT {keys}, `{count_alias}`, {outs}{ref_extras}
FROM (
  SELECT {keys}, {cnt} AS `{count_alias}`,
         aggregate(array_sort(collect_list(struct({order} AS _k, {payload}))),
                   struct({acc0}),
                   (acc, s) -> struct({merge})) AS _acc{agg_extras}
  FROM ({src})
  GROUP BY {keys}
)"""

    ok = ", ".join(f"`_ok{i}`" for i in range(len(order_cols)))
    base = f"""SELECT *, FLOOR(_rn / {block}) AS _b1,
       FLOOR(_rn / {block * block}) AS _b2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {ok}) - 1
             AS _rn
      FROM {view})"""
    l1 = _lvl(base, f"{g}, _b2, _b1", "_rn", first=True)
    l2 = _lvl(l1, f"{g}, _b2", "_b1", first=False)
    l3 = _lvl(l2, g, "_b2", first=False)
    out = df.sparkSession.sql(l3)
    # spark.sql analyzes eagerly, so the view can be dropped right away
    df.sparkSession.catalog.dropTempView(view)
    return out


def sql_block_fold_agg(
    source: str,
    group_cols: "list[str]",
    order_expr: str,
    sums: "dict[str, str]",
    mins: "dict[str, str] | None" = None,
    maxs: "dict[str, str] | None" = None,
    count_alias: str = "n",
    block: int = BLOCK,
) -> str:
    """DuckDB twin of block_fold_agg: a complete SELECT over `source`
    (any SELECT or WITH…SELECT; it is inlined as a subquery — DuckDB
    supports nested CTEs) producing the identical fold tree. Counts are
    CAST AS BIGINT at each SUM so the rollup stays int64 on both sides.
    """
    mins, maxs = mins or {}, maxs or {}
    g = ", ".join(group_cols)

    def fold(key: str, val: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list({val} ORDER BY {key})), (a, b) -> a + b)"
        )

    l1_cols = ", ".join(
        [f"COUNT(*) AS {count_alias}"]
        + [f"{fold('_rn', e)} AS {nm}" for nm, e in sums.items()]
        + [f"MIN({e}) AS {nm}" for nm, e in mins.items()]
        + [f"MAX({e}) AS {nm}" for nm, e in maxs.items()]
    )
    l2_cols = ", ".join(
        [f"CAST(SUM({count_alias}) AS BIGINT) AS {count_alias}"]
        + [f"{fold('_b1', nm)} AS {nm}" for nm in sums]
        + [f"MIN({nm}) AS {nm}" for nm in mins]
        + [f"MAX({nm}) AS {nm}" for nm in maxs]
    )
    l3_cols = ", ".join(
        [f"CAST(SUM({count_alias}) AS BIGINT) AS {count_alias}"]
        + [f"{fold('_b2', nm)} AS {nm}" for nm in sums]
        + [f"MIN({nm}) AS {nm}" for nm in mins]
        + [f"MAX({nm}) AS {nm}" for nm in maxs]
    )
    return f"""
WITH _bf_r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY {order_expr}) - 1 AS _rn
  FROM ({source}) _bf_src
),
_bf_l1 AS (
  SELECT {g}, _rn // {block * block} AS _b2, _rn // {block} AS _b1, {l1_cols}
  FROM _bf_r GROUP BY {g}, _b2, _b1
),
_bf_l2 AS (
  SELECT {g}, _b2, {l2_cols}
  FROM _bf_l1 GROUP BY {g}, _b2
)
SELECT {g}, {l3_cols}
FROM _bf_l2 GROUP BY {g}
"""


# Portable 64-bit multiplicative hash (Knuth): same arithmetic is expressible
# in DuckDB SQL, unlike Spark's xxhash64/Murmur. Used by the token-range scan
# emulation (SURVEY.md §2A op 16) so resume/range logic is oracle-checkable.
KNUTH = 2654435761  # 2^32 * (golden ratio - 1), classic multiplicative constant
M32 = 4294967296  # 2^32


def portable_token(key: Column) -> Column:
    """Deterministic pseudo-token in [0, 2^32) from ANY int64 key column
    (negative keys included).

    Overflow-free by construction: (key·KNUTH) mod 2^32 is computed via
    a 16-bit split of pmod(key, 2^32), so every intermediate stays below
    2^48 — the naive single multiply exceeds int64 for keys ≥ ~3.47e9
    (ANSI Spark aborts, DuckDB BIGINT errors, numpy wraps: three
    different behaviors at production key ranges).

    k1 uses pmod, NOT `%`: Spark/DuckDB `%` follow the DIVIDEND sign, so
    a negative key would make k1 negative — and then Spark's
    double-div+cast `hi` (trunc toward zero), DuckDB's `//` (floor), and
    numpy's divisor-sign `%` (already nonnegative) all disagree. Forcing
    k1 ∈ [0, 2^32) makes floor == trunc and aligns all three engines;
    paged_source mirrors this arithmetic in numpy (its `%` is natively
    pmod for a positive divisor)."""
    k1 = F.pmod(key.cast("long"), F.lit(M32))
    hi = (k1 / F.lit(65536)).cast("long")
    lo = k1 % F.lit(65536)
    t1 = (F.lit(KNUTH) * hi) % F.lit(M32)
    t2 = (t1 * F.lit(65536)) % F.lit(M32)
    return (t2 + F.lit(KNUTH) * lo) % F.lit(M32)


def sql_portable_token(expr: str) -> str:
    # double-mod = pmod: DuckDB % follows the dividend sign, so negative
    # keys need the +M32 fold to land in [0, 2^32) like Spark's pmod
    k1 = f"(((CAST({expr} AS BIGINT) % {M32}) + {M32}) % {M32})"
    hi = f"({k1} // 65536)"
    lo = f"({k1} % 65536)"
    t1 = f"(({KNUTH} * {hi}) % {M32})"
    t2 = f"(({t1} * 65536) % {M32})"
    return f"(({t2} + {KNUTH} * {lo}) % {M32})"


def portable_token_composite(keys: "list[Column]") -> Column:
    """Ring token over a COMPOSITE partition key (--partition-key-size
    > 1; read.go tokens the first N columns together): fold the
    per-column tokens with a 31-multiplier mod 2^32. One column reduces
    to portable_token exactly, so single-key callers and oracles are
    unchanged. Intermediates stay < 2^37 — int64-safe in both engines."""
    acc: Column | None = None
    for k in keys:
        t = portable_token(k)
        acc = t if acc is None else (acc * F.lit(31) + t) % F.lit(M32)
    assert acc is not None, "portable_token_composite: empty key list"
    return acc


def sql_portable_token_composite(exprs: "list[str]") -> str:
    acc: str | None = None
    for e in exprs:
        t = sql_portable_token(e)
        acc = t if acc is None else f"((({acc}) * 31 + {t}) % {M32})"
    assert acc is not None
    return acc
