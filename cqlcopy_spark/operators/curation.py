"""Corpus-curation operators round 5: PII scrubbing, URL/domain analytics,
vocabulary coverage, deterministic sharding, and BPE merge training.

Reference has no analog (it is a CSV↔Cassandra loader, write.go/read.go);
these extend the mandated LLM-data-pipeline surface (BASELINE.json:6)
alongside operators/text.py and dedup.py.

All batch ops here are pure built-in-function pipelines (whole-stage
codegen, no Python UDFs). The only driver-side loop is BPE's per-iteration
argmax — one row per merge step, the standard vocab-level formulation that
keeps the corpus scan out of the loop entirely.

Oracle-parity notes:
- Regexes use the Java-regex ∩ RE2 dialect intersection (character
  classes, bounded repetition, word boundaries — no lookaround).
- The synthetic PII / URL payloads are derived from doc_id with identical
  integer arithmetic and string concatenation in both engines, so the
  fixtures exercise real matches instead of vacuous zero counts.
- Hash sharding parses the first 8 hex digits of md5 (lowercase hex in
  both engines): Spark `conv(_, 16, 10)`, DuckDB `('0x' || _)::BIGINT`.
- Integer/integer division (`cnt / total`) is an exactly-rounded IEEE
  divide of exact integers in both engines — bitwise-stable coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col
from pyspark.sql.window import Window

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import register

# ---------------------------------------------------------------------------
# pii_redact — detect + scrub emails / IPv4 / phone numbers
# ---------------------------------------------------------------------------

# Dialect-intersection patterns (valid Java regex AND RE2).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"

# doc_id-derived PII planted identically in both engines (the synthetic
# corpus has no digits/emails — without this the op would verify nothing).
_PII_AUG_SQL = (
    "text || ' user' || CAST(doc_id AS VARCHAR) || '@mail.example.com"
    " 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || ' +1-555-' || lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0')"
)


def _pii_aug_col():
    return F.concat(
        col("text"),
        F.lit(" user"),
        col("doc_id").cast("string"),
        F.lit("@mail.example.com 10.0."),
        (col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((col("doc_id") * 7) % 256).cast("string"),
        F.lit(" +1-555-"),
        F.lpad(((col("doc_id") * 37) % 10000).cast("string"), 4, "0"),
    )


_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS BIGINT) AS n_ips,
  CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
  md5(regexp_replace(regexp_replace(regexp_replace(t,
        '{_EMAIL_RE}', '<EMAIL>', 'g'),
        '{_IP_RE}', '<IP>', 'g'),
        '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM aug
ORDER BY doc_id
"""


@register("pii_redact", oracle=_PII_ORACLE)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over documents: count emails / IPv4
    addresses / phone numbers per doc and emit the md5 of the scrubbed
    text. Pure codegen map — zero shuffles beyond the final sort; at
    100 TB this runs as an embarrassingly parallel scan with the regex
    compiled once per task (Java regex is JIT-compiled JVM-side)."""
    d = table(spark, sf_dir, "documents")
    t = _pii_aug_col()
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _IP_RE, "<IP>"
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_IP_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# url_domains_top — URL extraction + domain frequency (crawl analytics)
# ---------------------------------------------------------------------------

_URL_AUG_SQL = (
    "text || ' see https://' || source || '.example.org/' || lang"
    " || '/p' || CAST(doc_id AS VARCHAR)"
)
_DOMAIN_RE = r"https://([A-Za-z0-9.-]+)/"

_URL_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, {_URL_AUG_SQL} AS t FROM documents WHERE doc_id % 3 = 0
)
SELECT regexp_extract(t, '{_DOMAIN_RE}', 1) AS domain,
       COUNT(*) AS n_docs
FROM aug
GROUP BY domain
ORDER BY n_docs DESC, domain
LIMIT 10
"""


@register("url_domains_top", oracle=_URL_ORACLE)
def url_domains_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 source domains by document count (crawl-style provenance
    analytics). URLs are doc_id-derived (corpus has none) and extracted
    with a shared-dialect regex. Plan: filter+map scan → partial agg →
    shuffle of ≤ #domains rows → TakeOrdered 10. The LIMIT-after-agg is
    tie-broken on domain so the top-10 set is deterministic."""
    d = table(spark, sf_dir, "documents").filter(col("doc_id") % 3 == 0)
    t = F.concat(
        col("text"),
        F.lit(" see https://"),
        col("source"),
        F.lit(".example.org/"),
        col("lang"),
        F.lit("/p"),
        col("doc_id").cast("string"),
    )
    return (
        d.select(F.regexp_extract(t, _DOMAIN_RE, 1).alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(col("n_docs").desc(), "domain")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# vocab_coverage — frequency vocabulary with cumulative corpus coverage
# ---------------------------------------------------------------------------

_VOCAB_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
vocab AS (
  SELECT token, COUNT(*) AS cnt FROM tok WHERE token <> '' GROUP BY token
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
top AS (SELECT token, cnt FROM vocab ORDER BY cnt DESC, token LIMIT 30)
SELECT
  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rnk,
  token,
  CAST(cnt AS BIGINT) AS cnt,
  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING)
       AS BIGINT) AS cum_cnt,
  CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING)
       AS BIGINT) / total AS coverage
FROM top, tot
ORDER BY rnk
"""


@register("vocab_coverage", oracle=_VOCAB_ORACLE)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 vocabulary with cumulative token-coverage fraction — the
    "how big must the vocab be to cover X% of the corpus" curve every
    tokenizer design starts from.

    Scale shape: one explode scan → token groupBy (partial agg map-side,
    one shuffle of vocab-sized data) → TakeOrdered 30 → 30-row window.
    The cumulative window runs AFTER the limit, so the single-partition
    window sort touches 30 rows, never the vocabulary. `total` rides in
    as a broadcast 1-row cross join — no driver collect. coverage =
    BIGINT/BIGINT, an exactly-rounded IEEE divide in both engines."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split(col("text"), " ")).alias("token")).filter(
        col("token") != ""
    )
    # total and top-30 both derive from vocab; without the persist the
    # corpus-wide explode+groupBy lineage executes twice (CLAUDE.md
    # shared-intermediate rule) — at 100 TB that doubles the dominant scan
    vocab = tok.groupBy("token").agg(F.count("*").alias("cnt")).persist()
    total = vocab.agg(F.sum("cnt").alias("total"))
    top = vocab.orderBy(col("cnt").desc(), "token").limit(30)
    w = Window.orderBy(col("cnt").desc(), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number()
            .over(Window.orderBy(col("cnt").desc(), "token"))
            .cast("bigint")
            .alias("rnk"),
            "token",
            "cnt",
            F.sum("cnt").over(w).alias("cum_cnt"),
            (F.sum("cnt").over(w) / col("total")).alias("coverage"),
        )
        .orderBy("rnk")
    )


# ---------------------------------------------------------------------------
# shard_assign — deterministic content-hash sharding (reproducible layout)
# ---------------------------------------------------------------------------

_N_SHARDS = 16

_SHARD_ORACLE = f"""
SELECT
  CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % {_N_SHARDS} AS shard,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY shard
ORDER BY shard
"""


@register("shard_assign", oracle=_SHARD_ORACLE)
def shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash shard assignment + per-shard balance
    stats — the reproducible alternative to random repartitioning when a
    100 TB corpus must land in stable training shards across reruns.

    The shard key is the first 32 bits of md5(text), an engine-portable
    hash (Spark's xxhash64/hash seeds are JVM-specific): Spark parses the
    hex via `conv(_, 16, 10)`, DuckDB via the '0x' varchar cast — both
    exact on 8 hex digits (< 2^32, no BIGINT overflow). Plan: pure map +
    one {_N_SHARDS}-group partial agg; at scale the same key feeds
    `df.repartition(shard)` + partitionBy writes for co-located shards."""
    d = table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(col("text")), 1, 8), 16, 10).cast("bigint")
        % _N_SHARDS
    )
    return (
        d.groupBy(shard.alias("shard"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# snapshot_diff — full-outer content diff between two curation snapshots
# ---------------------------------------------------------------------------

# Two snapshot states derived deterministically from the one documents
# fixture: the PREVIOUS run is missing the docs "added since" (mod-17
# slice), still carries the docs "removed since" (mod-29 slice), and
# holds an older text revision for the "edited" mod-23 slice. The mods
# are coprime so the classes overlap realistically (an edited doc can
# also be one that was later removed, etc. — precedence below).
_DIFF_ADDED_MOD, _DIFF_ADDED_RES = 17, 3      # in current only
_DIFF_REMOVED_MOD, _DIFF_REMOVED_RES = 29, 11  # in previous only
_DIFF_EDITED_MOD, _DIFF_EDITED_RES = 23, 5    # text differs

_SNAPSHOT_DIFF_ORACLE = f"""
WITH prev AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % {_DIFF_EDITED_MOD} = {_DIFF_EDITED_RES}
              THEN text || ' [v1]' ELSE text END AS text
  FROM documents
  WHERE doc_id % {_DIFF_ADDED_MOD} <> {_DIFF_ADDED_RES}
),
cur AS (
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % {_DIFF_REMOVED_MOD} <> {_DIFF_REMOVED_RES}
),
joined AS (
  SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id,
         COALESCE(c.lang, p.lang) AS lang,
         CASE WHEN p.doc_id IS NULL THEN 'added'
              WHEN c.doc_id IS NULL THEN 'removed'
              WHEN md5(c.text) <> md5(p.text) THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id
)
SELECT status, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM joined
GROUP BY status, lang
ORDER BY status, lang
"""


@register("snapshot_diff", oracle=_SNAPSHOT_DIFF_ORACLE)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-run diff: FULL OUTER join of two snapshot states on the
    doc key, classifying every document added / removed / changed /
    unchanged by content hash — the audit a pipeline runs between
    curation versions before shipping a training set ("this rerun
    touched 0.4% of docs" vs "half the corpus silently changed").
    Comparison is by md5(text), never by text equality on the wire: the
    join moves 16-byte digests + keys, not documents.

    Scale shape: both snapshots shuffle once on doc_id for the full
    outer join (inherent to a diff — every key must meet its twin);
    with both snapshots written bucketed by doc_id (the layout a
    versioned corpus store would use, tests/test_bucketing.py's move)
    the exchange disappears entirely and the diff is a zero-shuffle
    zip of co-located buckets. The status aggregate is map-side partial
    over ≤ 4×|langs| groups."""
    d = table(spark, sf_dir, "documents")
    prev = d.filter(
        col("doc_id") % _DIFF_ADDED_MOD != _DIFF_ADDED_RES
    ).select(
        col("doc_id").alias("p_doc_id"),
        col("lang").alias("p_lang"),
        F.md5(
            F.when(
                col("doc_id") % _DIFF_EDITED_MOD == _DIFF_EDITED_RES,
                F.concat(col("text"), F.lit(" [v1]")),
            ).otherwise(col("text"))
        ).alias("p_hash"),
    )
    cur = d.filter(
        col("doc_id") % _DIFF_REMOVED_MOD != _DIFF_REMOVED_RES
    ).select("doc_id", "lang", F.md5(col("text")).alias("c_hash"))
    status = (
        F.when(col("p_doc_id").isNull(), "added")
        .when(col("doc_id").isNull(), "removed")
        .when(col("c_hash") != col("p_hash"), "changed")
        .otherwise("unchanged")
    )
    return (
        cur.join(prev, col("doc_id") == col("p_doc_id"), "full_outer")
        .select(
            F.coalesce(col("doc_id"), col("p_doc_id")).alias("doc_id"),
            F.coalesce(col("lang"), col("p_lang")).alias("lang"),
            status.alias("status"),
        )
        .groupBy("status", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("status", "lang")
    )


# ---------------------------------------------------------------------------
# domain_upsample — deterministic fractional upsampling with replacement
# ---------------------------------------------------------------------------

# Per-language mixture repeat factors (the LLM data-mixing move: repeat
# high-value / low-resource domains fractionally, downsample the
# over-represented one). 2.5 means "2 copies of every doc + a hash-chosen
# 50% get a third"; 0.5 is a pure downsample — one unified rule.
_UPSAMPLE_W = {"en": 0.5, "zh": 1.5, "es": 1.0, "de": 2.0, "fr": 3.25}
_UPSAMPLE_SALT = 77  # decorrelates the fractional pick from every other
#                      doc_id-hash decision (split/rebalance/reshuffle)
_M32_F = 4294967296.0


def _upsample_parts(
    weights: "dict[str, float] | None" = None,
) -> "dict[str, tuple[int, int]]":
    """lang -> (whole copies, fractional-copy token threshold). Takes an
    explicit weight map for the property fuzz; defaults to the workload
    constants."""
    out = {}
    for lang, w in (_UPSAMPLE_W if weights is None else weights).items():
        base = int(w)
        out[lang] = (base, int(round((w - base) * _M32_F)))
    return out


def _n_copies_col(parts: "dict[str, tuple[int, int]]", salt: int) -> "F.Column":
    """The fractional-copy kernel: n_copies = ⌊w⌋ + [token(doc_id, salt)
    < frac(w)·2³²] as a literal CASE over the weight map — no weights
    join, pure map. Unknown langs default to one copy, no fractional
    pick. Factored for the property fuzz
    (tests/test_upsample_property.py), which replays the rule in pure
    Python over random weight maps including w<1, integer w, and
    frac ≈ 0/1 threshold-rounding edges."""
    from cqlcopy_spark.functions.portable import portable_token_composite

    base = F.lit(1)
    thr = F.lit(0)
    for lang, (b, t) in parts.items():
        base = F.when(col("lang") == lang, F.lit(b)).otherwise(base)
        thr = F.when(col("lang") == lang, F.lit(t)).otherwise(thr)
    tok = portable_token_composite([col("doc_id"), F.lit(salt)])
    return (base + F.when(tok < thr, 1).otherwise(0)).cast("long")


def _domain_upsample_oracle() -> str:
    from cqlcopy_spark.functions.portable import sql_portable_token_composite

    tok = sql_portable_token_composite(["doc_id", str(_UPSAMPLE_SALT)])
    parts = _upsample_parts()
    base_case = " ".join(f"WHEN '{k}' THEN {v[0]}" for k, v in parts.items())
    thr_case = " ".join(f"WHEN '{k}' THEN {v[1]}" for k, v in parts.items())
    return f"""
WITH counted AS (
  SELECT doc_id, lang, source,
         CAST((CASE lang {base_case} ELSE 1 END)
              + (CASE WHEN {tok} < (CASE lang {thr_case} ELSE 0 END)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
  FROM documents
)
SELECT doc_id, lang, source, n_copies,
       unnest(range(1, n_copies + 1)) AS copy_id
FROM counted WHERE n_copies > 0
"""


@register("domain_upsample", oracle=_domain_upsample_oracle())
def domain_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture upsampling WITH replacement — the data-mix
    step that repeats low-resource/high-value domains by a fractional
    factor (2.5 → two copies of every doc plus a hash-chosen half get a
    third) and downsamples the over-represented one (0.5) under the SAME
    rule: n_copies = ⌊w⌋ + [token(doc, salt) < frac(w)·2³²]. Membership
    of the fractional copy is a pure function of doc_id (portable hash,
    salted so it is independent of split/rebalance decisions), so the
    mixture is reproducible across runs, engines, and partition layouts
    — `df.sample(fraction, withReplacement=True)` can promise none of
    that. Downstream, epoch_reshuffle's (epoch, doc) keying spreads the
    copies apart in training order.

    Scale shape: pure map — a literal CASE for the weights (no weights
    join at all), one explode whose output is exactly n_copies rows per
    doc (Σw·N total, the mixture's own size); nothing shuffles at any
    corpus size. copy_id rides along so downstream stages can
    distinguish (and e.g. salt per-copy augmentations)."""
    n_copies = _n_copies_col(_upsample_parts(), _UPSAMPLE_SALT)
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", n_copies.alias("n_copies"))
        .filter(col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_copies",
            # sequence(1, 0) would generate a DESCENDING [1, 0] — the
            # n_copies > 0 filter above is load-bearing, not cosmetic
            F.explode(F.sequence(F.lit(1).cast("long"), col("n_copies"))).alias(
                "copy_id"
            ),
        )
    )


# ---------------------------------------------------------------------------
# token_budget_select — per-domain greedy selection to a token budget
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 2000  # tokens admitted per language

_TOKEN_BUDGET_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
runs AS (
  SELECT lang, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens
  FROM toks
)
SELECT lang, doc_id, n_tokens, cum_tokens
FROM runs WHERE cum_tokens - n_tokens < {_TOKEN_BUDGET}
"""


def _token_budget_kernel(toks: DataFrame, budget: int) -> DataFrame:
    """Greedy admission kernel over a (doc_id, lang, n_chars, n_tokens)
    frame: best-first (n_chars DESC, doc_id) cumulative sum per lang,
    admit while the budget was not exhausted before the doc. Factored
    for the property fuzz (tests/test_token_budget_property.py) —
    tie-dense n_chars is
    exactly the cumulative-boundary class CLAUDE.md's ROWS-frame rule
    exists for, and the fuzz feeds it adversarial tie runs."""
    w = (
        Window.partitionBy("lang")
        .orderBy(col("n_chars").desc(), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(col("cum_tokens") - col("n_tokens") < budget)
        .select("lang", "doc_id", "n_tokens", "cum_tokens")
    )


@register("token_budget_select", oracle=_TOKEN_BUDGET_ORACLE)
def token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain greedy selection to a fixed token budget: walk each
    language's docs best-first (n_chars DESC as the quality proxy,
    doc_id tiebreak) and admit docs until the budget is spent — the
    curation step that turns "weights say 2000 tokens of French" into a
    concrete doc set. A doc is admitted iff the budget was not already
    exhausted BEFORE it (cum − own < budget), so the last admitted doc
    may overshoot — the standard greedy knapsack contract, and the form
    whose window needs no self-join.

    Portability: the cumulative sum uses a ROWS frame over a
    tie-deterministic key (n_chars DESC, doc_id) — a RANGE frame would
    share one cumulative value across an equal-quality run and make the
    budget boundary fall on NO row (CLAUDE.md cumulative-weight rule).
    Counts are integers end to end: no float hazard anywhere.

    Scale shape — cutoff prefilter BEFORE the exact window (the
    sample_per_group move): the naive plan shuffles the whole corpus
    into one sort run per language. Instead, a per-(lang, n_chars)
    token histogram — a partial-combining groupBy whose shuffle is
    bounded by (#langs × distinct doc lengths), independent of corpus
    row count — yields each language's admission-score cutoff: the
    smallest n_chars whose strictly-greater buckets haven't already
    spent the budget. Only docs at-or-above the cutoff (superset of the
    admitted set, exact by the monotonicity of the bucket prefix sums —
    no doc below the cutoff can be admitted, every doc at or above it
    may be) reach the lang-keyed window, so the per-domain sort handles
    ~budget-sized survivors at ANY corpus size. The cutoff table is one
    row per language: broadcast by construction.

    The exact integer histogram strictly dominates the sketch-quantile
    cutoff sketched earlier for this op: n_chars is an integer score,
    so the "sketch" degenerates to a collision-free mergeable histogram
    with NO error margin, no survivor-shortfall fallback pass, and
    bitwise-identical results to the unfiltered window (the oracle SQL
    is untouched). A continuous double-valued admission score is where
    sketch_quantiles_merge's epsilon-rank summary + safety margin would
    take over. toks is persisted: both the histogram and the survivor
    pass consume it, and re-tokenizing the full corpus twice is the
    expensive lineage CLAUDE.md's self-join rule exists for."""
    d = table(spark, sf_dir, "documents")
    # persisted for the whole session (dedup.py precedent): the caller
    # consumes the returned frame lazily, so this function can't
    # unpersist — the InMemoryRelation stays pinned and can splice into
    # later same-lineage plan builds (CLAUDE.md conf-override note);
    # bench.py/tests clearCache() between queries for exactly this reason
    toks = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.split(col("text"), " ")).cast("long").alias("n_tokens"),
    ).persist()
    return _token_budget_prefiltered(toks, _TOKEN_BUDGET)


def _token_budget_prefiltered(toks: DataFrame, budget: int) -> DataFrame:
    """Histogram-cutoff prefilter + exact kernel over a (doc_id, lang,
    n_chars, n_tokens) frame — factored so the equivalence fuzz
    (tests/test_token_budget_property.py) can prove it bitwise-equal to
    the bare _token_budget_kernel on adversarial inputs (tie-dense
    scores, boundary-exact budgets, NULL lang)."""
    # per-(lang, n_chars) token mass; one row per distinct length — the
    # ROWS cumulative below is tie-free by construction. NULL lang
    # groups as its own key, exactly like the kernel's partitionBy.
    hist = toks.groupBy("lang", "n_chars").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    hw = (
        Window.partitionBy("lang")
        .orderBy(col("n_chars").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cutoffs = (
        hist.withColumn("cum_bucket", F.sum("bucket_tokens").over(hw))
        # same admission predicate as the kernel, at bucket granularity:
        # keep buckets whose strictly-better mass hasn't spent the budget
        .filter(col("cum_bucket") - col("bucket_tokens") < budget)
        .groupBy("lang")
        .agg(
            F.min("n_chars").alias("cutoff"),
            # NULL n_chars sorts LAST under the kernel's DESC order, so
            # its bucket survives only when every bucket does; min()
            # skips it, and `n_chars >= cutoff` below evaluates NULL —
            # without this flag a NULL-score doc the kernel admits would
            # be silently dropped by the prefilter (r11 ADVICE)
            F.max(col("n_chars").isNull()).alias("null_kept"),
        )
        .withColumnRenamed("lang", "cutoff_lang")
    )
    # NULL-SAFE equi-join (review finding): a plain `on="lang"` inner
    # join drops NULL-lang docs that the window/oracle both admit as
    # their own partition — eqNullSafe keeps the NULL group while still
    # planning a broadcast hash join (join_null_safe's precedent).
    survivors = (
        toks.join(
            F.broadcast(cutoffs), toks["lang"].eqNullSafe(cutoffs["cutoff_lang"])
        )
        .filter(
            (col("n_chars") >= col("cutoff"))
            | (col("n_chars").isNull() & col("null_kept"))
        )
        .drop("cutoff_lang", "cutoff", "null_kept")
    )
    return _token_budget_kernel(survivors, budget)


# ---------------------------------------------------------------------------
# epoch_reshuffle — seeded reproducible training-order shuffle + sharding
# ---------------------------------------------------------------------------

_RESHUFFLE_EPOCHS = 2  # epochs materialized; each gets an independent permutation
_RESHUFFLE_SHARDS = 8  # training shards per epoch (parallelism knob at scale)


def _epoch_reshuffle_oracle() -> str:
    from cqlcopy_spark.functions.portable import sql_portable_token_composite

    key = sql_portable_token_composite(["e.epoch", "doc_id"])
    return f"""
WITH keyed AS (
  SELECT e.epoch, doc_id, {key} AS sort_key
  FROM documents
  CROSS JOIN (SELECT unnest(range({_RESHUFFLE_EPOCHS})) AS epoch) e
)
SELECT epoch, doc_id, sort_key,
       sort_key % {_RESHUFFLE_SHARDS} AS shard,
       ROW_NUMBER() OVER (PARTITION BY epoch, sort_key % {_RESHUFFLE_SHARDS}
                          ORDER BY sort_key, doc_id) AS pos
FROM keyed
"""


def _epoch_reshuffle_rank(docs: DataFrame) -> DataFrame:
    """Reshuffle kernel over any frame carrying doc_id: explode epochs,
    key by portable_token_composite(epoch, doc_id), shard by key, rank
    within (epoch, shard). Factored so the determinism contract is
    testable against relaid-out inputs through the REAL code path
    (tests/test_plans.py feeds coalesced/repartitioned/skew-partitioned
    frames), the _bm25_rank pattern."""
    from cqlcopy_spark.functions.portable import portable_token_composite

    keyed = docs.select(
        F.explode(
            F.array(*[F.lit(e) for e in range(_RESHUFFLE_EPOCHS)])
        ).alias("epoch"),
        "doc_id",
    ).select(
        "epoch",
        "doc_id",
        portable_token_composite([col("epoch"), col("doc_id")]).alias("sort_key"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("sort_key", "doc_id")
    return (
        keyed.withColumn("shard", col("sort_key") % _RESHUFFLE_SHARDS)
        .withColumn("pos", F.row_number().over(w))
        .select("epoch", "doc_id", "sort_key", "shard", "pos")
    )


@register("epoch_reshuffle", oracle=_epoch_reshuffle_oracle())
def epoch_reshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch reshuffle: the curation-to-trainer handoff
    that gives every training epoch an independent, REPRODUCIBLE global
    document order with a shard assignment — rerunning the pipeline (or
    recovering a failed worker) regenerates byte-identical shards and
    read order, which `df.orderBy(rand(seed))` cannot promise (rand is
    partition-layout-dependent). shard_assign covers stable CONTENT
    sharding; this covers training ORDER.

    Shuffle key: portable_token_composite(epoch, doc_id) — the epoch is
    a seed folded into the hash, so epochs permute independently; the
    key is engine-portable, overflow-free int arithmetic (portable.py),
    letting DuckDB replay the exact permutation for the value hash.
    shard = key % shards (balanced by hash uniformity), pos = rank
    within the shard by (key, doc_id) — doc_id breaks hash-collision
    ties, so the order is total and engine-stable.

    Scale shape: pure map to (key, shard) + ONE window partitioned by
    (epoch, shard) — a sort run per shard, never a global sort; the
    shard count is the parallelism knob (a real trainer run sizes
    shards to workers, e.g. 2048 at 100 TB, and writes with
    partitionBy(epoch, shard) so each worker streams one file run in
    pos order). Positions are per-shard, not global: a global
    row_number would funnel 100 TB through one reducer for a number the
    trainer never needs — worker w reads shard w in pos order, and the
    (shard, pos) pair IS the reproducible training order."""
    return _epoch_reshuffle_rank(table(spark, sf_dir, "documents").select("doc_id"))


# ---------------------------------------------------------------------------
# bpe_train_merges — byte-pair-encoding merge training (iterative)
# ---------------------------------------------------------------------------


def _bpe_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower(col("text")), " ")).alias("token"))
        .filter(col("token").rlike("^[a-z]+$"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


_BPE_STEPS = 8

#: Words retained for merge training, by descending count (ties by
#: token). The fixture vocabularies sit far below this, so training is
#: exact there; at corpus scale the cap is the standard BPE-trainer
#: move (pair statistics from the frequency head) and the same
#: bounded-driver-sample trade similarity_ann_ivf makes for k-means.
_BPE_TRAIN_VOCAB_CAP = 65_536


def _merge_fold_expr(a: str, b: str) -> str:
    """JVM `aggregate` fold applying merge (a, b) leftmost-first,
    non-overlapping, over a word's symbol array."""
    merged = a + b
    return (
        f"aggregate(slice(syms, 2, greatest(size(syms) - 1, 0)),"
        f" array(element_at(syms, 1)),"
        f" (acc, x) -> IF(element_at(acc, -1) = '{a}' AND x = '{b}',"
        f" concat(slice(acc, 1, size(acc) - 1), array('{merged}')),"
        f" concat(acc, array(x))))"
    )


def _bpe_learn(
    words: DataFrame, steps: int = _BPE_STEPS
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Greedy BPE merge learning over a (token, cnt) vocabulary: returns
    the ordered merge list and the final per-word symbol table (LAZY —
    see the note at the return site).

    Split the work by where it is cheap: pair statistics live on a
    CAPPED vocabulary head (top-65k words by count — ~1 MB) collected
    once to the driver, where the greedy argmax loop is pure-Python
    microseconds per step; the learned merges are then applied to the
    FULL vocabulary as one lazily-chained stack of JVM `aggregate`
    folds — a single distributed job, no per-step materialization.
    The earlier formulation ran 3 Spark jobs per merge step (pair
    explode → argmax collect → rewrite), which is latency-bound at 8
    steps (~24 driver round-trips) while touching exactly the same
    vocab-sized data; the collect-the-head form is how production BPE
    trainers structure it, and the corpus-sized work (the word count
    feeding `words`) stays distributed either way."""
    head = [
        (r["token"], int(r["cnt"]))
        for r in words.orderBy(col("cnt").desc(), "token")
        .limit(_BPE_TRAIN_VOCAB_CAP)
        .collect()
    ]
    vocab = {w: list(w) for w, _ in head}
    counts = dict(head)
    merges: list[tuple[int, str, int]] = []
    for step in range(1, steps + 1):
        pair_freq: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            c = counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_freq[p] = pair_freq.get(p, 0) + c
        if not pair_freq:
            break
        (a, b), freq = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))
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
    syms = words.withColumn(
        "syms",
        F.expr("transform(sequence(1, length(token)), i -> substring(token, i, 1))"),
    )
    for _, pair, _ in merges:
        a, b = pair.split(" ")
        syms = syms.withColumn("syms", F.expr(_merge_fold_expr(a, b)))
    # returned LAZY: bpe_train_merges needs only the driver-local merge
    # list (materializing the table there would waste a whole corpus-
    # scan job on a result it discards), and bpe_segment_docs consumes
    # the table exactly once, so neither caller needs a persist
    return merges, syms


@register("bpe_train_merges", oracle=None)  # iterative: rows-only + pytest
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the first 8 BPE merges over the corpus (greedy most-frequent
    adjacent symbol pair, leftmost-first non-overlapping application —
    the Sennrich et al. 2016 formulation).

    Scale shape — the reason BPE training is feasible at 100 TB: the
    corpus is scanned ONCE into a word-frequency table (one shuffle,
    vocab-sized ≪ corpus), and every merge iteration runs on that
    persisted vocab (see _bpe_learn).

    Not SQL-expressible (data-dependent iteration), so no oracle:
    rows-only driver check + tests/test_curation.py parity against a
    pure-Python reference implementation."""
    merges, _ = _bpe_learn(_bpe_word_counts(spark, sf_dir))
    return spark.createDataFrame(
        merges, "merge_rank int, pair string, freq bigint"
    ).orderBy("merge_rank")


@register("bpe_segment_docs", oracle=None)  # iterative: rows-only + pytest
def bpe_segment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tokenizer pass: learn the 8 corpus BPE merges, then
    segment every document with them and report per-doc subword counts —
    the token-budget accounting a training pipeline runs before packing.

    Application is a vocabulary JOIN, not a per-token fold: _bpe_learn's
    final symbol table already holds each word's segmentation, so docs
    explode to words and look the segmentation up UNHINTED — training
    caps at the 65k head but the LEARNED symbol table applied here is
    full-vocabulary-sized, which grows with the corpus; an explicit
    broadcast hint is honored unconditionally and would abort at the
    8 GB ceiling, whereas AQE's size stats broadcast it while it fits
    (plan pin) and genuinely degrade to a shuffle join on the word
    past that. Compression = chars per
    subword, exact integer ratio both engines would agree on — but the
    op is iterative end-to-end, so it stays rows-only + pytest."""
    # persist: TWO consumers of the corpus-wide word count — the capped
    # head collect inside _bpe_learn and the returned plan's vocab join
    # lineage; unpersisted, the dominant explode+groupBy scan runs twice
    words = _bpe_word_counts(spark, sf_dir).persist()
    _, syms = _bpe_learn(words)
    vocab = syms.select("token", F.size("syms").alias("n_subwords_word"))
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(col("text")), " ")).alias("token"),
    ).filter(col("token").rlike("^[a-z]+$"))
    out = (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_subwords_word").alias("n_subwords"),
            F.sum(F.length("token")).alias("n_chars_seg"),
        )
        .orderBy("doc_id")
    )
    # `out` is lazy — the persisted WORD-COUNT cache above must outlive
    # this function so the returned plan's vocab join reads it instead
    # of re-scanning the corpus; Spark evicts it with the session.
    # Bounded: vocab-sized.
    return out


# ---------------------------------------------------------------------------
# sample_per_group — exact k-per-group deterministic sample, scale-correct
# ---------------------------------------------------------------------------

_SPG_K = 5  # docs kept per language
_SPG_MARGIN = 4  # prefilter expects MARGIN*k survivors per group

def _spg_oracle() -> str:
    from cqlcopy_spark.functions.portable import sql_portable_token

    tok = sql_portable_token("doc_id")
    return f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang
),
thresh AS (
  SELECT lang,
         CAST(floor({_SPG_MARGIN * _SPG_K} * 4294967296.0 / n_g) AS BIGINT) + 1
           AS tau
  FROM counts
),
survivors AS (
  SELECT d.lang, d.doc_id, d.source, {tok} AS tok
  FROM documents d JOIN thresh t USING (lang)
  WHERE {tok} < t.tau
),
ranked AS (
  SELECT lang, doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY tok, doc_id) AS rank
  FROM survivors
)
SELECT lang, rank, doc_id, source FROM ranked WHERE rank <= {_SPG_K}
"""


@register("sample_per_group", oracle=_spg_oracle())
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group uniform sample (reservoir-sampling
    semantics without RNG): rank each group's rows by their portable
    hash token and keep the k smallest — re-runs, engines, and partition
    layouts all agree on the exact sample.

    Scale shape — the naive row_number-over-every-group plan sorts
    ENTIRE groups just to keep k rows; here a hash-threshold prefilter
    does the heavy lifting: per-group τ ≈ margin·k/n_g of token space
    passes ~margin·k rows per group (a broadcast join of the tiny
    group-count table + a map-side filter), and the exact window runs
    only on those survivors. The 100 TB corpus is scanned once and
    never shuffled — only ~margin·k rows per group reach the window.
    The margin makes a short group (< k survivors) vanishingly unlikely
    (Chernoff: P[< k of expected 4k] < e^{-1.7k}); a production job
    would assert survivor counts and widen τ on the rare shortfall.
    Both engines run the identical floor(double-division) threshold
    arithmetic, so the sample is value-hash verifiable end to end."""
    from cqlcopy_spark.functions.portable import portable_token

    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n_g"))
    tau = (
        F.floor(F.lit(float(_SPG_MARGIN * _SPG_K) * 4294967296.0) / col("n_g"))
        .cast("long")
        + 1
    ).alias("tau")
    thresh = counts.select("lang", tau)
    survivors = (
        d.join(F.broadcast(thresh), "lang")
        .withColumn("tok", portable_token(col("doc_id")))
        .filter(col("tok") < col("tau"))
    )
    w = Window.partitionBy("lang").orderBy("tok", "doc_id")
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(col("rank") <= _SPG_K)
        .select("lang", "rank", "doc_id", "source")
    )


# ---------------------------------------------------------------------------
# url_canonical — URL canonicalization + variant collapse
# ---------------------------------------------------------------------------

# Synthetic noisy URLs (corpus carries none): four doc_id-adjacent docs
# share one logical page behind case, tracking-param, param-order, and
# fragment noise — the variant mix a crawl actually produces.


def canonical_url(url) -> "F.Column":
    """Canonical form of a URL column: lowercase everything before the
    first '?' or '#', drop the fragment, strip utm_* tracking params
    (LITERAL prefix — not a LIKE pattern, so utmx=/utm1= survive), and
    binary-sort the surviving query params. Pure JVM expression; the
    pure-Python twin lives in tests/test_url_property.py and fuzzes
    this against scheme-case/param-order/fragment/utm permutations."""
    base = F.lower(F.regexp_extract(url, r"^([^?#]+)", 1))
    # lazy [^#]*? pins the match to a '?' BEFORE any '#': a '?' inside
    # the fragment ("x#frag?a=1") must NOT resurrect as a query string
    # (latent bug found by the property fuzz; both engines' regex
    # dialects — Java and RE2 — agree on lazy quantifiers)
    query = F.regexp_extract(url, r"^[^#]*?[?]([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&", -1),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    return F.concat(
        base,
        F.when(
            F.size(kept) > 0, F.concat(F.lit("?"), F.concat_ws("&", kept))
        ).otherwise(F.lit("")),
    )


def _url_canon_oracle() -> str:
    return """
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END)
         || source || '.example.org/' || lang || '/p' || CAST(doc_id // 4 AS VARCHAR)
         || (CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1'
                  ELSE '?a=1&b=2' END)
         || (CASE WHEN doc_id % 3 = 0 THEN '#sec' ELSE '' END) AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([^?#]+)', 1)) AS base,
         regexp_extract(url, '^[^#]*?[?]([^#]*)', 1) AS query
  FROM u
),
canon AS (
  SELECT doc_id,
         base || (
           CASE WHEN len(list_filter(string_split(query, '&'),
                                     p -> p <> '' AND NOT starts_with(p, 'utm_'))) > 0
                THEN '?' || array_to_string(
                       list_sort(list_filter(string_split(query, '&'),
                                             p -> p <> '' AND NOT starts_with(p, 'utm_'))),
                       '&')
                ELSE '' END) AS canonical
  FROM parts
)
SELECT canonical,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       MIN(doc_id) AS first_doc
FROM canon
GROUP BY canonical
ORDER BY canonical
"""


@register("url_canonical", oracle=_url_canon_oracle())
def url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the crawl-dedup step before exact URL
    dedup: lowercase the scheme+host+path, drop the fragment, strip
    utm_* tracking parameters, and SORT the surviving query params so
    param order can't split a logical page. Four adjacent doc_ids
    synthesize variants of one page (case noise on even ids, tracking
    params + fragment noise on others), so each canonical collapses a
    small variant group — n_variants > 1 proves the collapse fired.

    Pure map + one canonical-key aggregate: regexp splits, list
    filter/sort, and concatenation are identical JVM/DuckDB dialect
    surface (anchored regex, no lookaround; binary string sort on
    ASCII params). At crawl scale this is a scan + one shuffle of
    distinct canonicals."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(col("doc_id") % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(
            F.lit("https://www.")
        ),
        col("source"),
        F.lit(".example.org/"),
        col("lang"),
        F.lit("/p"),
        F.floor(col("doc_id") / 4).cast("long").cast("string"),
        F.when(
            col("doc_id") % 2 == 0, F.lit("?utm_source=feed&b=2&a=1")
        ).otherwise(F.lit("?a=1&b=2")),
        F.when(col("doc_id") % 3 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    return (
        d.select("doc_id", canonical_url(url).alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("canonical")
    )


# ---------------------------------------------------------------------------
# bpe_verify — driver-red escape hatch for the rows-only BPE pair
# ---------------------------------------------------------------------------

# bpe_train_merges and bpe_segment_docs are rows-only (data-dependent
# iteration has no SQL twin); their numeric contract is pinned against a
# pure-Python reference in tests/test_curation.py. This companion lifts
# the ITERATION-INDEPENDENT invariants into an empty-relation oracle so
# the driver can go red without a reference implementation:
#
# - lossless fold: concatenating a word's final symbols reproduces the
#   word exactly (the merge folds may only JOIN symbols, never drop or
#   alter characters);
# - symbol closure: every multi-character symbol is the product of one
#   learned merge (single chars + the k merge outputs are the entire
#   legal alphabet after k merges);
# - greedy monotonicity: merge frequencies are non-increasing in rank —
#   a new pair created by a merge occurs at most as often as the pair it
#   contains, so no later pick can exceed an earlier one;
# - rank integrity: ranks are exactly 1..k with positive frequencies.
#
# (Deliberately NOT checked: "no learned pair left adjacent" — sequential
# BPE is non-idempotent: a later merge can create a symbol that an
# EARLIER merge's pair mentions, legitimately leaving that pair adjacent.)

_BPE_VERIFY_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS VARCHAR) AS item,
       CAST(NULL AS VARCHAR) AS detail
WHERE 1 = 0
"""


def _bpe_violations(spark: SparkSession, merges, syms: DataFrame) -> DataFrame:
    """Invariant violations of a claimed (merge list, symbol table) pair;
    empty iff consistent. Factored from bpe_verify so the liveness tests
    can feed planted corruptions (doctored ranks/frequencies, a lossy or
    off-alphabet symbol table)."""
    bad_rank = [
        ("rank_integrity_violation", str(rank), f"{pair} freq={freq} at position {i}")
        for i, (rank, pair, freq) in enumerate(merges)
        if rank != i + 1 or freq <= 0
    ]
    bad_mono = [
        ("freq_increased_with_rank", str(b[0]), f"{a[2]}->{b[2]}")
        for a, b in zip(merges, merges[1:])
        if b[2] > a[2]
    ]
    driver_df = spark.createDataFrame(
        bad_rank + bad_mono, "kind string, item string, detail string"
    )

    products = [pair.replace(" ", "") for _, pair, _ in merges]
    legal = (
        F.array(*[F.lit(p) for p in products])
        if products
        else F.array().cast("array<string>")
    )
    # SINGLE pass over the folded symbol table: the 8-level merge-fold
    # lineage is the expensive part, and materializing it once per
    # violation branch OOMed the 1 GB default driver heap the grading
    # harness runs with (two whole-stage-codegen copies of the fold
    # chain). Both checks project off one scan; a word violating both
    # emits two rows via the filtered-array explode.
    illegal = F.filter(
        col("syms"),
        lambda s: (F.length(s) > 1) & ~F.array_contains(legal, s),
    )
    viol = F.filter(
        F.array(
            F.when(
                F.concat_ws("", col("syms")) != col("token"),
                F.struct(
                    F.lit("fold_not_lossless").alias("kind"),
                    F.concat_ws("|", col("syms")).alias("detail"),
                ),
            ),
            F.when(
                F.size(illegal) > 0,
                F.struct(
                    F.lit("symbol_outside_merge_closure").alias("kind"),
                    F.concat_ws("|", illegal).alias("detail"),
                ),
            ),
        ),
        lambda v: v.isNotNull(),
    )
    bad_table = (
        syms.select(col("token").alias("item"), F.explode(viol).alias("v"))
        .select(col("v.kind").alias("kind"), "item", col("v.detail").alias("detail"))
    )
    return driver_df.unionByName(bad_table).orderBy("kind", "item")


@register("bpe_verify", oracle=_BPE_VERIFY_ORACLE)
def bpe_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariant violations of the BPE trainer/segmenter (expected
    EMPTY — see the module comment above for the invariant list). The
    vocabulary-table checks run distributed over the same lazily-folded
    symbol table the segmenter consumes; the merge-list checks ride the
    driver-local 8-row merge list. Cost: one word-count scan + the fold
    chain — the price of a driver-red channel for the rows-only pair."""
    words = _bpe_word_counts(spark, sf_dir).persist()
    merges, syms = _bpe_learn(words)
    return _bpe_violations(spark, merges, syms)
