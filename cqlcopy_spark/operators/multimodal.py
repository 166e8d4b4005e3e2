"""Multimodal-column operators (SURVEY.md §2C op 33 + mandated multimodal
extension: opaque binary payloads with typed metadata, decode / feature-
extract as Arrow-batched UDF stages).

The container has no image/audio libraries, so the DECODE step is stubbed
exactly as the north star prescribes: a deterministic fake keyed on the
payload bytes (real Spark plumbing — schema, batching, partitioning — with
a clearly-marked stand-in kernel), plus an import-gated real path that
raises NotImplementedError until PIL/librosa exist.

`multimodal_props` handles the semi-structured case the fixtures actually
ship: a JSON props column on the events stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.plans.registry import register

# ---------------------------------------------------------------------------
# op 33: multimodal_props — JSON property extraction on the event stream
# ---------------------------------------------------------------------------

_PROPS_ORACLE = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


@register("multimodal_props", oracle=_PROPS_ORACLE)
def multimodal_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema (not schema inference — at 100 TB
    you declare the contract). Pure map; JSON parse stays on the JVM."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(col("props"), T.StructType([T.StructField("k", T.LongType())]))
    return e.select("event_id", "event_type", parsed["k"].alias("k"))


# ---------------------------------------------------------------------------
# multimodal_variant — schema-on-read semi-structured props (VariantType)
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("multimodal_variant", oracle=_VARIANT_ORACLE)
def multimodal_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complement of multimodal_props: Spark 4 VariantType for props
    whose schema you do NOT declare. parse_json keeps the whole document
    as a binary-encoded variant (open schema — new keys need no DDL);
    variant_get extracts typed paths at use-sites, and try_variant_get
    probes paths that may not exist without failing the row. At 100 TB
    variant beats raw JSON strings because the binary encoding skips
    re-tokenizing on every access; here each row is parsed once and two
    paths are extracted. Integer aggregates only — no float hazard. The
    DuckDB oracle reads the same paths with its JSON functions."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json(col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "string")
    return (
        e.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(F.when(col("m").isNull(), 1).otherwise(0)).alias("n_missing"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# multimodal_meta — binary payload + typed metadata
# ---------------------------------------------------------------------------

_META_ORACLE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       'application/octet-stream' AS mime
FROM documents
"""


@register("multimodal_meta", oracle=_META_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model a multimodal table: payload as an opaque BINARY column with
    typed metadata (byte length, content hash, mime). The fixture corpus
    has no real media, so payloads are the UTF-8 document bytes — the
    COLUMN SHAPE is the point: downstream stages treat it as bytes."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.lit("application/octet-stream").alias("mime"),
    )


# ---------------------------------------------------------------------------
# decode / feature-extract pipeline (stubbed kernel, real plumbing)
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def _decode_real(payload: bytes) -> tuple[int, int, int, float]:
    """Real decode path — stdlib/numpy container parsing, no imaging
    library required for the formats whose structure is simple enough
    to read directly:

    - PNG:  IHDR width/height (big-endian u32 at offsets 16/20)
    - GIF:  logical-screen width/height (little-endian u16 at 6/8)
    - BMP:  BITMAPINFOHEADER dims; for UNCOMPRESSED 24-bit payloads the
            pixel array is decoded for the true mean luma
            (0.299R + 0.587G + 0.114B over all pixels, numpy)
    - WAV:  (sample_rate, channels, n_sample_frames) mapped onto the
            (width, height, n_frames) feature slots; luma 0.0

    Compressed codecs (JPEG, video) still need a real imaging/av
    library — those raise, and callers fall back to _decode_fake (the
    deterministic stand-in that keeps the full pipeline testable in
    this container). mean_luma is 0.0 where only the header is
    parseable: honest metadata, no fabricated pixel stats."""
    import struct

    import numpy as np

    # Length guards on every branch: a TRUNCATED container that passes
    # its signature check must fall through to NotImplementedError (the
    # documented fallback contract), not die in struct.unpack —
    # callers catch NotImplementedError to route to the stand-in kernel.
    if (
        payload[:8] == b"\x89PNG\r\n\x1a\n"
        and payload[12:16] == b"IHDR"
        and len(payload) >= 24
    ):
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h), 1, 0.0
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h), 1, 0.0
    if payload[:2] == b"BM" and len(payload) >= 54:
        off, = struct.unpack("<I", payload[10:14])
        w, h = struct.unpack("<ii", payload[18:26])
        bpp, = struct.unpack("<H", payload[28:30])
        comp, = struct.unpack("<I", payload[30:34])
        h_abs = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        if bpp == 24 and comp == 0 and len(payload) >= off + h_abs * stride:
            px = np.frombuffer(
                payload, dtype=np.uint8, count=h_abs * stride, offset=off
            ).reshape(h_abs, stride)[:, : w * 3].reshape(h_abs, w, 3)
            # BMP stores BGR
            luma = float(
                (
                    0.114 * px[:, :, 0].astype(np.float64)
                    + 0.587 * px[:, :, 1]
                    + 0.299 * px[:, :, 2]
                ).mean()
                / 255.0
            )
            return int(w), h_abs, 1, luma
        # header-only (other bpp/compression, or truncated pixel array):
        # dims are still honestly parseable, pixel stats are not
        return int(w), h_abs, 1, 0.0
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" and len(payload) >= 20:
        # Walk the RIFF chunk list instead of assuming the canonical
        # 44-byte header (r04 ADVICE): a valid file may carry LIST/fact
        # chunks before 'fmt ' or 'data', and fixed offsets 22/24/32/40
        # would silently read garbage there. Unlocatable or truncated
        # fmt/data chunks fall through to NotImplementedError — the
        # documented stand-in contract.
        pos = 12
        fmt = None
        data_size = None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size, = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + size]
            if cid == b"fmt " and len(body) >= 16:
                channels, = struct.unpack("<H", body[2:4])
                rate, = struct.unpack("<I", body[4:8])
                block_align, = struct.unpack("<H", body[12:14])
                fmt = (channels, rate, block_align)
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunk bodies are word-aligned
        if fmt is not None and data_size is not None:
            channels, rate, block_align = fmt
            frames = data_size // max(block_align, 1)
            return int(rate), int(channels), int(frames), 0.0
    raise NotImplementedError(
        "compressed codec or truncated container — needs an imaging/av "
        "library (PIL/pyav) or the stand-in kernel"
    )


def _decode_fake(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in kernel: features derived arithmetically from
    the bytes, so the full pipeline is testable end-to-end (and even
    oracle-checkable, since the arithmetic is reproducible in SQL)."""
    n = len(payload)
    width = 1 + n % 1024
    height = 1 + (n * 7) % 768
    n_frames = 1 + n % 30
    mean_luma = (sum(payload[:16]) % 256) / 255.0 if n else 0.0
    return width, height, n_frames, mean_luma


def decode_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
                    use_real: bool = False) -> DataFrame:
    """mapInPandas decode stage: binary column → typed feature rows.

    Arrow moves the bytes executor-side in columnar batches; the kernel
    is a pure per-payload function, so this is embarrassingly parallel
    map work — the partitioning of `df` is preserved, no shuffle. The
    id column keeps the CALLER'S name in the output (the schema is
    derived from id_col — a hardcoded 'doc_id' would silently rename a
    non-default caller's ids)."""
    kernel = _decode_real if use_real else _decode_fake
    schema = T.StructType(
        [T.StructField(id_col, T.LongType())] + FEATURE_SCHEMA.fields[1:]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats, columns=["width", "height", "n_frames", "mean_luma"])
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# resize / frame-sample stages (stub kernels, real plumbing)
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Resize stage: binary in → binary out with the new dimensions.

    STUB kernel (no imaging lib in this container): output bytes are a
    deterministic slice/tile of the input sized w·h/64 — shape-correct
    plumbing (binary → binary, metadata columns updated, Arrow batches,
    partitioning preserved); swap the kernel body for PIL when present."""
    target = max(1, width * height // 64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows = []
        for pdf in batches:
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                tiled = (raw * (target // max(len(raw), 1) + 1))[:target]
                out_rows.append((doc_id, tiled, width, height))
            yield pd.DataFrame(
                out_rows, columns=["doc_id", "payload", "width", "height"]
            )
            out_rows = []

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 10,
                  id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Frame-sampling stage: one row in → one row per sampled frame
    (row-explosion inside mapInPandas, the video-decode shape).

    STUB kernel: frame count from the fake decoder, each frame a
    deterministic byte slice. Real path would seek keyframes via
    pyav/ffmpeg; the Spark contract (1→N rows, binary frames, stable
    ordering by (doc_id, frame_idx)) is what downstream stages bind to."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                _, _, n_frames, _ = _decode_fake(raw)
                for idx in range(0, n_frames, every_n):
                    lo = (idx * 7) % max(len(raw), 1)
                    rows.append((doc_id, idx, raw[lo : lo + 16]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


# Mirrors the stub kernels exactly: n_frames = 1 + len % 30 (decode),
# sampled idx ∈ range(0, n_frames, 4), frame = raw[lo : lo+16] with
# lo = (idx·7) mod max(len, 1) ⇒ octet_length = min(16, len − lo).
# greatest(len, 1) / COALESCE below mirror the kernels' n=0 guards —
# without them an empty payload gives NULL-poisoned SQL (x % 0 → NULL)
# where the kernels give 0.
_FRAMES_ORACLE = """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS len FROM documents),
f AS (
  SELECT doc_id, len, unnest(range(0, 1 + len % 30, 4)) AS idx FROM b
)
SELECT doc_id,
       COUNT(*) AS n_sampled,
       CAST(SUM(LEAST(16, len - (idx * 7) % greatest(len, 1))) AS BIGINT) AS frame_bytes
FROM f GROUP BY doc_id ORDER BY doc_id
"""


@register("multimodal_frames", oracle=_FRAMES_ORACLE)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline: payload build → frame sample (1→N row
    explosion) → per-doc frame stats. Arrow-batched map stages composed
    with no shuffle until the final (tiny) aggregate — the plumbing a
    real media pipeline runs, with kernels stubbed per the environment
    contract. The resize stage is exercised separately in
    tests/test_multimodal_stages.py (its fixed output dims would make
    this aggregate constant)."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(col("text"), "UTF-8").alias("payload"))
    frames = sample_frames(payloads, every_n=4)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum(F.octet_length(col("frame"))).alias("frame_bytes"),
        )
        .orderBy("doc_id")
    )


_FEATURES_ORACLE = """
WITH b AS (SELECT doc_id, text, encode(text) AS payload FROM documents)
SELECT doc_id,
       CAST(1 + octet_length(payload) % 1024 AS INT) AS width,
       CAST(1 + (octet_length(payload) * 7) % 768 AS INT) AS height,
       CAST(1 + octet_length(payload) % 30 AS INT) AS n_frames,
       CAST(COALESCE(list_sum(list_transform(range(1, LEAST(octet_length(payload), 16) + 1),
                     i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) % 256 AS DOUBLE)
         / 255.0 AS mean_luma
FROM b
"""


@register("multimodal_features", oracle=_FEATURES_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on the fixture corpus: build binary
    payloads, run the Arrow-batched decode stage (fake kernel), return
    typed features. The oracle reproduces the kernel arithmetic in SQL —
    it validates the UDF PLUMBING (batching, schema, row alignment), the
    thing that breaks in real pipelines.

    NB: oracle uses ascii(substr(text,..)) ≡ payload bytes because the
    corpus is ASCII; the Spark side operates on true bytes."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(col("text"), "UTF-8").alias("payload"))
    return decode_features(payloads)


# ---------------------------------------------------------------------------
# multimodal_dedup — exact duplicate detection on opaque binary payloads
# ---------------------------------------------------------------------------

# Image/audio corpora carry byte-identical duplicates (re-uploads,
# mirrored crawls); the text-side dedup_exact has a binary analogue:
# group by content digest of the PAYLOAD BYTES. The fixture has no
# byte-identical documents, so the grouping key is a deliberately
# lossy 16-bit digest prefix — the PLAN (digest → one shuffle of
# digests → bounded groups) is identical to the full-digest production
# form, but the fixture actually exercises multi-member groups.

_BIN_DEDUP_ORACLE = """
WITH p AS (
  SELECT doc_id, substr(md5(text), 1, 4) AS bucket,
         octet_length(encode(text)) AS n_bytes
  FROM documents
)
SELECT bucket,
       COUNT(*) AS n_payloads,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS keeper_doc_id
FROM p
GROUP BY bucket
HAVING COUNT(*) > 1
ORDER BY bucket
"""


@register("multimodal_dedup", oracle=_BIN_DEDUP_ORACLE)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payload groups by content digest: each group keeps its
    smallest doc_id (deterministic keeper) and reports reclaimable
    bytes. One shuffle of (digest, doc_id, n_bytes) triples — payload
    BYTES never move, which is the entire point at 100 TB of media:
    the digest is computed in the scan stage (JVM md5, no Python) and
    only 40-byte rows reach the exchange. Near-dup (perceptual-hash)
    variants slot into the same plan with a different digest
    expression; the text-side analogues are dedup_exact (full hash)
    and dedup_simhash (banded near-dup)."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(col("text"), "UTF-8")
    p = d.select(
        "doc_id",
        F.substring(F.md5(payload), 1, 4).alias("bucket"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return (
        p.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(col("n_payloads") > 1)
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# multimodal_phash_dedup — perceptual-hash near-dup over decoded pixels
# ---------------------------------------------------------------------------

# The image analogue of dedup_fuzzy_minhash: content-digest dedup
# (multimodal_dedup) only catches BYTE-identical payloads, but an image
# corpus is full of re-encodes and slightly-retouched copies. The
# standard first rung is aHash: decode, grayscale, 8×8 block-average,
# threshold at the mean → a 64-bit signature that is INVARIANT to small
# pixel noise, so near-identical images collide exactly and dedup is a
# plain hash groupBy — no pair joins at all. Real pixel math on real
# containers (the uncompressed-BMP path of _decode_real); the hash
# kernel is Python-only (no SQL pixel decode) ⇒ rows-only driver check,
# with a planted-variant recall/precision + independent-reimplementation
# parity test in tests/test_multimodal_stages.py.

_PHASH_DOCS = 200  # staged images: doc_id < 200, 4 noise variants per base


def _ahash64(payload: bytes) -> "int | None":
    """64-bit average-hash of an uncompressed 24-bit BMP payload (None
    for undecodable payloads — callers keep them out of dedup rather
    than colliding them on a sentinel)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    off, = struct.unpack("<I", payload[10:14])
    w, h = struct.unpack("<ii", payload[18:26])
    bpp, = struct.unpack("<H", payload[28:30])
    comp, = struct.unpack("<I", payload[30:34])
    h_abs = abs(h)
    stride = (w * 3 + 3) & ~3
    if bpp != 24 or comp != 0 or len(payload) < off + h_abs * stride or w < 8 or h_abs < 8:
        return None
    px = np.frombuffer(
        payload, dtype=np.uint8, count=h_abs * stride, offset=off
    ).reshape(h_abs, stride)[:, : w * 3].reshape(h_abs, w, 3)
    gray = (
        0.114 * px[:, :, 0].astype(np.float64)
        + 0.587 * px[:, :, 1]
        + 0.299 * px[:, :, 2]
    )
    # 8×8 block means over near-equal integer bands (i*h//8 boundaries).
    # Divisible dims take the vectorized reshape pooling (same element
    # sets; the 64-Python-slice loop was the scene-cut hot path — 307k
    # slice means per bench rep); ragged dims keep the banded loop.
    if h_abs % 8 == 0 and w % 8 == 0:
        cells = gray.reshape(8, h_abs // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        cells = np.empty((8, 8))
        for i in range(8):
            r0, r1 = i * h_abs // 8, (i + 1) * h_abs // 8
            for j in range(8):
                c0, c1 = j * w // 8, (j + 1) * w // 8
                cells[i, j] = gray[r0:r1, c0:c1].mean()
    bits = (cells > cells.mean()).reshape(-1)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # two's-complement fold into int64 (Arrow rejects uint64 overflow)
    return out - (1 << 64) if out >= (1 << 63) else out


import functools


@functools.lru_cache(maxsize=8192)
def _synth_bmp(doc_id: int) -> bytes:
    """Deterministic 16×16 24-bit BMP: the BASE pattern depends only on
    doc_id // 4 — each 2×2 aHash cell is uniformly 0 or 255 (md5-mixed
    per (cell, base)), so every cell mean sits ≥127 gray levels from
    the global mean — and each of the 4 variants perturbs ONE pixel by
    ±1, far below any threshold: byte-distinct payloads that perceptual
    dedup must still collapse, exactly the re-encode/retouch case."""
    import hashlib
    import struct

    base = doc_id // 4
    variant = doc_id % 4
    w = h = 16
    cells = [
        [
            (hashlib.md5(f"{base}:{i}:{j}".encode()).digest()[0] & 1) * 255
            for j in range(8)
        ]
        for i in range(8)
    ]
    cells[0][0], cells[7][7] = 0, 255  # force a mix: mean strictly inside
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h):
        row = bytearray()
        for x in range(w):
            g = cells[y // 2][x // 2]
            if variant and (x, y) == (2 * variant, 1):
                g = g + 1 if g == 0 else g - 1
            row += bytes((g, g, g))
        row += b"\x00" * (stride - len(row))
        rows += row
    header = b"BM" + struct.pack(
        "<IHHI", 54 + len(rows), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return bytes(header + rows)


@register("multimodal_phash_dedup")  # rows-only: pixel decode is Python-only
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup groups over a staged image corpus: 4 noise
    variants per base image (byte-DISTINCT payloads — content-digest
    dedup finds nothing here) collapse to one aHash each, so the whole
    dedup is hash → groupBy, output one row per group with its size.

    Scale: synthesis+decode+hash is one Arrow-batched map (payload
    bytes never shuffle — only 8-byte hashes and ids move, the same
    bytes-stay-put rule as multimodal_dedup); the groupBy is one
    shuffle of hash keys. Hamming-tolerant variants (re-crops, heavier
    edits) band the 64 bits into 4×16-bit LSH keys and verify within
    buckets — the dedup_fuzzy_minhash shape over image signatures."""
    base = table(spark, sf_dir, "documents").select("doc_id").filter(
        col("doc_id") < _PHASH_DOCS
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            hashes = [_ahash64(_synth_bmp(int(i))) for i in ids]
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    hashed = base.mapInPandas(kernel, schema="doc_id long, phash long").filter(
        col("phash").isNotNull()
    )
    return (
        hashed.groupBy("phash")
        .agg(F.count(F.lit(1)).alias("n_images"), F.min("doc_id").alias("first_doc"))
        .filter(col("n_images") >= 2)
        .select(F.hex(col("phash")).alias("phash_hex"), "n_images", "first_doc")
        .orderBy("first_doc")
    )


# ---------------------------------------------------------------------------
# multimodal_audio_fingerprint — energy-envelope near-dup over decoded PCM
# ---------------------------------------------------------------------------

# The audio twin of multimodal_phash_dedup: re-encodes and light edits
# change bytes but not the ENERGY ENVELOPE, so the first-rung audio
# fingerprint splits the PCM stream into 64 windows and thresholds each
# window's mean |amplitude| at the global mean — a 64-bit signature
# invariant to small sample jitter. Real RIFF/PCM parsing (16-bit mono
# data chunk), Python-only ⇒ rows-only + planted-variant tests.


def _audio_fp64(payload: bytes) -> "int | None":
    """64-bit energy-envelope fingerprint of a 16-bit mono PCM WAV
    (None when the container/codec doesn't match)."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size, = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt, channels = struct.unpack("<HH", body[0:4])
            bits, = struct.unpack("<H", body[14:16])
            fmt = (audio_fmt, channels, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt != (1, 1, 16) or not data or len(data) < 2 * 64:
        return None
    x = np.abs(
        np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2").astype(
            np.float64
        )
    )
    n = len(x)
    wins = np.array(
        [x[i * n // 64 : (i + 1) * n // 64].mean() for i in range(64)]
    )
    bits64 = wins > wins.mean()
    out = 0
    for b in bits64:
        out = (out << 1) | int(b)
    return out - (1 << 64) if out >= (1 << 63) else out


def _synth_wav(doc_id: int) -> bytes:
    """Deterministic 16-bit mono WAV: the base (doc_id // 4) selects a
    64-window loud/quiet envelope (md5-mixed, amplitudes 0 or 8192 —
    window means sit half the loud amplitude from the global mean), and
    each of the 4 variants jitters ONE sample by ±1: byte-distinct
    streams the envelope fingerprint must still collapse."""
    import hashlib
    import struct

    base = doc_id // 4
    variant = doc_id % 4
    spw = 32  # samples per window
    amps = [
        (hashlib.md5(f"wav:{base}:{w}".encode()).digest()[0] & 1) * 8192
        for w in range(64)
    ]
    amps[0], amps[63] = 0, 8192  # force a mix
    samples = []
    for w in range(64):
        for i in range(spw):
            samples.append(amps[w] if i % 2 == 0 else -amps[w])
    if variant:
        idx = 2 * variant
        samples[idx] += 1 if samples[idx] <= 0 else -1
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


@register("multimodal_audio_fingerprint")  # rows-only: PCM decode is Python-only
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup groups over staged WAVs: 4 single-sample-jitter
    variants per base envelope (byte-distinct payloads) collapse to one
    energy fingerprint each; dedup is fingerprint → groupBy, the same
    bytes-never-shuffle shape as multimodal_phash_dedup (only 8-byte
    fingerprints and ids move). Tolerance beyond exact envelopes bands
    the 64 bits into LSH keys exactly like the image path."""
    base = table(spark, sf_dir, "documents").select("doc_id").filter(
        col("doc_id") < _PHASH_DOCS
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            fps = [_audio_fp64(_synth_wav(int(i))) for i in ids]
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    hashed = base.mapInPandas(kernel, schema="doc_id long, fp long").filter(
        col("fp").isNotNull()
    )
    return (
        hashed.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_clips"), F.min("doc_id").alias("first_doc"))
        .filter(col("n_clips") >= 2)
        .select(F.hex(col("fp")).alias("fp_hex"), "n_clips", "first_doc")
        .orderBy("first_doc")
    )


# ---------------------------------------------------------------------------
# multimodal_scene_cuts — frame-difference scene segmentation
# ---------------------------------------------------------------------------

# The video leg of the perceptual trio: a "video" payload is a fixed
# sequence of frames; a SCENE CUT is a frame whose perceptual hash is
# far (Hamming) from its predecessor's. Shot segmentation is the first
# pass of every video curation pipeline (sample per scene, dedup per
# scene, caption per scene). Frames here are the same uncompressed
# BMPs the real decoder parses, concatenated back to back; the kernel
# is aHash-per-frame + Hamming against the previous frame — pure pixel
# math, Python-only ⇒ rows-only + planted-cut tests.

_SCENE_FRAMES = 24  # frames per staged clip
_SCENE_HAMMING_T = 16  # bits of aHash drift that declare a new scene

# staging caches: synthesis is test plumbing, not the measured kernel —
# local-mode Python workers are reused across jobs, so min-of-N bench
# reps re-synthesizing 200 clips × 24 frames in pure-Python byte loops
# dominated the first measurement (4.0 s); the decode+hash kernel is
# what the operator actually scales on
import functools as _ft

_cached_synth = _ft.lru_cache(maxsize=512)


@_cached_synth
def _synth_clip(doc_id: int) -> bytes:
    """Deterministic clip: {_SCENE_FRAMES} concatenated 16×16 BMPs.
    Scene boundaries are planted at frame indices derived from doc_id
    (2-4 scenes per clip); frames WITHIN a scene are noise variants of
    the scene's base pattern (single-pixel ±1 — under the aHash
    threshold), frames ACROSS a cut use a different base pattern."""
    cuts = sorted({7 + (doc_id * 5) % 9, 15 + (doc_id * 3) % 7} - {0})
    scene_starts = [0] + [c for c in cuts if 0 < c < _SCENE_FRAMES]
    frames = []
    scene_idx = 0
    for f in range(_SCENE_FRAMES):
        if scene_idx + 1 < len(scene_starts) and f >= scene_starts[scene_idx + 1]:
            scene_idx += 1
        # base image id unique per (doc, scene); variant cycles per frame
        frames.append(_synth_bmp((doc_id * 16 + scene_idx) * 4 + f % 4))
    return b"".join(frames)


def _scene_cuts(payload: bytes) -> "list[int]":
    """Frame indices where a new scene starts (aHash Hamming > T from
    the previous frame). Frame size is read from the first BMP header."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 6:
        return []
    size, = struct.unpack("<I", payload[2:6])
    n = len(payload) // size
    cuts = []
    prev = None
    for f in range(n):
        h = _ahash64(payload[f * size : (f + 1) * size])
        if h is None:
            continue
        if prev is not None:
            ham = bin((h ^ prev) & ((1 << 64) - 1)).count("1")
            if ham > _SCENE_HAMMING_T:
                cuts.append(f)
        prev = h
    return cuts


@register("multimodal_scene_cuts")  # rows-only: pixel decode is Python-only
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene segmentation over staged clips: per clip, the frame count,
    detected scene count, and the cut positions (joined string — array
    columns aren't driver-hashable). The kernel is one Arrow-batched
    map over payload bytes: at scale, clip bytes never shuffle — only
    (doc_id, n_scenes, cuts) rows move, and downstream per-scene
    sampling (sample_frames) keys on these boundaries."""
    base = table(spark, sf_dir, "documents").select("doc_id").filter(
        col("doc_id") < _PHASH_DOCS
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].tolist()
            rows = []
            for i in ids:
                cuts = _scene_cuts(_synth_clip(int(i)))
                rows.append(
                    (int(i), _SCENE_FRAMES, len(cuts) + 1,
                     "-".join(str(c) for c in cuts))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "n_scenes", "cut_frames"]
            )

    return (
        base.mapInPandas(
            kernel, schema="doc_id long, n_frames int, n_scenes int, cut_frames string"
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# multimodal_verify — driver-red escape hatch for the perceptual trio
# ---------------------------------------------------------------------------

# The trio (phash_dedup / audio_fingerprint / scene_cuts) is rows-only:
# pixel/PCM decode is Python-only, so DuckDB can't re-run the kernels.
# But the STAGED corpus has a closed-form ground truth that never touches
# the kernels: _synth_bmp/_synth_wav group as doc_id DIV 4 (4 sub-
# threshold retouches per base pattern), and _synth_clip plants its cuts
# at {7 + (d*5) % 9, 15 + (d*3) % 7}. Deriving the expected output from
# THAT arithmetic and emitting only deviations turns any regression in
# the decoders, hashes, thresholds, or grouping plans into non-empty
# output — and the oracle is the empty relation, so the driver's
# row-count/hash compare goes red (the similarity_ann_verify pattern).

_MM_VERIFY_ORACLE = """
SELECT CAST(NULL AS VARCHAR) AS algo, CAST(NULL AS VARCHAR) AS kind,
       CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS VARCHAR) AS detail
WHERE 1 = 0
"""


def _planted_group_violations(
    got: DataFrame, docs: DataFrame, algo: str
) -> DataFrame:
    """Deviations of a perceptual-dedup group report `got(first_doc, n)`
    from the planted doc_id DIV 4 structure of the staged corpus.

    The expected side is pure id arithmetic over `docs(doc_id)` (which
    docs < _PHASH_DOCS exist, grouped by base, groups of >= 2) — fully
    independent of the hash kernels. A cross-base hash collision would
    surface as missing_group + size_mismatch, which is exactly right:
    the staged patterns are deterministic, so distinctness is a fixture
    property, not a probabilistic one (pinned in test_multimodal_stages).
    """
    exp = (
        docs.filter(col("doc_id") < _PHASH_DOCS)
        .groupBy(F.expr("doc_id DIV 4").alias("base"))
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("m"))
        .filter(col("m") >= 2)
        .select("first_doc", "m")
    )
    j = got.join(exp, "first_doc", "full_outer")
    return j.filter(
        col("n").isNull() | col("m").isNull() | (col("n") != col("m"))
    ).select(
        F.lit(algo).alias("algo"),
        F.when(col("n").isNull(), F.lit("missing_group"))
        .when(col("m").isNull(), F.lit("extra_group"))
        .otherwise(F.lit("size_mismatch"))
        .alias("kind"),
        col("first_doc").cast("long").alias("anchor"),
        F.concat_ws(
            "!=", col("n").cast("string"), col("m").cast("string")
        ).alias("detail"),
    )


def _planted_scene_violations(got: DataFrame, docs: DataFrame) -> DataFrame:
    """Deviations of a scene-cut report `got(doc_id, n_frames, n_scenes,
    cut_frames)` from the planted boundaries: cuts live at
    7 + (d*5) % 9 in [7,15] and 15 + (d*3) % 7 in [15,21] (equal only
    when both hit 15), always interior to the _SCENE_FRAMES window —
    the same arithmetic _synth_clip plants, re-derived here relationally
    so the detection kernel is never consulted. doc_id >= 0 keeps `%`
    engine-portable (CLAUDE.md pmod rule is for signed operands)."""
    exp = (
        docs.filter(col("doc_id") < _PHASH_DOCS)
        .select(
            "doc_id",
            (F.lit(7) + (col("doc_id") * 5) % 9).alias("c1"),
            (F.lit(15) + (col("doc_id") * 3) % 7).alias("c2"),
        )
        .select(
            "doc_id",
            F.when(col("c1") == col("c2"), col("c1").cast("string"))
            .otherwise(F.concat_ws("-", col("c1"), col("c2")))
            .alias("exp_cuts"),
            F.when(col("c1") == col("c2"), F.lit(2))
            .otherwise(F.lit(3))
            .alias("exp_scenes"),
        )
    )
    j = got.join(exp, "doc_id", "full_outer")
    bad = (
        col("exp_cuts").isNull()
        | col("cut_frames").isNull()
        | (col("n_frames") != F.lit(_SCENE_FRAMES))
        | (col("n_scenes") != col("exp_scenes"))
        | (col("cut_frames") != col("exp_cuts"))
    )
    return j.filter(bad).select(
        F.lit("scene").alias("algo"),
        F.when(col("cut_frames").isNull(), F.lit("missing_doc"))
        .when(col("exp_cuts").isNull(), F.lit("extra_doc"))
        .otherwise(F.lit("cut_mismatch"))
        .alias("kind"),
        col("doc_id").cast("long").alias("anchor"),
        F.concat_ws(
            "!=", col("cut_frames"), col("exp_cuts")
        ).alias("detail"),
    )


@register("multimodal_verify", oracle=_MM_VERIFY_ORACLE)
def multimodal_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable invariants for the perceptual trio: re-runs
    multimodal_phash_dedup, multimodal_audio_fingerprint, and
    multimodal_scene_cuts, then emits one row per deviation from the
    staged corpus's closed-form ground truth (see module comment above).
    Expected output: EMPTY; oracle: the empty relation — the driver
    turns any violation into a red verdict. Planted-corruption liveness
    is pinned in tests/test_multimodal_stages.py.

    Scale shape: the expected side is one groupBy / projection over doc
    ids; each violation join is keyed on an 8-byte id against the trio's
    already-small group/report outputs. Cost ≈ one extra run of the trio
    (~1s at bench SF) — the price of verification, run at bench SF, not
    production."""
    docs = table(spark, sf_dir, "documents").select("doc_id")
    img = _planted_group_violations(
        multimodal_phash_dedup(spark, sf_dir).select(
            "first_doc", col("n_images").cast("long").alias("n")
        ),
        docs,
        "phash",
    )
    aud = _planted_group_violations(
        multimodal_audio_fingerprint(spark, sf_dir).select(
            "first_doc", col("n_clips").cast("long").alias("n")
        ),
        docs,
        "audio",
    )
    vid = _planted_scene_violations(
        multimodal_scene_cuts(spark, sf_dir), docs
    )
    return (
        img.unionByName(aud).unionByName(vid).orderBy("algo", "kind", "anchor")
    )


# ---------------------------------------------------------------------------
# multimodal_pack — interleaved image+text context-window packing plan
# ---------------------------------------------------------------------------

# The multimodal twin of text.pack_sequences: a vision-language trainer
# packs INTERLEAVED sequences where an attached image costs a fixed
# number of vision tokens (the projector's patch count) adjacent to its
# document's text. An item is therefore the doc WITH its attachment —
# cost = text tokens + image tokens — and placement is the same greedy
# contiguous fill (shared _placed_from_toks kernel, so the two packers
# cannot drift on the placement rule).
_MM_IMG_TOKENS = 256  # vision tokens per attached image (fixed projector)
_MM_IMG_MOD = 3  # doc_id % 3 == 0 carries an image attachment


def _mm_pack_oracle() -> str:
    from cqlcopy_spark.operators.text import _PACK_BUDGET, _PACK_SHARDS

    return f"""
WITH toks AS (
  SELECT doc_id, doc_id % {_PACK_SHARDS} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS text_tokens,
         CAST(CASE WHEN doc_id % {_MM_IMG_MOD} = 0
              THEN {_MM_IMG_TOKENS} ELSE 0 END AS BIGINT) AS image_tokens
  FROM documents
),
placed AS (
  SELECT shard, doc_id, text_tokens, image_tokens,
         CAST(SUM(text_tokens + image_tokens)
                OVER (PARTITION BY shard ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING)
              - (text_tokens + image_tokens) AS BIGINT) AS start_offset
  FROM toks
)
SELECT shard,
       start_offset // {_PACK_BUDGET} AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN image_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_images,
       CAST(SUM(text_tokens) AS BIGINT) AS text_tokens,
       CAST(SUM(image_tokens) AS BIGINT) AS image_tokens,
       CAST(SUM(text_tokens + image_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM placed
GROUP BY shard, start_offset // {_PACK_BUDGET}
"""


@register("multimodal_pack", oracle=_mm_pack_oracle())
def multimodal_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved multimodal packing plan: docs (with their fixed-cost
    image attachments) fill {budget}-token training sequences greedily
    per shard, reporting the text/vision token split and image count
    per pack — the layout a VLM data loader consumes.

    Scale shape: identical to pack_sequences (the shared placement
    kernel): ONE shuffle to (shard) for the running-offset window, pack
    rollup reuses the partitioning (shard is a grouping-key prefix).
    All integer arithmetic — exact in both engines. In production the
    attachment flag/cost columns come from the media table's metadata
    (multimodal_meta) instead of the deterministic id rule."""
    from cqlcopy_spark.operators.text import (
        _PACK_BUDGET,
        _PACK_SHARDS,
        _placed_from_toks,
        _tokens,
    )

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (col("doc_id") % _PACK_SHARDS).alias("shard"),
        F.size(_tokens()).cast("long").alias("text_tokens"),
        F.when(col("doc_id") % _MM_IMG_MOD == 0, _MM_IMG_TOKENS)
        .otherwise(0)
        .cast("long")
        .alias("image_tokens"),
    ).withColumn("n_tokens", col("text_tokens") + col("image_tokens"))
    placed = _placed_from_toks(toks, _PACK_BUDGET)
    return placed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum((col("image_tokens") > 0).cast("int")).cast("long").alias("n_images"),
        F.sum("text_tokens").cast("long").alias("text_tokens"),
        F.sum("image_tokens").cast("long").alias("image_tokens"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
