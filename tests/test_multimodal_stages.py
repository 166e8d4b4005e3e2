"""Multimodal stage plumbing: schema shape, row multiplicity, and
kernel determinism — verified against a driver-side recomputation of the
same stub kernels (the Spark contract is what's under test; the kernels
are deterministic fakes per the environment constraint)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import col

from cqlcopy_spark.catalog import table
from cqlcopy_spark.operators.multimodal import (
    _decode_fake,
    decode_features,
    resize_images,
    sample_frames,
)
from tests.conftest import SF_SMALL


def _payloads(spark):
    return (
        table(spark, SF_SMALL, "documents")
        .select("doc_id", F.encode(col("text"), "UTF-8").alias("payload"))
    )


def test_resize_shapes_and_dims(spark):
    out = resize_images(_payloads(spark), 64, 48).collect()
    assert len(out) == table(spark, SF_SMALL, "documents").count()
    target = 64 * 48 // 64
    for r in out:
        assert r["width"] == 64 and r["height"] == 48
        assert len(r["payload"]) == target


def test_sample_frames_multiplicity_matches_kernel(spark):
    rows = _payloads(spark).collect()
    expected = {}
    for r in rows:
        raw = bytes(r["payload"])
        _, _, n_frames, _ = _decode_fake(raw)
        expected[r["doc_id"]] = len(range(0, n_frames, 10))
    got = (
        sample_frames(_payloads(spark), every_n=10)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert {r["doc_id"]: r["count"] for r in got} == expected


def test_decode_features_row_aligned(spark):
    feats = decode_features(_payloads(spark)).collect()
    by_id = {r["doc_id"]: r for r in feats}
    for r in _payloads(spark).collect()[:20]:
        w, h, n, luma = _decode_fake(bytes(r["payload"]))
        got = by_id[r["doc_id"]]
        assert (got["width"], got["height"], got["n_frames"]) == (w, h, n)
        assert abs(got["mean_luma"] - luma) < 1e-15


# ---------------------------------------------------------------------------
# real container decoding (stdlib/numpy parsing — no imaging lib)
# ---------------------------------------------------------------------------


def _png(w, h):
    import struct
    import zlib

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def _bmp24(pixels):
    """pixels: row-major list of rows of (r, g, b), bottom-up written."""
    import struct

    h = len(pixels)
    w = len(pixels[0])
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # BMP stores bottom-up
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (stride - len(line))
    off = 54
    return (
        b"BM"
        + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
        + body
    )


def _wav(rate=16000, channels=2, frames=100):
    import struct

    block = channels * 2  # 16-bit PCM
    data = b"\x00" * (frames * block)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_real_decode_parses_png_gif_bmp_wav():
    import pytest

    from cqlcopy_spark.operators.multimodal import _decode_real

    assert _decode_real(_png(640, 480)) == (640, 480, 1, 0.0)
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert _decode_real(gif) == (320, 200, 1, 0.0)
    # 2×2 BMP: white, black / black, white → mean luma exactly 0.5
    w, h, n, luma = _decode_real(
        _bmp24([[(255, 255, 255), (0, 0, 0)], [(0, 0, 0), (255, 255, 255)]])
    )
    assert (w, h, n) == (2, 2, 1)
    assert luma == pytest.approx(0.5)
    assert _decode_real(_wav(16000, 2, 100)) == (16000, 2, 100, 0.0)
    with pytest.raises(NotImplementedError):
        _decode_real(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_real_decode_wav_chunk_walk():
    """Non-canonical RIFF layouts (r04 ADVICE): a LIST chunk before
    'fmt '/'data' must still parse correctly (the old fixed 44-byte
    offsets read garbage there), and a WAVE signature with no locatable
    fmt/data must raise — the stand-in fallback contract."""
    import struct

    import pytest

    from cqlcopy_spark.operators.multimodal import _decode_real

    canonical = _wav(22050, 1, 7)
    chunks = canonical[12:]  # 'fmt ' + 'data' chunks
    list_chunk = b"LIST" + struct.pack("<I", 10) + b"INFOhello\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(list_chunk) + len(chunks)) + b"WAVE"
    payload += list_chunk + chunks
    assert _decode_real(payload) == (22050, 1, 7, 0.0)
    # signature-valid container with no fmt/data → fallback, not garbage
    no_data = b"RIFF" + struct.pack("<I", 4 + len(list_chunk)) + b"WAVE" + list_chunk
    with pytest.raises(NotImplementedError):
        _decode_real(no_data)


def test_decode_features_real_path_through_spark(spark):
    """use_real=True flows the stdlib container parsers through the same
    Arrow mapInPandas stage as the stub kernel."""
    import pytest

    from cqlcopy_spark.operators.multimodal import decode_features

    rows = [
        (1, _png(100, 50)),
        (2, _bmp24([[(255, 255, 255), (0, 0, 0)], [(0, 0, 0), (255, 255, 255)]])),
        (3, _wav(8000, 1, 42)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_features(df, use_real=True).collect()}
    assert (got[1]["width"], got[1]["height"]) == (100, 50)
    assert got[2]["mean_luma"] == pytest.approx(0.5)
    assert (got[3]["width"], got[3]["height"], got[3]["n_frames"]) == (8000, 1, 42)


def test_phash_dedup_collapses_planted_variants(spark):
    """multimodal_phash_dedup: 200 byte-DISTINCT staged images (50 base
    patterns × 4 single-pixel ±1 retouches) must collapse to exactly 50
    perceptual groups of 4 — byte-level digest dedup finds nothing here
    (all payloads differ), which is the whole reason aHash exists. Also
    pins the kernel against an independent pure-Python loop
    reimplementation (no numpy) on a few payloads."""
    from cqlcopy_spark.operators.multimodal import _ahash64, _synth_bmp
    from cqlcopy_spark.plans.registry import all_queries

    rows = all_queries()["multimodal_phash_dedup"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 50
    assert all(r["n_images"] == 4 for r in rows)
    assert sorted(r["first_doc"] for r in rows) == [4 * i for i in range(50)]

    # independent reimplementation: plain loops over the BMP bytes
    import struct

    def ref_ahash(payload):
        off, = struct.unpack("<I", payload[10:14])
        w, h = struct.unpack("<ii", payload[18:26])
        stride = (w * 3 + 3) & ~3
        gray = [
            [
                0.114 * payload[off + y * stride + 3 * x]
                + 0.587 * payload[off + y * stride + 3 * x + 1]
                + 0.299 * payload[off + y * stride + 3 * x + 2]
                for x in range(w)
            ]
            for y in range(h)
        ]
        cells = []
        for i in range(8):
            for j in range(8):
                vals = [
                    gray[y][x]
                    for y in range(i * h // 8, (i + 1) * h // 8)
                    for x in range(j * w // 8, (j + 1) * w // 8)
                ]
                cells.append(sum(vals) / len(vals))
        mean = sum(cells) / len(cells)
        out = 0
        for c in cells:
            out = (out << 1) | (1 if c > mean else 0)
        return out - (1 << 64) if out >= (1 << 63) else out

    for d in (0, 1, 7, 42, 199):
        assert _ahash64(_synth_bmp(d)) == ref_ahash(_synth_bmp(d)), d


def test_audio_fingerprint_collapses_planted_variants(spark):
    """multimodal_audio_fingerprint: 200 byte-distinct staged WAVs
    (50 envelopes × 4 single-sample jitters) → exactly 50 groups of 4;
    kernel pinned against an independent loop-only reimplementation,
    and the synthesized containers parse through the production RIFF
    walker too (chunk-walk, not fixed offsets)."""
    import struct

    from cqlcopy_spark.operators.multimodal import (
        _audio_fp64,
        _decode_real,
        _synth_wav,
    )
    from cqlcopy_spark.plans.registry import all_queries

    rows = all_queries()["multimodal_audio_fingerprint"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 50
    assert all(r["n_clips"] == 4 for r in rows)
    assert sorted(r["first_doc"] for r in rows) == [4 * i for i in range(50)]

    def ref_fp(payload):
        # independent: locate data chunk with plain scanning
        pos, data = 12, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size, = struct.unpack("<I", payload[pos + 4 : pos + 8])
            if cid == b"data":
                data = payload[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)
        xs = [
            abs(struct.unpack("<h", data[2 * i : 2 * i + 2])[0])
            for i in range(len(data) // 2)
        ]
        n = len(xs)
        wins = []
        for w in range(64):
            seg = xs[w * n // 64 : (w + 1) * n // 64]
            wins.append(sum(seg) / len(seg))
        mean = sum(wins) / len(wins)
        out = 0
        for v in wins:
            out = (out << 1) | (1 if v > mean else 0)
        return out - (1 << 64) if out >= (1 << 63) else out

    for d in (0, 3, 99, 198):
        assert _audio_fp64(_synth_wav(d)) == ref_fp(_synth_wav(d)), d
    # container parses through the production decoder as well
    assert _decode_real(_synth_wav(0)) == (16000, 1, 2048, 0.0)


def test_scene_cuts_find_exactly_the_planted_boundaries(spark):
    """multimodal_scene_cuts: every staged clip's detected cut frames
    must equal its planted scene boundaries exactly (within-scene
    single-pixel noise stays under the Hamming threshold; cross-scene
    pattern switches exceed it), for all 200 clips."""
    from cqlcopy_spark.operators.multimodal import _SCENE_FRAMES
    from cqlcopy_spark.plans.registry import all_queries

    rows = all_queries()["multimodal_scene_cuts"](
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert len(rows) == 200
    for r in rows:
        d = r["doc_id"]
        expected = sorted({7 + (d * 5) % 9, 15 + (d * 3) % 7})
        expected = [c for c in expected if 0 < c < _SCENE_FRAMES]
        got = [int(c) for c in r["cut_frames"].split("-")] if r["cut_frames"] else []
        assert got == expected, (d, got, expected)
        assert r["n_scenes"] == len(expected) + 1
        assert r["n_frames"] == _SCENE_FRAMES


def test_multimodal_verify_empty_on_fixture(spark):
    """multimodal_verify: zero violations on the staged corpus at both
    small SFs — the closed-form ground truth (doc_id DIV 4 groups,
    arithmetic cut positions) matches what the kernels detect."""
    from cqlcopy_spark.plans.registry import all_queries

    q = all_queries()["multimodal_verify"]
    assert q(spark, SF_SMALL).count() == 0
    assert q(spark, "/root/testdata/sf0.01").count() == 0


def test_multimodal_verify_liveness_group_corruptions(spark):
    """Planted corruption must surface: a doctored group report with a
    wrong size, a missing base, and an invented group yields exactly
    those three violation kinds."""
    from pyspark.sql.functions import col as _c

    from cqlcopy_spark.operators.multimodal import _planted_group_violations

    docs = spark.range(12).select(_c("id").alias("doc_id"))  # bases 0,4,8
    got = spark.createDataFrame(
        [(0, 4), (4, 3), (100, 2)], "first_doc long, n long"
    )  # base 0 OK; base 4 wrong size; base 8 missing; 100 invented
    rows = {
        (r["kind"], r["anchor"]): r["detail"]
        for r in _planted_group_violations(got, docs, "phash").collect()
    }
    assert rows == {
        ("size_mismatch", 4): "3!=4",
        ("missing_group", 8): "4",
        ("extra_group", 100): "2",
    }


def test_multimodal_verify_liveness_scene_corruptions(spark):
    """A shifted cut, a wrong scene count, a dropped doc, and an extra
    doc in a doctored scene report each yield a violation row."""
    from pyspark.sql.functions import col as _c

    from cqlcopy_spark.operators.multimodal import (
        _SCENE_FRAMES,
        _planted_scene_violations,
    )

    docs = spark.range(3).select(_c("id").alias("doc_id"))

    def truth(d):
        cuts = sorted({7 + (d * 5) % 9, 15 + (d * 3) % 7})
        return (
            d,
            _SCENE_FRAMES,
            len(cuts) + 1,
            "-".join(str(c) for c in cuts),
        )

    good = [truth(d) for d in range(3)]
    schema = "doc_id long, n_frames int, n_scenes int, cut_frames string"
    assert (
        _planted_scene_violations(spark.createDataFrame(good, schema), docs).count()
        == 0
    )
    d0, d1, _ = good
    doctored = [
        (d0[0], d0[1], d0[2], "1-2"),  # shifted cuts
        (d1[0], d1[1], d1[2] + 1, d1[3]),  # wrong scene count
        # doc 2 dropped entirely
        (99, _SCENE_FRAMES, 2, "7"),  # invented doc
    ]
    kinds = {
        (r["kind"], r["anchor"])
        for r in _planted_scene_violations(
            spark.createDataFrame(doctored, schema), docs
        ).collect()
    }
    assert kinds == {
        ("cut_mismatch", 0),
        ("cut_mismatch", 1),
        ("missing_doc", 2),
        ("extra_doc", 99),
    }
