"""Real BMP / WAV-PCM codecs (VERDICT r2 item #3): pure-numpy decode of
the two public fixed-layout media formats, golden-pinned through the full
Spark feature path — image_features / resize_images / audio_features now
produce REAL pixel/sample statistics for planted BMP/WAV fixtures (stubs
remain only for the genuinely lib-bound formats)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geocore_spark.operators import multimodal as mm


def _gradient_img(h=16, w=32):
    """Deterministic RGB gradient: R = column ramp, G = row ramp, B = 7."""
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
    img[..., 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
    img[..., 2] = 7
    return img


# --- decoder unit level -------------------------------------------------


def test_bmp_roundtrip_bit_exact():
    img = _gradient_img()
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)


def test_bmp_odd_width_stride_padding():
    img = _gradient_img(h=5, w=13)  # 13*3 = 39 bytes -> 40-byte stride
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)


def test_bmp_top_down_and_32bit():
    img = _gradient_img(h=4, w=6)
    blob = bytearray(mm.encode_bmp(img))
    # flip to top-down: negative height + pre-flipped rows
    blob[22:26] = (-4).to_bytes(4, "little", signed=True)
    body = np.frombuffer(bytes(blob[54:]), dtype=np.uint8).reshape(4, -1)
    blob[54:] = body[::-1].tobytes()
    assert np.array_equal(mm.decode_bmp(bytes(blob)), img)
    # 32-bit BGRA variant built by hand
    bgra = np.dstack([img[..., 2], img[..., 1], img[..., 0],
                      np.full(img.shape[:2], 255, np.uint8)])
    data = bgra.reshape(4, -1)[::-1].tobytes()
    hdr = (b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\0\0\0\0"
           + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
           + (6).to_bytes(4, "little", signed=True)
           + (4).to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
           + b"\0" * 16)
    assert np.array_equal(mm.decode_bmp(hdr + data), img)


def test_bmp_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"BM" + b"\0" * 10)
    img = _gradient_img(h=8, w=8)
    with pytest.raises(ValueError):
        mm.decode_bmp(mm.encode_bmp(img)[:-20])


def test_wav_roundtrip_16bit():
    sr = 8000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    got, got_sr = mm.decode_wav(mm.encode_wav(sig, sr))
    assert got_sr == sr
    assert np.abs(got - sig).max() < 1.0 / 32000  # 16-bit quantization


def test_wav_8bit_stereo_and_float32():
    # hand-built 8-bit stereo: L = +0.5, R = -0.5 -> mono mean 0.0
    n, sr = 100, 4000
    inter = np.empty(2 * n, dtype=np.uint8)
    inter[0::2] = 192  # (192-128)/128 = +0.5
    inter[1::2] = 64   # (64-128)/128  = -0.5
    fmt = ((1).to_bytes(2, "little") + (2).to_bytes(2, "little")
           + sr.to_bytes(4, "little") + (sr * 2).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (8).to_bytes(2, "little"))
    blob = (b"RIFF" + (4 + 8 + len(fmt) + 8 + 2 * n).to_bytes(4, "little")
            + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + (2 * n).to_bytes(4, "little") + inter.tobytes())
    sig, got_sr = mm.decode_wav(blob)
    assert got_sr == sr and len(sig) == n
    assert np.abs(sig).max() == 0.0  # channels average out exactly
    # float32 (format tag 3)
    f32 = np.linspace(-1, 1, 50, dtype="<f4")
    fmt3 = ((3).to_bytes(2, "little") + (1).to_bytes(2, "little")
            + sr.to_bytes(4, "little") + (sr * 4).to_bytes(4, "little")
            + (4).to_bytes(2, "little") + (32).to_bytes(2, "little"))
    blob3 = (b"RIFF" + (4 + 8 + len(fmt3) + 8 + 200).to_bytes(4, "little")
             + b"WAVE" + b"fmt " + len(fmt3).to_bytes(4, "little") + fmt3
             + b"data" + (200).to_bytes(4, "little") + f32.tobytes())
    sig3, _ = mm.decode_wav(blob3)
    assert np.array_equal(sig3, f32)


def test_wav_skips_extra_chunks():
    sig = np.zeros(10, dtype=np.float32)
    blob = mm.encode_wav(sig, 8000)
    # splice a LIST chunk between WAVE and fmt
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = blob[:12] + extra + blob[12:]
    spliced = (b"RIFF" + (len(spliced) - 8).to_bytes(4, "little")
               + spliced[8:])
    got, sr = mm.decode_wav(spliced)
    assert sr == 8000 and len(got) == 10


def test_wav_rejects_non_riff_and_compressed():
    with pytest.raises(ValueError):
        mm.decode_wav(b"OggS" + b"\0" * 40)
    fmt = ((85).to_bytes(2, "little") + (1).to_bytes(2, "little")  # MP3 tag
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (0).to_bytes(2, "little"))
    blob = (b"RIFF" + (4 + 8 + len(fmt) + 8).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + (0).to_bytes(4, "little"))
    with pytest.raises(NotImplementedError):
        mm.decode_wav(blob)


# --- PNG (pure numpy + stdlib zlib) --------------------------------------


def _naive_forward_filter(img, ftype):
    """Independent plain-Python scanline filter straight from the spec's
    per-byte recurrences (W3C PNG §9) — cross-checks the vectorized
    encoder so the decode round-trip isn't self-referential."""
    h, w, bpp = img.shape
    rows = img.reshape(h, w * bpp).astype(int)
    out = bytearray()
    for y in range(h):
        out.append(ftype)
        for x in range(w * bpp):
            cur = rows[y][x]
            a = rows[y][x - bpp] if x >= bpp else 0
            b = rows[y - 1][x] if y else 0
            c = rows[y - 1][x - bpp] if (y and x >= bpp) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((cur - pred) & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter_type(ftype):
    img = _gradient_img(h=9, w=13)
    blob = mm.encode_png(img, filters=[ftype] * 9)
    assert np.array_equal(mm.decode_png(blob), img)


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_encoder_matches_naive_spec_filter(ftype):
    """encode_png's vectorized forward filter == the per-byte spec
    recurrence, so the round-trip pin above is against independent math."""
    import zlib

    img = _gradient_img(h=5, w=7)
    blob = mm.encode_png(img, filters=[ftype] * 5)
    # pull the IDAT body back out and decompress
    idat = blob.index(b"IDAT")
    size = int.from_bytes(blob[idat - 4 : idat], "big")
    raw = zlib.decompress(blob[idat + 4 : idat + 4 + size])
    assert raw == _naive_forward_filter(img, ftype)


def test_png_mixed_filters_and_noise():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(16, 11, 3), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0, 4, 1, 3, 2, 0, 4]
    assert np.array_equal(mm.decode_png(mm.encode_png(img, filters=filters)), img)


def test_png_gray_alpha_rgba_channels():
    rng = np.random.default_rng(7)
    for c in (1, 2, 4):
        img = rng.integers(0, 256, size=(6, 5, c), dtype=np.uint8)
        got = mm.decode_png(mm.encode_png(img, filters=[4] * 6))
        assert got.shape == (6, 5, c) and np.array_equal(got, img)
    # 2-D gray input round-trips as HxWx1
    g = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png(g))[..., 0], g)


def test_png_palette():
    """Hand-built color-type-3 PNG: 2x2 indices into a 3-entry palette."""
    import zlib

    def chunk(ctype, body):
        return (len(body).to_bytes(4, "big") + ctype + body
                + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 3, 0, 0, 0])
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    scan = bytes([0, 0, 1, 0, 2, 1])  # filter-0 rows: [R, G], [B, G]
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
            + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))
    got = mm.decode_png(blob)
    want = np.array([[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [0, 255, 0]]],
                    dtype=np.uint8)
    assert np.array_equal(got, want)
    # out-of-range palette index raises
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
           + chunk(b"IDAT", zlib.compress(bytes([0, 0, 9, 0, 0, 0])))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        mm.decode_png(bad)


def test_png_rejects_bad_crc_truncation_unsupported_depth():
    import zlib

    img = _gradient_img(h=4, w=4)
    blob = bytearray(mm.encode_png(img))
    blob[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(blob))
    good = mm.encode_png(img)
    with pytest.raises(ValueError):
        mm.decode_png(good[: len(good) // 2])

    def chunk(ctype, body):
        return (len(body).to_bytes(4, "big") + ctype + body
                + (zlib.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    # still-unsupported depth/color combos (16-bit; sub-8-bit truecolor)
    for depth, color in ((16, 2), (4, 2)):
        ihdr = ((2).to_bytes(4, "big") + (2).to_bytes(4, "big")
                + bytes([depth, color, 0, 0, 0]))
        bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"\0" * 14)) + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            mm.decode_png(bad)


def test_png_multiple_idat_chunks_concatenate():
    import zlib

    img = _gradient_img(h=6, w=6)
    blob = mm.encode_png(img)
    idat = blob.index(b"IDAT")
    size = int.from_bytes(blob[idat - 4 : idat], "big")
    body = blob[idat + 4 : idat + 4 + size]
    head, tail = blob[: idat - 4], blob[idat + 8 + size :]

    def chunk(ctype, b):
        return (len(b).to_bytes(4, "big") + ctype + b
                + (zlib.crc32(ctype + b) & 0xFFFFFFFF).to_bytes(4, "big"))

    split = head + chunk(b"IDAT", body[:7]) + chunk(b"IDAT", body[7:]) + tail
    assert np.array_equal(mm.decode_png(split), img)


# --- golden values through the Spark feature path -----------------------


def test_image_features_real_bmp_golden(spark):
    img = _gradient_img(h=32, w=32)  # 32x32 -> the 8x8 phash has all 64 bits
    rows = spark.createDataFrame(
        [(1, bytearray(mm.encode_bmp(img)))], "doc_id long, payload binary"
    )
    feat = mm.image_features(rows, fake=False).collect()[0]
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    want_luma = round(float(luma.mean()), 6)
    want_edge = round(
        float(np.abs(np.diff(luma, axis=1)).mean()
              + np.abs(np.diff(luma, axis=0)).mean()), 6)
    assert feat["mean_luma"] == pytest.approx(want_luma, abs=1e-6)
    assert feat["edge_density"] == pytest.approx(want_edge, abs=1e-6)
    small = luma[::4, ::4]
    bits = (small > small.mean()).ravel()[:64]
    want_phash = int(np.packbits(bits).view(">u8")[0].astype(np.int64))
    assert feat["phash"] == want_phash


def test_resize_images_real_bmp(spark):
    img = _gradient_img(h=16, w=32)
    rows = spark.createDataFrame(
        [(7, bytearray(mm.encode_bmp(img)))], "doc_id long, payload binary"
    )
    out = mm.resize_images(rows, size=(8, 8), fake=False).collect()[0]
    ys = (np.arange(8) * 16 // 8).astype(int)
    xs = (np.arange(8) * 32 // 8).astype(int)
    assert bytes(out["pixels"]) == img[np.ix_(ys, xs)].tobytes()


def test_image_features_real_png_golden(spark):
    """fake=False now accepts PNG: an RGB PNG (Paeth-filtered) and a gray
    PNG (replicated to 3 channels) both produce REAL statistics."""
    img = _gradient_img(h=32, w=32)
    gray = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rows = spark.createDataFrame(
        [
            (1, bytearray(mm.encode_png(img, filters=[4] * 32))),
            (2, bytearray(mm.encode_png(gray))),
        ],
        "doc_id long, payload binary",
    )
    feats = {r["doc_id"]: r for r in mm.image_features(rows, fake=False).collect()}
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert feats[1]["mean_luma"] == pytest.approx(float(luma.mean()), abs=1e-6)
    # gray replicated to RGB: luma == the gray values themselves
    assert feats[2]["mean_luma"] == pytest.approx(float(gray.mean()), abs=1e-6)


def test_audio_features_real_wav_golden(spark):
    sr = 8000
    t = np.arange(2 * sr) / sr  # 2 seconds
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    rows = spark.createDataFrame(
        [(3, bytearray(mm.encode_wav(sig, sr)))], "doc_id long, payload binary"
    )
    feat = mm.audio_features(rows, fake=False).collect()[0]
    assert feat["duration_s"] == pytest.approx(2.0, abs=1e-6)
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert feat["rms"] == pytest.approx(0.5 / np.sqrt(2), abs=1e-3)
    # a 440 Hz tone crosses zero 2*440 times per second
    assert feat["zero_cross_rate"] == pytest.approx(880.0 / sr, abs=2.0 / sr)
    # spectral centroid of a pure tone = the tone
    assert feat["spectral_centroid"] == pytest.approx(440.0, abs=2.0)


def test_mixed_real_and_fake_batch(spark):
    """One batch holding a real BMP next to a lib-bound (WebP-magic)
    payload: the real one decodes for real, the other takes the
    deterministic-fake path."""
    img = _gradient_img(h=8, w=8)
    rows = spark.createDataFrame(
        [
            (1, bytearray(mm.encode_bmp(img))),
            (2, bytearray(b"RIFF" + b"x" * 4 + b"WEBP" + b"x" * 56)),
        ],
        "doc_id long, payload binary",
    )
    feats = {r["doc_id"]: r for r in mm.image_features(rows, fake=True).collect()}
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert feats[1]["mean_luma"] == pytest.approx(float(luma.mean()), abs=1e-6)
    assert 0 <= feats[2]["mean_luma"] <= 255


def test_synth_encoded_media_real_payloads(spark):
    """The driver-query fixture generator emits payloads the real codecs
    decode: all six image members — BMP/PNG/JPEG/GIF/TIFF/VP8L-WebP —
    decode for real (fake=False works on every one since r4's
    vp8lcodec); audio evens are real WAV."""
    ids = spark.range(18).withColumnRenamed("id", "doc_id")
    imgs = mm.synth_encoded_media(ids, kind="image")
    by_id = {r["doc_id"]: bytes(r["payload"]) for r in imgs.collect()}
    for i, p in by_id.items():
        if i % 6 == 0:
            got = mm.decode_bmp(p)
            want = np.random.default_rng(i).integers(
                0, 256, size=(16, 16, 3), dtype=np.uint8)
            assert np.array_equal(got, want)
        elif i % 6 == 1:
            got = mm.decode_png(p)
            want = np.random.default_rng(i).integers(
                0, 256, size=(12, 9, 3), dtype=np.uint8)
            assert np.array_equal(got, want)
        elif i % 6 == 2:
            from geocore_spark.operators.jpegcodec import decode_jpeg

            rng = np.random.default_rng(i)
            want = np.clip(rng.normal(128, 40, size=(24, 18, 3)), 0, 255).astype(
                np.uint8
            )
            got = decode_jpeg(p)
            assert got.shape == want.shape
            # lossy: decoded within quality-90 4:2:0 tolerance of the source
            assert np.abs(got.astype(int) - want.astype(int)).mean() < 25
        elif i % 6 == 3:
            from geocore_spark.operators.gifcodec import decode_gif

            rng = np.random.default_rng(i)
            pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
            want = pal[rng.integers(0, 8, size=(14, 11))]
            assert np.array_equal(decode_gif(p), want)  # lossless
        elif i % 6 == 4:
            from geocore_spark.operators.tiffcodec import decode_tiff

            rng = np.random.default_rng(i)
            want = rng.integers(0, 256, size=(13, 10, 3), dtype=np.uint8)
            assert np.array_equal(decode_tiff(p), want)  # lossless
        else:
            from geocore_spark.operators.vp8lcodec import decode_webp

            assert p[:4] == b"RIFF" and p[8:12] == b"WEBP"
            rng = np.random.default_rng(i)
            want = rng.integers(0, 256, size=(11, 13, 4), dtype=np.uint8)
            assert np.array_equal(decode_webp(p), want)  # lossless
    # real/fake routing end-to-end: every image member decodes real now
    assert mm.image_features(imgs, fake=False).count() == 18
    aud = mm.synth_encoded_media(ids, kind="audio")
    wavs = aud.filter(F.col("doc_id") % 2 == 0)
    feats = {r["doc_id"]: r for r in mm.audio_features(wavs, fake=False).collect()}
    for i, r in feats.items():
        want_f = 200.0 + (i % 17) * 100.0
        assert r["spectral_centroid"] == pytest.approx(want_f, abs=5.0)
    with pytest.raises(ValueError):
        mm.synth_encoded_media(ids, kind="pdf")


def test_avi_mjpeg_roundtrip():
    """encode_avi_mjpeg -> demux_avi returns the exact per-frame JPEG
    chunks, and each decodes back to ~the source frame."""
    from geocore_spark.operators.jpegcodec import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    frames = np.clip(rng.normal(128, 35, (5, 16, 16, 3)), 0, 255).astype(np.uint8)
    avi = mm.encode_avi_mjpeg(frames, fps=5, quality=85)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert b"idx1" in avi and b"MJPG" in avi
    got = mm.demux_avi(avi)
    assert len(got) == 5
    for src, j in zip(frames, got):
        # chunk bytes ARE the standalone JPEG encoding of the frame
        assert j == encode_jpeg(src, quality=85, subsampling="420")
        dec = decode_jpeg(j)
        assert np.abs(dec.astype(int) - src.astype(int)).mean() < 25
    # this seed yields odd-length chunks -> even-byte padding exercised
    assert any(len(j) % 2 for j in got)
    with pytest.raises(ValueError):
        mm.demux_avi(avi[:40])  # truncated
    with pytest.raises(ValueError):
        mm.demux_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_frame_sample_real_avi(spark):
    """frame_sample demuxes AVI payloads for real (every_n honored,
    frame bytes = the container's JPEG chunks) while MP4-magic payloads
    take the fake 1KB path in the same batch."""
    rng = np.random.default_rng(3)
    frames = np.clip(rng.normal(100, 30, (6, 8, 8, 3)), 0, 255).astype(np.uint8)
    avi = mm.encode_avi_mjpeg(frames, fps=10, quality=90)
    rows = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"\x00\x00\x00\x20ftypisom" + b"x" * 2040))],
        "doc_id long, payload binary",
    )
    out = mm.frame_sample(rows, every_n=2, fake=True).collect()
    av = sorted((r["frame_idx"], bytes(r["frame"])) for r in out if r["doc_id"] == 1)
    assert [i for i, _ in av] == [0, 2, 4]
    want = mm.demux_avi(avi)
    assert [f for _, f in av] == [want[0], want[2], want[4]]
    mp4 = [r for r in out if r["doc_id"] == 2]
    assert len(mp4) == 1 and len(bytes(mp4[0]["frame"])) == 1024
    # real path refuses nothing: fake=False works for the AVI row alone
    only_avi = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id long, payload binary"
    )
    assert mm.frame_sample(only_avi, every_n=3, fake=False).count() == 2


def test_sniff_format_detects_real_fixtures(spark):
    """encode_bmp / encode_wav / encode_avi_mjpeg output sniffs to the
    right format tag."""
    sig = np.zeros(100, dtype=np.float32)
    from geocore_spark.operators.tiffcodec import encode_tiff

    avi = mm.encode_avi_mjpeg(
        np.zeros((1, 8, 8, 3), dtype=np.uint8), fps=5, quality=80
    )
    rows = spark.createDataFrame(
        [
            (1, bytearray(mm.encode_wav(sig, 8000))),
            (2, bytearray(mm.encode_bmp(_gradient_img(4, 4)))),
            (3, bytearray(avi)),
            (4, bytearray(encode_tiff(np.zeros((4, 4, 3), dtype=np.uint8)))),
        ],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: r["f"]
        for r in rows.select(
            "doc_id", mm.sniff_format(F.col("payload")).alias("f")
        ).collect()
    }
    assert got == {1: "wav", 2: "bmp", 3: "avi", 4: "tiff"}


def test_fake_true_never_raises_on_corrupt_real_formats():
    """fake=True is a no-raise guarantee: corrupt payloads behind real
    magic prefixes fall back to the deterministic fake instead of
    aborting the stage; fake=False stays strict."""
    corrupt = [
        b"BM" + b"\x01" * 20,             # truncated BMP
        b"\x89PNG\r\n\x1a\n" + b"junk",   # truncated PNG
        b"\xff\xd8\xff" + b"x" * 32,      # garbage JPEG
        b"GIF89a" + b"\x00" * 4,          # truncated GIF
    ]
    for p in corrupt:
        img = mm._decode_image_stub(p, fake=True)
        assert img.shape == (32, 32, 3)
        with pytest.raises(Exception):
            mm._decode_image_stub(p, fake=False)
    # audio: corrupt WAV under fake=True falls back too
    bad_wav = b"RIFF" + (100).to_bytes(4, "little") + b"WAVE" + b"\x00" * 8
    sig, sr = mm._decode_audio_stub(bad_wav, fake=True)
    assert len(sig) == sr
    with pytest.raises(Exception):
        mm._decode_audio_stub(bad_wav, fake=False)


def test_decode_wav_truncated_data_raises():
    sig = np.zeros(1000, dtype=np.float32)
    enc = mm.encode_wav(sig, 8000)
    with pytest.raises(ValueError, match="truncated WAV"):
        mm.decode_wav(enc[: len(enc) - 500])


def test_png_adam7_interlace_roundtrip():
    """Adam7: seven independently-filtered pass sub-images. Interlaced
    and plain encodings differ on disk but decode identically; filters
    cycle across pass rows so every unfilter path runs inside passes."""
    rng = np.random.default_rng(8)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, size=(21, 17, ch), dtype=np.uint8)
        n_rows = sum(
            img[y0::dy, x0::dx].shape[0]
            for x0, y0, dx, dy in mm._ADAM7
            if img[y0::dy, x0::dx].size
        )
        enc = mm.encode_png(
            img, filters=[i % 5 for i in range(n_rows)], interlace=True
        )
        assert np.array_equal(mm.decode_png(enc), img)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    a = mm.encode_png(img)
    b = mm.encode_png(img, interlace=True)
    assert a != b
    assert np.array_equal(mm.decode_png(a), mm.decode_png(b))
    # tiny image: several Adam7 passes are empty and contribute no bytes
    tiny = rng.integers(0, 256, size=(1, 3, 3), dtype=np.uint8)
    assert np.array_equal(
        mm.decode_png(mm.encode_png(tiny, interlace=True)), tiny
    )


def test_png_sub8bit_gray_and_palette():
    """Hand-built 1/2/4-bit streams (filter bytes + packed samples per
    the spec): gray scales to the full 8-bit range, palette indexes
    look up PLTE. Sub is tested at its 1-byte filter unit."""
    import zlib as _z

    def chunk(ctype, body):
        return (len(body).to_bytes(4, "big") + ctype + body
                + (_z.crc32(ctype + body) & 0xFFFFFFFF).to_bytes(4, "big"))

    def build(w, h, depth, color, raw, plte=b""):
        ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + bytes([depth, color, 0, 0, 0]))
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b"")

    # 1-bit gray, 10 px wide (2 bytes/row, 6 padding bits), filter 0
    rows = [0b1010101010, 0b1111100000]
    raw = b"".join(
        b"\x00" + ((r << 6) & 0xFFFF).to_bytes(2, "big") for r in rows
    )
    img = mm.decode_png(build(10, 2, 1, 0, raw))
    assert img.shape == (2, 10, 1)
    want0 = [255, 0] * 5
    want1 = [255] * 5 + [0] * 5
    assert list(img[0, :, 0]) == want0 and list(img[1, :, 0]) == want1
    # 4-bit gray with the Sub filter (1-byte unit): second byte stored
    # as a delta of the first
    line = bytes([0x01, bytes([0x23 - 0x01 & 0xFF])[0]])
    img = mm.decode_png(build(4, 1, 4, 0, b"\x01" + line))
    assert list(img[0, :, 0]) == [0 * 17, 1 * 17, 2 * 17, 3 * 17]
    # 2-bit palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    raw = b"\x00" + bytes([0b00011011])  # indexes 0,1,2,3
    img = mm.decode_png(build(4, 1, 2, 3, raw, plte))
    assert [tuple(p) for p in img[0]] == [
        (255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]


_LIBPNG_TEST = "/usr/share/doc/libpng-dev/examples/pngtest.png"


@pytest.mark.skipif(
    not __import__("os").path.exists(_LIBPNG_TEST),
    reason="libpng example image not present",
)
def test_png_real_world_interlaced():
    """libpng's own interlaced RGBA test image (independent encoder)."""
    img = mm.decode_png(open(_LIBPNG_TEST, "rb").read())
    assert img.shape == (69, 91, 4)
    assert 0 < float(img[..., :3].mean()) < 128  # dark figure, coherent


# sha256 of the little-endian int16 expansion of bytes 0..255, computed
# FROM the stdlib audioop reference (python 3.11) — keeps the pin alive
# on runtimes where audioop was removed (3.13+)
_G711_REF_SHA = {
    7: "3dab54339e520bb2c924826e3b72a917a2b612e9fd12fc867500f1d983a75827",
    6: "e04788d110e58ff8c70c93b8480190d973e3b67876b6119abbaec766cc75c174",
}


def test_wav_g711_mulaw_alaw_match_stdlib_reference():
    """G.711 mu-law / A-law decode tables == the stdlib audioop
    reference implementation for all 256 byte values, end-to-end
    through decode_wav (format tags 7 and 6). Where audioop is gone
    (3.13+), the comparison is against its recorded sha256."""
    import hashlib

    try:
        import audioop
        refs = {7: audioop.ulaw2lin, 6: audioop.alaw2lin}
    except ImportError:
        refs = None
    every = bytes(range(256))
    for tag in (7, 6):
        if refs is not None:
            ref_bytes = refs[tag](every, 2)
            assert hashlib.sha256(ref_bytes).hexdigest() == _G711_REF_SHA[tag]
            ref = np.frombuffer(ref_bytes, dtype="<i2").astype(np.float32)
        else:
            ref = None
        fmt = (tag.to_bytes(2, "little") + (1).to_bytes(2, "little")
               + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
               + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
        blob = (b"RIFF" + (4 + 8 + len(fmt) + 8 + 256).to_bytes(4, "little")
                + b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
                + b"data" + (256).to_bytes(4, "little") + every)
        sig, sr = mm.decode_wav(blob)
        assert sr == 8000
        lin = (sig * 32768.0).astype("<i2")
        assert hashlib.sha256(lin.tobytes()).hexdigest() == _G711_REF_SHA[tag]
        if ref is not None:
            assert np.array_equal(sig * 32768.0, ref), tag
