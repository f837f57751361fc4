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
    """One batch holding a real BMP next to a non-BMP payload: the real
    one decodes for real, the other takes the deterministic-fake path."""
    img = _gradient_img(h=8, w=8)
    rows = spark.createDataFrame(
        [(1, bytearray(mm.encode_bmp(img))), (2, bytearray(b"\x89PNG" + b"x" * 64))],
        "doc_id long, payload binary",
    )
    feats = {r["doc_id"]: r for r in mm.image_features(rows, fake=True).collect()}
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert feats[1]["mean_luma"] == pytest.approx(float(luma.mean()), abs=1e-6)
    assert 0 <= feats[2]["mean_luma"] <= 255


def test_sniff_format_detects_real_fixtures(spark):
    """encode_bmp / encode_wav output sniffs to the right format tag."""
    sig = np.zeros(100, dtype=np.float32)
    rows = spark.createDataFrame(
        [
            (1, bytearray(mm.encode_wav(sig, 8000))),
            (2, bytearray(mm.encode_bmp(_gradient_img(4, 4)))),
        ],
        "doc_id long, payload binary",
    )
    got = {
        r["doc_id"]: r["f"]
        for r in rows.select(
            "doc_id", mm.sniff_format(F.col("payload")).alias("f")
        ).collect()
    }
    assert got == {1: "wav", 2: "bmp"}
