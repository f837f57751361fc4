"""Pins for the pure-numpy TIFF codec (operators/tiffcodec).

No Spark needed; Spark routing is covered by tests/test_codecs.py.
"""

import os

import numpy as np
import pytest

from geocore_spark.operators import tiffcodec as tc


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
@pytest.mark.parametrize("rps", [None, 8])
def test_roundtrip_lossless(ch, comp, rps):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (37, 23, ch), dtype=np.uint8)
    enc = tc.encode_tiff(img, compression=comp, rows_per_strip=rps)
    assert np.array_equal(tc.decode_tiff(enc), img)


def test_lzw_horizontal_predictor():
    rng = np.random.default_rng(4)
    img = np.cumsum(
        rng.integers(0, 3, (20, 30, 3), dtype=np.uint8), axis=1
    ).astype(np.uint8)
    enc = tc.encode_tiff(img, compression="lzw", predictor=True, rows_per_strip=6)
    assert b"II*\x00" == enc[:4]
    assert np.array_equal(tc.decode_tiff(enc), img)
    # the predictor should shrink smooth-gradient streams
    plain = tc.encode_tiff(img, compression="lzw")
    assert len(enc) < len(plain)


def test_lzw_width_growth_and_dictionary_reset():
    """Random content forces the code width through 10/11/12 bits
    (early-change schedule) and past the 4094-entry reset."""
    rng = np.random.default_rng(4)
    big = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
    assert np.array_equal(
        tc.decode_tiff(tc.encode_tiff(big, compression="lzw")), big
    )


def test_packbits_runs_and_literals():
    # long runs, alternating bytes, and boundary lengths
    img = np.zeros((3, 200, 1), dtype=np.uint8)
    img[1, ::2] = 255
    img[2, :130] = 7
    enc = tc.encode_tiff(img, compression="packbits")
    assert np.array_equal(tc.decode_tiff(enc), img)
    with pytest.raises(ValueError):
        tc._packbits_decode(b"\x05abc", 10)  # truncated literal


def test_white_is_zero_grayscale():
    """photometric 0 inverts; build by patching the tag in our output."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8, 1)
    enc = bytearray(tc.encode_tiff(img))
    # photometric tag (262) SHORT value sits at a fixed entry; find it
    idx = enc.find((262).to_bytes(2, "little"))
    assert enc[idx + 8] == 1  # black-is-zero as written
    enc[idx + 8] = 0
    out = tc.decode_tiff(bytes(enc))
    assert np.array_equal(out, 255 - img)


def test_corrupt_inputs_raise():
    with pytest.raises(ValueError):
        tc.decode_tiff(b"XX\x2a\x00")
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    enc = tc.encode_tiff(img, compression="lzw")
    with pytest.raises(ValueError):
        tc.decode_tiff(enc[: len(enc) - 30])
    with pytest.raises(NotImplementedError):
        # 16-bit samples: patch BitsPerSample (single-sample gray form)
        g = bytearray(tc.encode_tiff(np.zeros((4, 4, 1), dtype=np.uint8)))
        i = g.find((258).to_bytes(2, "little"))
        g[i + 8] = 16
        tc.decode_tiff(bytes(g))


_REAL_TIFF = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/imghdrdata/python.tiff"
)
_REAL_JPEG = os.path.join(os.path.dirname(_REAL_TIFF), "python.jpg")


@pytest.mark.skipif(not os.path.exists(_REAL_TIFF), reason="no sample tiff")
def test_real_world_uncompressed_rgba():
    img = tc.decode_tiff(open(_REAL_TIFF, "rb").read())
    assert img.shape == (16, 16, 4)


@pytest.mark.skipif(
    not (os.path.exists(_REAL_TIFF) and os.path.exists(_REAL_JPEG)),
    reason="need both sample files",
)
def test_cross_format_agreement_with_jpeg_decoder():
    """python.tiff and python.jpg encode the SAME source image; two
    fully independent decode paths (TIFF strips vs JPEG DCT/Huffman)
    must agree within JPEG's lossy tolerance — mutual validation that
    neither decoder is systematically wrong (channel order, orientation,
    scaling)."""
    from geocore_spark.operators import jpegcodec as jc

    tif = tc.decode_tiff(open(_REAL_TIFF, "rb").read())[..., :3]
    jpg = jc.decode_jpeg(open(_REAL_JPEG, "rb").read())
    d = np.abs(tif.astype(int) - jpg.astype(int))
    assert d.mean() < 15.0  # measured 8.9; sharp-edge ringing only
