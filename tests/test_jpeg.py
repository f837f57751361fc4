"""Pins for the pure-numpy baseline JPEG codec (operators/jpegcodec).

No Spark needed — the codec is plain numpy; its Spark integration is
covered by tests/test_codecs.py (image_features routing) and the
media driver queries.
"""

import hashlib

import numpy as np
import pytest

from geocore_spark.operators import jpegcodec as jc


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            yy * 255.0 / max(h - 1, 1),
            xx * 255.0 / max(w - 1, 1),
            127 + 100 * np.sin(yy / 5.0) * np.cos(xx / 7.0),
        ],
        axis=-1,
    )
    return np.clip(img, 0, 255).astype(np.uint8)


def test_zigzag_is_the_published_order():
    # first 16 entries of the spec's figure-5 scan, natural indexes
    assert list(jc.ZIGZAG[:16]) == [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    ]
    assert sorted(jc.ZIGZAG) == list(range(64))


def test_dct_matrix_orthonormal():
    assert np.allclose(jc.DCT_M @ jc.DCT_M.T, np.eye(8), atol=1e-12)


def test_quality_50_is_the_annex_k_tables():
    ql, qc = jc.quality_tables(50)
    assert np.array_equal(ql, jc.QT_LUMA)
    assert np.array_equal(qc, jc.QT_CHROMA)
    # endpoints: q=100 -> all-ones-ish (scale 0 clamps to 1s at the top)
    ql100, _ = jc.quality_tables(100)
    assert ql100.min() == 1
    with pytest.raises(ValueError):
        jc.quality_tables(0)


def test_flat_color_roundtrip_exact():
    img = np.full((24, 24, 3), 119, dtype=np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(img, quality=90))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("sub,max_err,mean_err", [("444", 8, 1.5), ("420", 40, 6.0)])
def test_gradient_roundtrip_bounds(sub, max_err, mean_err):
    img = _gradient(37, 29)  # odd dims: partial-MCU padding both axes
    out = jc.decode_jpeg(jc.encode_jpeg(img, quality=95, subsampling=sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= max_err
    assert err.mean() <= mean_err


def test_grayscale_roundtrip():
    yy, xx = np.mgrid[0:37, 0:29]
    g = np.clip(127 + 80 * np.sin(yy / 4.0) * np.cos(xx / 6.0), 0, 255).astype(
        np.uint8
    )
    out = jc.decode_jpeg(jc.encode_jpeg(g, quality=95))
    assert out.shape == (37, 29, 1)
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 4


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(7)
    img = np.clip(rng.normal(128, 30, (48, 64, 3)), 0, 255).astype(np.uint8)
    enc = jc.encode_jpeg(img, quality=90, subsampling="420", restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI emitted
    assert b"\xff\xd0" in enc  # at least one RST0
    plain = jc.encode_jpeg(img, quality=90, subsampling="420")
    assert np.array_equal(jc.decode_jpeg(enc), jc.decode_jpeg(plain))


def test_encode_deterministic_golden():
    img = _gradient(16, 16)
    enc = jc.encode_jpeg(img, quality=80)
    assert enc == jc.encode_jpeg(img, quality=80)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    # golden digest: any change to tables, DCT, rounding or bitstream
    # packing shows up here before it shows up as a subtle decode skew
    assert hashlib.sha256(enc).hexdigest() == (
        _GOLDEN_SHA256
    ), "encoded bytes changed — rebaseline only if intentional"


_GOLDEN_SHA256 = "2974e45ad3da0a6c1085610c68b3bf22daea6e4c30c995fce47133a3ed99365f"


def test_16bit_dqt_segment_decodes():
    """Rewrite the 8-bit DQT segments of a real stream into the spec's
    16-bit (Pq=1) form; pixels must be identical."""
    img = _gradient(24, 24)
    enc = jc.encode_jpeg(img, quality=90)
    out = bytearray()
    pos = 0
    while pos < len(enc):
        if enc[pos] == 0xFF and pos + 1 < len(enc) and enc[pos + 1] == 0xDB:
            size = int.from_bytes(enc[pos + 2 : pos + 4], "big")
            body = enc[pos + 4 : pos + 2 + size]
            tq = body[0] & 0xF
            wide = bytes([0x10 | tq]) + b"".join(
                v.to_bytes(2, "big") for v in body[1:65]
            )
            out += b"\xff\xdb" + (len(wide) + 2).to_bytes(2, "big") + wide
            pos += 2 + size
        else:
            out.append(enc[pos])
            pos += 1
    assert np.array_equal(jc.decode_jpeg(bytes(out)), jc.decode_jpeg(enc))


@pytest.mark.parametrize("sub", ["444", "420"])
def test_progressive_decodes_pixel_identical_to_baseline(sub):
    """A progressive (SOF2) stream reorders the SAME quantized
    coefficients into scans, so decoding it must give exactly the
    baseline pixels — the strongest possible cross-check of the
    progressive scan machinery (DC scan, AC band scans, EOB runs)."""
    img = _gradient(37, 29)
    base = jc.decode_jpeg(jc.encode_jpeg(img, quality=90, subsampling=sub))
    prog = jc.decode_jpeg(
        jc.encode_jpeg(img, quality=90, subsampling=sub, progressive=True)
    )
    assert np.array_equal(base, prog)


def test_progressive_grayscale_and_eob_runs():
    yy, xx = np.mgrid[0:37, 0:29]
    g = np.clip(127 + 80 * np.sin(yy / 4.0) * np.cos(xx / 6.0), 0, 255).astype(
        np.uint8
    )
    assert np.array_equal(
        jc.decode_jpeg(jc.encode_jpeg(g, quality=90)),
        jc.decode_jpeg(jc.encode_jpeg(g, quality=90, progressive=True)),
    )
    # flat image: every AC band scan is one long EOB run
    flat = np.full((40, 24, 3), 77, np.uint8)
    assert np.array_equal(
        jc.decode_jpeg(jc.encode_jpeg(flat, 90, progressive=True)),
        jc.decode_jpeg(jc.encode_jpeg(flat, 90)),
    )
    # low quality + noise: dense ZRL/EOBn mix
    rng = np.random.default_rng(13)
    big = np.clip(rng.normal(128, 50, (64, 96, 3)), 0, 255).astype(np.uint8)
    assert np.array_equal(
        jc.decode_jpeg(jc.encode_jpeg(big, quality=30, subsampling="420")),
        jc.decode_jpeg(
            jc.encode_jpeg(big, quality=30, subsampling="420", progressive=True)
        ),
    )


_SPARK_GRAYSCALE = (
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
    "multi-channel/grayscale.jpg"
)


@pytest.mark.skipif(
    not __import__("os").path.exists(_SPARK_GRAYSCALE),
    reason="Spark distribution sample image not present",
)
def test_progressive_real_world_successive_approximation():
    """The progressive JPEG shipped inside the Spark distribution
    (encoded by a real encoder with successive approximation, which our
    fixture writer deliberately does not emit) must decode: this is the
    refinement-scan path's independent validation."""
    img = jc.decode_jpeg(open(_SPARK_GRAYSCALE, "rb").read())
    assert img.shape == (215, 300, 1)
    assert 100 < float(img.mean()) < 180
    assert img.min() == 0 and img.max() == 255


def test_lossless_sof_rejected_not_garbled():
    """Flip SOF0 -> SOF3 (lossless): must raise NotImplementedError,
    never mis-decode."""
    enc = bytearray(jc.encode_jpeg(_gradient(16, 16)))
    idx = enc.find(b"\xff\xc0")
    assert idx > 0
    enc[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="non-baseline"):
        jc.decode_jpeg(bytes(enc))


def test_corrupt_inputs_raise():
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"\x89PNG")
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"\xff\xd8\xff\xe0\x00\x10" + b"x" * 4)  # truncated
    with pytest.raises(ValueError):
        jc.encode_jpeg(np.zeros((8, 8, 3), dtype=np.float64))  # not uint8
    with pytest.raises(ValueError):
        jc.encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), subsampling="422")


def test_decoder_against_independent_bitstream_structure():
    """The decoder consumes streams with features our encoder never
    emits together: 4:2:0 + restart + 16-bit DQT in one stream."""
    img = _gradient(33, 47)
    enc = jc.encode_jpeg(img, quality=85, subsampling="420", restart_interval=3)
    out = jc.decode_jpeg(enc)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 8.0


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    — both in the header stream and before an RSTn in the scan."""
    img = _gradient(24, 24)
    enc = jc.encode_jpeg(img, quality=90)
    base = jc.decode_jpeg(enc)
    # insert fill bytes before the DQT marker
    idx = enc.find(b"\xff\xdb")
    padded = enc[:idx] + b"\xff\xff\xff" + enc[idx:]
    assert np.array_equal(jc.decode_jpeg(padded), base)
    # and before a restart marker inside the scan
    enc_rst = jc.encode_jpeg(img, quality=90, restart_interval=1)
    ridx = enc_rst.find(b"\xff\xd0")
    assert ridx > 0
    padded_rst = enc_rst[:ridx] + b"\xff" + enc_rst[ridx:]
    assert np.array_equal(
        jc.decode_jpeg(padded_rst), jc.decode_jpeg(enc_rst)
    )


def test_dc_refinement_before_first_dc_scan_rejected():
    """Malformed progressive scan order (AC band scans first, then a DC
    scan marked as refinement) must raise, not OR refinement bits into
    all-zero DC coefficients."""
    enc = jc.encode_jpeg(_gradient(16, 16), quality=90, progressive=True)
    parts = enc.split(b"\xff\xda")
    assert len(parts) >= 3  # header, DC scan, AC band scans
    header, dc_scan, ac_scans = parts[0], parts[1], parts[2:]
    assert ac_scans[-1].endswith(b"\xff\xd9")
    ac_scans[-1] = ac_scans[-1][:-2]
    # flip the DC scan's Ah nibble to 1 (refinement): the approximation
    # byte is the last byte of the SOS segment body
    size = int.from_bytes(dc_scan[:2], "big")
    dc_ref = bytearray(dc_scan)
    dc_ref[size - 1] = 0x10
    evil = (
        header
        + b"".join(b"\xff\xda" + s for s in ac_scans)
        + b"\xff\xda"
        + bytes(dc_ref)
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="DC refinement"):
        jc.decode_jpeg(evil)
