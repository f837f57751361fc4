"""Pins for the pure-Python/numpy GIF codec (operators/gifcodec).

No Spark needed; Spark routing is covered by tests/test_codecs.py.
The decoder was additionally validated against independently-encoded
real-world GIFs (correct image content and orientation on known
images); those files are environment-local, so the committed pins use
our own encoder, whose LZW is independent math from the decoder's
(string-table compressor vs prefix/suffix-array expander).
"""

import hashlib

import numpy as np
import pytest

from geocore_spark.operators import gifcodec as gc


def _paletted(h, w, n_colors, seed=5):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, (h, w))]


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_lossless(interlace):
    img = _paletted(23, 31, 7)
    out = gc.decode_gif(gc.encode_gif(img, palette_bits=3, interlace=interlace))
    assert np.array_equal(out, img)


def test_roundtrip_256_colors_dictionary_growth():
    """21.6k random pixels at 8-bit palette: the LZW dictionary grows
    through every code width to the 4096 cap and resets."""
    img = _paletted(120, 180, 256, seed=9)
    assert np.array_equal(gc.decode_gif(gc.encode_gif(img, 8)), img)


def test_roundtrip_repetitive_and_kwkwk():
    """Tiled content drives deep dictionary chains; constant content
    drives the KwKwK special case (code == next undefined entry)."""
    pal = np.random.default_rng(1).integers(0, 256, (7, 3), dtype=np.uint8)
    tiled = np.tile(pal[np.random.default_rng(2).integers(0, 7, (4, 4))], (16, 16, 1))
    assert np.array_equal(gc.decode_gif(gc.encode_gif(tiled, 3)), tiled)
    flat = pal[np.zeros((9, 9), dtype=int)]
    assert np.array_equal(gc.decode_gif(gc.encode_gif(flat, 3)), flat)


def test_two_color_minimum_palette():
    img = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)[
        np.random.default_rng(3).integers(0, 2, (17, 13))
    ]
    assert np.array_equal(gc.decode_gif(gc.encode_gif(img, 1)), img)


def test_interlace_row_order_differs_on_disk():
    """Interlaced and plain encodings of the same image differ as bytes
    but decode identically — proves the pass reordering is real."""
    img = _paletted(16, 8, 4, seed=7)
    a = gc.encode_gif(img, 2, interlace=False)
    b = gc.encode_gif(img, 2, interlace=True)
    assert a != b
    assert np.array_equal(gc.decode_gif(a), gc.decode_gif(b))


def test_encode_deterministic_golden():
    img = _paletted(16, 16, 8, seed=11)
    enc = gc.encode_gif(img, 3)
    assert enc == gc.encode_gif(img, 3)
    assert enc[:6] == b"GIF89a" and enc[-1:] == b"\x3b"
    assert hashlib.sha256(enc).hexdigest() == (
        "f55497392e22995af0f669dec260734541f48bbfed69a17207f3e7279d781dd4"
    ), "encoded bytes changed — rebaseline only if intentional"


def test_extension_blocks_are_skipped():
    """Insert 89a comment + application extensions before the image
    descriptor; decode must be unaffected."""
    img = _paletted(9, 9, 4, seed=13)
    enc = gc.encode_gif(img, 2)
    # splice extensions right after the 13-byte header + 12-byte GCT
    cut = 13 + 3 * 4
    comment = b"\x21\xfe\x05hello\x00"
    app = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    spliced = enc[:cut] + comment + app + enc[cut:]
    assert np.array_equal(gc.decode_gif(spliced), img)


def test_transparency_substitutes_background():
    """A graphic-control extension marking palette index 0 transparent
    makes those pixels take the background color."""
    pal = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]])
    enc = gc.encode_gif(pal[idx], 1)
    cut = 13 + 3 * 2
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # transparent flag, index 0
    out = gc.decode_gif(enc[:cut] + gce + enc[cut:])
    # background index is 0 -> transparent pixels resolve to palette[0]
    assert np.array_equal(out, pal[idx])


def test_corrupt_inputs_raise():
    with pytest.raises(ValueError):
        gc.decode_gif(b"NOTGIF")
    img = _paletted(9, 9, 4)
    enc = gc.encode_gif(img, 2)
    with pytest.raises((ValueError, IndexError)):
        gc.decode_gif(enc[: len(enc) // 2])
    with pytest.raises(ValueError):
        gc.encode_gif(_paletted(8, 8, 200), palette_bits=3)  # palette overflow
    with pytest.raises(ValueError):
        gc.encode_gif(np.zeros((4, 4, 3)), 8)  # not uint8


def test_deferred_clear_full_dictionary_decodes():
    """Many real encoders never emit a clear code once the dictionary is
    full (the 'deferred clear' convention) — the decoder must keep
    decoding against the frozen 4096-entry table."""

    def lzw_encode_deferred(indexes, mcs):
        clear = 1 << mcs
        eoi = clear + 1
        out = bytearray()
        acc = nbits = 0

        def emit(code, width):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        width = mcs + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = eoi + 1
        emit(clear, width)
        cur = b""
        for px in indexes.tobytes():
            cand = cur + bytes([px])
            if cand in table:
                cur = cand
                continue
            emit(table[cur], width)
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            cur = bytes([px])  # dict full: freeze, never clear
        if cur:
            emit(table[cur], width)
        emit(eoi, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    idx = np.random.default_rng(21).integers(0, 256, 30000).astype(np.uint8)
    got = gc._lzw_decode(lzw_encode_deferred(idx, 8), 8, len(idx))
    assert np.array_equal(got, idx)
