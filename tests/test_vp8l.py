"""VP8L (lossless WebP) codec — operators/vp8lcodec.

Validation strategy, mirroring the r3 codec discipline:

1. INDEPENDENT real streams: the WebP ALPH chunk of CPython's own
   test fixture (`python.webp`, shipped in every pyenv tree on this
   box) is a libwebp-produced VP8L bitstream (header byte C=1). It
   exercises the COLOR_INDEXING transform, delta-coded palettes and
   40 two-dimensional-distance LZ77 copies; decoding it to the
   recognizable 16x16 Python-logo silhouette (ASCII-rendered below)
   proves prefix codes, the 120-entry distance map's ordering and the
   palette inverse against an independent encoder. Digest pinned;
   identical across all pyenv copies.
2. Round-trip: our minimal encoder (literal-only, real canonical
   Huffman + code-length-code preamble) -> decoder equals input.
3. Per-transform synthetic streams: each transform's FORWARD
   direction is computed in the test from the spec and a stream is
   hand-assembled with the module's bit-writer; decode must return
   the original — covers SUBTRACT_GREEN, COLOR, PREDICTOR (all 14
   modes), palette bundling (2/4/16 colors), color cache, and both
   LZ77 distance encodings.
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pytest

from geocore_spark.operators import vp8lcodec as v

WEBP_FIXTURES = sorted(
    glob.glob(
        "/root/.pyenv/versions/*/lib/python3*/test/**/python.webp",
        recursive=True,
    )
)


# ------------------------------------------------------------- round-trip


def test_roundtrip_shapes_and_contents():
    rng = np.random.default_rng(11)
    for shape in [(1, 1, 4), (1, 7, 4), (9, 1, 3), (5, 5, 4), (13, 17, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = v.decode_webp(v.encode_vp8l(img))
        want = (
            img
            if shape[2] == 4
            else np.dstack([img, np.full(shape[:2], 255, np.uint8)])
        )
        assert np.array_equal(dec, want), shape
    flat = np.full((6, 6, 4), 42, np.uint8)
    assert np.array_equal(v.decode_webp(v.encode_vp8l(flat)), flat)
    # two-value image: exercises the 2-symbol simple-code writer
    two = np.where(
        rng.random((8, 8, 1)) < 0.5, 10, 200
    ).astype(np.uint8).repeat(4, axis=2)
    assert np.array_equal(v.decode_webp(v.encode_vp8l(two)), two)


def test_encoder_validation_errors():
    with pytest.raises(ValueError, match="HxWx3 or HxWx4"):
        v.encode_vp8l(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="bad signature"):
        v.decode_vp8l(b"\x00\x01")
    with pytest.raises(ValueError, match="not a WebP"):
        v.decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    # truncated stream raises (the multimodal fake path catches this)
    good = v.encode_vp8l(np.full((8, 8, 3), 7, np.uint8))
    with pytest.raises(Exception):
        v.decode_webp(good[: len(good) - 3] + b"")


# ----------------------------------------------- real libwebp ALPH stream


@pytest.mark.skipif(not WEBP_FIXTURES, reason="no python.webp on this box")
def test_real_alpha_stream_decodes_to_python_logo():
    b = open(WEBP_FIXTURES[0], "rb").read()
    alpha = v.decode_webp_alpha(b)
    assert alpha.shape == (16, 16)
    # bimodal logo mask: opaque body + transparent background dominate
    assert (alpha == 255).sum() > 90 and (alpha == 0).sum() > 30
    assert (
        hashlib.sha256(alpha.tobytes()).hexdigest()
        == "00d64fd72159f0e240eac94eb2a256366dad5e267b45a1920aa72771a8e6ff8c"
    )
    # the silhouette rows render the two interlocked Python snakes —
    # orientation + shape, not just a digest
    rows = ["".join(".#"[int(x > 127)] for x in row) for row in alpha]
    assert rows[4] == "###########.###."
    assert rows[8] == "####.##########."
    assert rows[15] == "................"


@pytest.mark.skipif(
    len(WEBP_FIXTURES) < 2, reason="single python.webp copy"
)
def test_real_alpha_stream_identical_across_copies():
    digs = set()
    for p in WEBP_FIXTURES:
        digs.add(
            hashlib.sha256(
                v.decode_webp_alpha(open(p, "rb").read()).tobytes()
            ).hexdigest()
        )
    assert len(digs) == 1


@pytest.mark.skipif(not WEBP_FIXTURES, reason="no python.webp on this box")
def test_lossy_vp8_raises_not_implemented():
    b = open(WEBP_FIXTURES[0], "rb").read()  # VP8X + ALPH + lossy VP8
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        v.decode_webp(b)


# ---------------------------------------- synthetic streams per transform


def _literal_stream(bw, argb_flat, sub_image=False):
    """Append a no-cache/no-meta entropy-coded image of the given ARGB
    values as pure literals with per-channel canonical codes.
    ``sub_image=True`` omits the meta-prefix bit (spec: transform data
    and entropy images never carry meta prefix codes)."""
    bw.write(0, 1)  # no color cache
    if not sub_image:
        bw.write(0, 1)  # no meta prefix
    chans = {
        "g": [(p >> 8) & 0xFF for p in argb_flat],
        "r": [(p >> 16) & 0xFF for p in argb_flat],
        "b": [p & 0xFF for p in argb_flat],
        "a": [(p >> 24) & 0xFF for p in argb_flat],
    }
    lengths, codes = {}, {}
    for k, vals in chans.items():
        size = 256 + 24 if k == "g" else 256
        freqs = [0] * size
        for val in vals:
            freqs[val] += 1
        lengths[k] = v._huffman_lengths(freqs)
        codes[k] = v._canonical_codes(lengths[k])
    for k in ("g", "r", "b", "a"):
        v._write_prefix_code_capped(bw, lengths[k])
    v._write_prefix_code(bw, [1] + [0] * 39)  # distance: unused single
    for i in range(len(argb_flat)):
        for k in ("g", "r", "b", "a"):
            if len(codes[k]) > 1:
                code, ln = codes[k][chans[k][i]]
                bw.write_code(code, ln)


def _decode_stream(bw, w, h):
    br = v._BitReader(bw.bytes())
    return v._decode_main_image(br, w, h)


def _rgba_of(argb):
    return v._argb_to_rgba(argb)


def test_subtract_green_transform_stream():
    rng = np.random.default_rng(3)
    orig = rng.integers(0, 256, size=(6, 7, 4), dtype=np.uint8)
    argb = (
        orig[..., 3].astype(np.uint32) << 24
        | orig[..., 0].astype(np.uint32) << 16
        | orig[..., 1].astype(np.uint32) << 8
        | orig[..., 2].astype(np.uint32)
    )
    # forward subtract-green (spec): r -= g, b -= g (mod 256)
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) - g) & 0xFF
    b = ((argb & 0xFF) - g) & 0xFF
    fwd = (argb & np.uint32(0xFF00FF00)) | (r << 16) | b
    bw = v._BitWriter()
    bw.write(1, 1)  # transform present
    bw.write(v._SUB_GREEN, 2)
    bw.write(0, 1)  # no more transforms
    _literal_stream(bw, [int(p) for p in fwd.reshape(-1)])
    got = _decode_stream(bw, 7, 6)
    assert np.array_equal(_rgba_of(got), orig)


def test_color_transform_stream():
    rng = np.random.default_rng(4)
    orig = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    argb = (
        orig[..., 3].astype(np.uint32) << 24
        | orig[..., 0].astype(np.uint32) << 16
        | orig[..., 1].astype(np.uint32) << 8
        | orig[..., 2].astype(np.uint32)
    )
    # one 8x8 block (block_bits=3): cte green_to_red=0x40,
    # green_to_blue=0x20, red_to_blue=0x10 (all positive int8)
    g2r, g2b, r2b = 0x40, 0x20, 0x10

    def delta(t, c):
        ts = t - 256 if t >= 128 else t
        cs = c - 256 if c >= 128 else c
        return (ts * cs) >> 5

    g = (argb >> 8) & 0xFF
    r0 = (argb >> 16) & 0xFF
    b0 = argb & 0xFF
    # forward: r -= delta(g2r, g); b -= delta(g2b, g) + delta(r2b, r_final)
    fr = np.vectorize(lambda rr, gg: (rr - delta(g2r, gg)) & 0xFF)(r0, g)
    fb = np.vectorize(
        lambda bb, gg, rr: (bb - delta(g2b, gg) - delta(r2b, rr)) & 0xFF
    )(b0, g, r0)
    fwd = (argb & np.uint32(0xFF00FF00)) | (
        fr.astype(np.uint32) << 16
    ) | fb.astype(np.uint32)
    cte_pixel = (0xFF << 24) | (r2b << 16) | (g2b << 8) | g2r
    bw = v._BitWriter()
    bw.write(1, 1)
    bw.write(v._COLOR, 2)
    bw.write(1, 3)  # size_bits - 2 = 1 -> block_bits 3 (8x8 >= 4x4)
    _literal_stream(bw, [cte_pixel], sub_image=True)  # 1x1 cte
    bw.write(0, 1)
    _literal_stream(bw, [int(p) for p in fwd.reshape(-1)])
    got = _decode_stream(bw, 4, 4)
    assert np.array_equal(_rgba_of(got), orig)


@pytest.mark.parametrize("mode", list(range(14)))
def test_predictor_modes_stream(mode):
    rng = np.random.default_rng(100 + mode)
    h, w = 5, 6
    orig = rng.integers(0, 256, size=(h, w, 4), dtype=np.uint8)
    argb = (
        orig[..., 3].astype(np.uint32) << 24
        | orig[..., 0].astype(np.uint32) << 16
        | orig[..., 1].astype(np.uint32) << 8
        | orig[..., 2].astype(np.uint32)
    )

    # forward predict with INDEPENDENT spec math (r4 review: reusing
    # the decoder's _avg2/_select/_clamp helpers here would make the
    # test circular — a shared formula bug would cancel out): every
    # predictor is reimplemented channel-wise on 4-tuples from the
    # spec's pseudo-code, C semantics spelled explicitly
    def chans(p):
        return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)

    def pack(t):
        return ((t[0] & 0xFF) << 24 | (t[1] & 0xFF) << 16
                | (t[2] & 0xFF) << 8 | (t[3] & 0xFF))

    def avg2(p, q):
        return pack(tuple((a + b) >> 1 for a, b in zip(chans(p), chans(q))))

    def select(t, l, tl):  # noqa: E741
        ct, cl, ctl = chans(t), chans(l), chans(tl)
        p = [a + b - c for a, b, c in zip(cl, ct, ctl)]
        p_l = sum(abs(a - b) for a, b in zip(p, cl))
        p_t = sum(abs(a - b) for a, b in zip(p, ct))
        return l if p_l < p_t else t

    def casf(l, t, tl):  # noqa: E741  ClampAddSubtractFull
        return pack(tuple(
            min(255, max(0, a + b - c))
            for a, b, c in zip(chans(l), chans(t), chans(tl))
        ))

    def cash(ave, tl):  # ClampAddSubtractHalf: C division truncates
        out = []
        for a, c in zip(chans(ave), chans(tl)):
            d = a - c
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(min(255, max(0, a + half)))
        return pack(tuple(out))

    res = np.zeros_like(argb)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[0, x - 1])
            elif x == 0:
                pred = int(argb[y - 1, 0])
            else:
                L = int(argb[y, x - 1])
                T = int(argb[y - 1, x])
                TL = int(argb[y - 1, x - 1])
                TR = int(argb[y - 1, x + 1]) if x + 1 < w else int(argb[y, 0])
                pred = {
                    0: lambda: 0xFF000000,
                    1: lambda: L,
                    2: lambda: T,
                    3: lambda: TR,
                    4: lambda: TL,
                    5: lambda: avg2(avg2(L, TR), T),
                    6: lambda: avg2(L, TL),
                    7: lambda: avg2(L, T),
                    8: lambda: avg2(TL, T),
                    9: lambda: avg2(T, TR),
                    10: lambda: avg2(avg2(L, TL), avg2(T, TR)),
                    11: lambda: select(T, L, TL),
                    12: lambda: casf(L, T, TL),
                    13: lambda: cash(avg2(L, T), TL),
                }[mode]()
            pc, rc = chans(int(argb[y, x])), chans(pred)
            res[y, x] = np.uint32(pack(tuple(a - b for a, b in zip(pc, rc))))
    mode_pixel = (0xFF << 24) | (mode << 8)
    bw = v._BitWriter()
    bw.write(1, 1)
    bw.write(v._PRED, 2)
    bw.write(1, 3)  # block_bits 3: one 8x8 block covers 5x6
    _literal_stream(bw, [mode_pixel], sub_image=True)
    bw.write(0, 1)
    _literal_stream(bw, [int(p) for p in res.reshape(-1)])
    got = _decode_stream(bw, w, h)
    assert np.array_equal(_rgba_of(got), orig), f"mode {mode}"


@pytest.mark.parametrize("ncolors", [2, 4, 16, 200])
def test_palette_transform_stream(ncolors):
    rng = np.random.default_rng(40 + ncolors)
    h, w = 5, 11  # 11 not divisible by any bundle width: exercises tail
    pal = rng.integers(0, 256, size=(ncolors, 4), dtype=np.uint8)
    pal_argb = [
        (int(p[3]) << 24) | (int(p[0]) << 16) | (int(p[1]) << 8) | int(p[2])
        for p in pal
    ]
    idx = rng.integers(0, ncolors, size=(h, w))
    # forward: palette stream is delta-coded component-wise
    deltas = []
    prev = 0
    for p in pal_argb:
        d = 0
        for shift in (24, 16, 8, 0):
            d |= (((p >> shift) - (prev >> shift)) & 0xFF) << shift
        deltas.append(d)
        prev = p
    if ncolors <= 2:
        xbits, ibits = 3, 1
    elif ncolors <= 4:
        xbits, ibits = 2, 2
    elif ncolors <= 16:
        xbits, ibits = 1, 4
    else:
        xbits, ibits = 0, 8
    if xbits:
        per = 1 << xbits
        pw = (w + per - 1) // per
        packed = np.zeros((h, pw), dtype=np.uint32)
        for y in range(h):
            for x in range(w):
                packed[y, x // per] |= int(idx[y, x]) << ((x % per) * ibits)
        pix = [(0xFF << 24) | (int(g) << 8) for g in packed.reshape(-1)]
    else:
        pix = [(0xFF << 24) | (int(g) << 8) for g in idx.reshape(-1)]
    bw = v._BitWriter()
    bw.write(1, 1)
    bw.write(v._PALETTE, 2)
    bw.write(ncolors - 1, 8)
    _literal_stream(bw, deltas, sub_image=True)
    bw.write(0, 1)
    _literal_stream(bw, pix)
    got = _decode_stream(bw, w, h)
    want = np.array(pal_argb, dtype=np.uint32)[idx]
    assert np.array_equal(got, want), ncolors


def test_lz77_copy_above_row():
    """Minimal exact LZ77 stream: 2 rows, second row copied from the
    first via distance code 1 (straight above). Pins the 2D distance
    map ordering independently of the encoder."""
    w, h = 4, 2
    row = [0xFF102030, 0xFF405060, 0xFF708090, 0xFFA0B0C0]
    # length 4 -> prefix code: length-1=3 -> code 3 (codes 0-3 are
    # lengths 1-4 with no extra bits)
    bw = v._BitWriter()
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta
    greens = sorted({(p >> 8) & 0xFF for p in row})
    g_freq = [0] * (256 + 24)
    for p in row:
        g_freq[(p >> 8) & 0xFF] += 1
    g_freq[256 + 3] = 1  # length prefix 3 == copy length 4
    g_len = v._huffman_lengths(g_freq)
    g_codes = v._canonical_codes(g_len)
    chans = {}
    for k, shift in (("r", 16), ("b", 0), ("a", 24)):
        freqs = [0] * 256
        for p in row:
            freqs[(p >> shift) & 0xFF] += 1
        ln = v._huffman_lengths(freqs)
        chans[k] = (ln, v._canonical_codes(ln), shift)
    v._write_prefix_code_capped(bw, g_len)
    for k in ("r", "b", "a"):
        v._write_prefix_code_capped(bw, chans[k][0])
    # distance alphabet: only code 0 used -> maps to dist_code 1 via
    # _lz77_value(0)=1 -> _DIST_MAP[0]=(0,1) -> the pixel above
    v._write_prefix_code(bw, [1] + [0] * 39)
    for p in row:
        code, ln = g_codes[(p >> 8) & 0xFF]
        bw.write_code(code, ln)
        for k in ("r", "b", "a"):
            _, codes, shift = chans[k]
            if len(codes) > 1:
                c, l = codes[(p >> shift) & 0xFF]  # noqa: E741
                bw.write_code(c, l)
    # the copy: green symbol 256+3, zero extra length bits, distance
    # code from the single-symbol distance tree (zero bits), whose
    # prefix value 0 has no extra bits either
    code, ln = g_codes[256 + 3]
    bw.write_code(code, ln)
    got = v._decode_main_image(v._BitReader(bw.bytes()), w, h)
    want = np.array([row, row], dtype=np.uint32)
    assert np.array_equal(got, want)


def test_color_cache_stream():
    """Literals + a cache hit: the 3rd pixel repeats the 1st via its
    cache index symbol."""
    w, h = 3, 1
    p0, p1 = 0xFF102030, 0xFF405060
    cache_bits = 4
    idx0 = (0x1E35A7BD * p0 & 0xFFFFFFFF) >> (32 - cache_bits)
    g_alpha = 256 + 24 + (1 << cache_bits)
    g_freq = [0] * g_alpha
    g_freq[(p0 >> 8) & 0xFF] += 1
    g_freq[(p1 >> 8) & 0xFF] += 1
    g_freq[256 + 24 + idx0] += 1
    g_len = v._huffman_lengths(g_freq)
    g_codes = v._canonical_codes(g_len)
    chans = {}
    for k, shift in (("r", 16), ("b", 0), ("a", 24)):
        freqs = [0] * 256
        for p in (p0, p1):
            freqs[(p >> shift) & 0xFF] += 1
        ln = v._huffman_lengths(freqs)
        chans[k] = (ln, v._canonical_codes(ln), shift)
    bw = v._BitWriter()
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # cache
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    v._write_prefix_code_capped(bw, g_len)
    for k in ("r", "b", "a"):
        v._write_prefix_code_capped(bw, chans[k][0])
    v._write_prefix_code(bw, [1] + [0] * 39)
    for p in (p0, p1):
        code, ln = g_codes[(p >> 8) & 0xFF]
        bw.write_code(code, ln)
        for k in ("r", "b", "a"):
            _, codes, shift = chans[k]
            if len(codes) > 1:
                c, l = codes[(p >> shift) & 0xFF]  # noqa: E741
                bw.write_code(c, l)
    code, ln = g_codes[256 + 24 + idx0]
    bw.write_code(code, ln)
    got = v._decode_main_image(v._BitReader(bw.bytes()), w, h)
    assert got.reshape(-1).tolist() == [p0, p1, p0]


# --------------------------------------------------- multimodal wiring


def test_multimodal_decodes_vp8l_real_and_fakes_lossy():
    from geocore_spark.operators import multimodal as mm

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    enc = v.encode_vp8l(img)
    got = mm._decode_image_stub(enc, fake=False)
    assert np.array_equal(got, img)
    # corrupt VP8L payload: fake mode must not raise (no-raise guarantee)
    bad = enc[:20]
    fk = mm._decode_image_stub(bad, fake=True)
    assert fk.shape == (32, 32, 3)
    with pytest.raises(Exception):
        mm._decode_image_stub(bad, fake=False)
    if WEBP_FIXTURES:  # lossy VP8 container: stays lib-bound
        lossy = open(WEBP_FIXTURES[0], "rb").read()
        with pytest.raises(NotImplementedError):
            mm._decode_image_stub(lossy, fake=False)
        assert mm._decode_image_stub(lossy, fake=True).shape == (32, 32, 3)


def test_huffman_length_limit_stays_complete():
    """r4 review regression: a Fibonacci-skewed histogram drives heap
    Huffman past 15 bits; the fallback must emit a COMPLETE code
    (Kraft exactly 1) — the old clamp-and-deepen repair produced
    under-subscribed codes strict decoders reject."""
    fib = [1, 1]
    while len(fib) < 25:
        fib.append(fib[-1] + fib[-2])
    freqs = [0] * 256
    for s, f in enumerate(fib):
        freqs[s] = f
    lengths = v._huffman_lengths(freqs)
    assert max(lengths) <= 15
    kraft = sum(1 / (1 << l) for l in lengths if l)
    assert kraft == 1.0, kraft
    # and a real image with that histogram round-trips
    vals = np.repeat(
        np.arange(25, dtype=np.uint8), np.array(fib) % 97 + 1
    )
    side = int(np.ceil(np.sqrt(len(vals))))
    flat = np.zeros(side * side, dtype=np.uint8)
    flat[: len(vals)] = vals
    img = flat.reshape(side, side)[:, :, None].repeat(3, axis=2)
    assert np.array_equal(
        v.decode_webp(v.encode_vp8l(img))[..., :3], img
    )


def test_meta_prefix_two_group_stream():
    """Meta prefix codes (the one path no real fixture exercises): a
    4x2 image with block_bits=2 (4-pixel blocks) gets TWO prefix-code
    groups — block 0 codes only low greens, block 1 only high greens —
    selected per pixel through the entropy image (meta code =
    (red << 8) | green of the meta pixel)."""
    w, h = 8, 1
    left = [0xFF000100 | (g << 8) for g in (10, 11, 12, 13)]
    right = [0xFF000200 | (g << 8) for g in (200, 201, 202, 203)]
    pixels = left + right
    bw = v._BitWriter()
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix present
    bw.write(0, 3)  # size_bits - 2 = 0 -> block_bits 2 -> blocks of 4
    # entropy image: 2x1, meta codes 0 and 1 in (red<<8)|green
    _literal_stream(bw, [0xFF000000, 0xFF000100], sub_image=True)
    # two groups, each trained ONLY on its half
    groups = []
    for half in (left, right):
        lengths, codes = {}, {}
        for k, shift, size in (
            ("g", 8, 256 + 24), ("r", 16, 256), ("b", 0, 256), ("a", 24, 256)
        ):
            freqs = [0] * size
            for p in half:
                freqs[(p >> shift) & 0xFF] += 1
            lengths[k] = v._huffman_lengths(freqs)
            codes[k] = (v._canonical_codes(lengths[k]), shift)
        groups.append(codes)
        for k in ("g", "r", "b", "a"):
            v._write_prefix_code_capped(bw, lengths[k])
        v._write_prefix_code(bw, [1] + [0] * 39)
    for i, p in enumerate(pixels):
        codes = groups[0] if i < 4 else groups[1]
        for k in ("g", "r", "b", "a"):
            cmap, shift = codes[k]
            if len(cmap) > 1:
                c, l = cmap[(p >> shift) & 0xFF]  # noqa: E741
                bw.write_code(c, l)
    got = v._decode_main_image(v._BitReader(bw.bytes()), w, h)
    assert got.reshape(-1).tolist() == pixels


@pytest.mark.parametrize("method", [0, 1, 2, 3])
def test_alpha_filter_roundtrip(method):
    """ALPH per-row filters (container spec): forward-filter a plane in
    the test (horizontal: pred=left, leftmost=above, origin=0;
    vertical: pred=above, top row=left; gradient: clip(L+T-TL) with
    the same border fallbacks), build a full WebP container with a
    VP8L-compressed ALPH chunk + VP8X dims, and decode_webp_alpha must
    invert it exactly."""
    import struct

    rng = np.random.default_rng(60 + method)
    h, w = 6, 9
    plane = rng.integers(0, 256, size=(h, w), dtype=np.uint8)

    def pred(out, y, x):
        if method == 1:  # horizontal
            if x > 0:
                return int(out[y, x - 1])
            return int(out[y - 1, 0]) if y > 0 else 0
        if method == 2:  # vertical
            if y > 0:
                return int(out[y - 1, x])
            return int(out[0, x - 1]) if x > 0 else 0
        if method == 3:  # gradient
            if y == 0:
                return int(out[0, x - 1]) if x > 0 else 0
            if x == 0:
                return int(out[y - 1, 0])
            g = (int(out[y, x - 1]) + int(out[y - 1, x])
                 - int(out[y - 1, x - 1]))
            return min(255, max(0, g))
        return 0

    filtered = np.zeros_like(plane)
    for y in range(h):
        for x in range(w):
            filtered[y, x] = (int(plane[y, x]) - pred(plane, y, x)) & 0xFF

    # VP8L-compress the filtered plane into the green channel
    bw = v._BitWriter()
    bw.write(0, 1)  # no transforms
    _literal_stream(bw, [(0xFF << 24) | (int(g) << 8)
                         for g in filtered.reshape(-1)])
    body = bytes([1 | (method << 2)]) + bw.bytes()  # C=1, F=method
    alph = b"ALPH" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        alph += b"\x00"
    vp8x_body = bytes([0x10, 0, 0, 0]) + struct.pack("<I", w - 1)[:3] \
        + struct.pack("<I", h - 1)[:3]
    vp8x = b"VP8X" + struct.pack("<I", len(vp8x_body)) + vp8x_body
    riff = b"WEBP" + vp8x + alph
    payload = b"RIFF" + struct.pack("<I", len(riff)) + riff
    got = v.decode_webp_alpha(payload)
    assert np.array_equal(got, plane), f"filter {method}"


# --------------------------------------------- fast-path equivalence


def _decode_both(stream_bytes, w, h, monkeypatch):
    """Decode one stream through BOTH loops and assert bit-identity:
    reference per-pixel path (threshold above the image) vs the r5
    vectorized-literal fast path (threshold 0), including the final
    bit position (a fast path that under/over-consumes would corrupt
    whatever the caller parses next)."""
    monkeypatch.setattr(v, "_FAST_MIN_PIXELS", 1 << 60)
    br1 = v._BitReader(stream_bytes)
    ref = v._decode_main_image(br1, w, h)
    monkeypatch.setattr(v, "_FAST_MIN_PIXELS", 0)
    br2 = v._BitReader(stream_bytes)
    fast = v._decode_main_image(br2, w, h)
    assert np.array_equal(ref, fast)
    assert br1.pos == br2.pos
    return ref


def test_fast_path_equals_reference_on_pinned_streams(monkeypatch):
    """The existing pinned fixtures are all below _FAST_MIN_PIXELS, so
    they exercise only the reference loop — force the threshold to 0
    and re-run every stream shape through the fast path: the real
    libwebp ALPH stream (palette transform + 2D LZ77 + color cache),
    the hand-assembled meta-prefix / cache / LZ77 / transform streams,
    and the encoder round-trips."""
    monkeypatch.setattr(v, "_FAST_MIN_PIXELS", 0)
    test_real_alpha_stream_decodes_to_python_logo()
    test_lz77_copy_above_row()
    test_color_cache_stream()
    test_meta_prefix_two_group_stream()
    test_subtract_green_transform_stream()
    test_color_transform_stream()
    for mode in range(14):
        test_predictor_modes_stream(mode)
    test_roundtrip_shapes_and_contents()


def test_fast_path_large_literals_differential(monkeypatch):
    """>=0.25 MP random-literal stream: both loops agree bit-for-bit
    (this is the stream class the throughput claim is measured on)."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (64, 80, 4), dtype=np.uint8).astype(np.uint8)
    data = v.encode_vp8l(img)
    monkeypatch.setattr(v, "_FAST_MIN_PIXELS", 1 << 60)
    ref = v.decode_webp(data)
    monkeypatch.setattr(v, "_FAST_MIN_PIXELS", 0)
    fast = v.decode_webp(data)
    assert np.array_equal(ref, img)
    assert np.array_equal(fast, img)


def test_fast_path_overlapping_lz77_and_cache_differential(monkeypatch):
    """A 64x64 stream whose body is one literal + a dist-1 length-4095
    LZ77 copy (maximally OVERLAPPING — the fast path's scalar fallback
    inside an otherwise vectorized decode) followed by a cache hit
    epilogue, decoded by both loops."""
    w, h = 64, 64
    p0 = 0xFF102030
    cache_bits = 4
    idx0 = (0x1E35A7BD * p0 & 0xFFFFFFFF) >> (32 - cache_bits)
    g_alpha = 256 + 24 + (1 << cache_bits)
    g_freq = [0] * g_alpha
    g_freq[(p0 >> 8) & 0xFF] += 1
    g_freq[256 + 23] += 1          # length prefix 23: max-range lengths
    g_freq[256 + 24 + idx0] += 1   # cache hit for the last pixel
    g_len = v._huffman_lengths(g_freq)
    g_codes = v._canonical_codes(g_len)
    chans = {}
    for k, shift in (("r", 16), ("b", 0), ("a", 24)):
        freqs = [0] * 256
        freqs[(p0 >> shift) & 0xFF] += 1
        ln = v._huffman_lengths(freqs)
        chans[k] = (ln, v._canonical_codes(ln), shift)
    bw = v._BitWriter()
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta
    v._write_prefix_code_capped(bw, g_len)
    for k in ("r", "b", "a"):
        v._write_prefix_code_capped(bw, chans[k][0])
    # distance tree: single symbol 1 (0 bits) -> _lz77_value(1) = 2 ->
    # _DIST_MAP[1] = (1, 0) -> dist 1, the PREVIOUS pixel: a fully
    # overlapping run
    v._write_prefix_code(bw, [0, 1] + [0] * 38)
    # literal p0 (single-symbol channels write no bits)
    code, ln = g_codes[(p0 >> 8) & 0xFF]
    bw.write_code(code, ln)
    # LZ77: length prefix 23 -> nb = 10 extra bits, value =
    # (2 + 1)<<10 + extra + 1; want length 4094 -> extra = 4094-1-3072
    length = 4094
    code, ln = g_codes[256 + 23]
    bw.write_code(code, ln)
    bw.write(length - 1 - (3 << 10), 10)
    # cache-hit epilogue for the final pixel
    code, ln = g_codes[256 + 24 + idx0]
    bw.write_code(code, ln)
    got = _decode_both(bw.bytes(), w, h, monkeypatch)
    assert got.reshape(-1).tolist() == [p0] * (w * h)


def test_fast_path_truncated_stream_raises(monkeypatch):
    """Truncation inside a literal run must raise the same ValueError
    on the fast path (peeks may touch the zero pad, consumes may not
    pass nbits)."""
    monkeypatch.setattr(v, "_FAST_MIN_PIXELS", 0)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8).astype(np.uint8)
    data = v.encode_vp8l(img)
    with pytest.raises(ValueError):
        v.decode_webp(data[: len(data) - 40])


def test_fast_path_randomized_roundtrip_and_truncation(monkeypatch):
    """Property sweep: random images (varied shapes, value ranges, some
    with constant channels -> 0-bit codes) encode, then decode through
    BOTH paths with identical pixels; random truncations of each stream
    raise ValueError on both paths (never an IndexError or silent
    wrong image)."""
    rng = np.random.default_rng(1234)
    shapes = [(65, 64), (80, 52), (17, 250)]  # all >= _FAST_MIN_PIXELS
    for hh, ww in shapes:
        img = rng.integers(0, 256, (hh, ww, 4), dtype=np.uint8).astype(
            np.uint8
        )
        if ww % 2:  # exercise single-symbol channels too
            img[..., 3] = 255
            img[..., 0] = 7
        data = v.encode_vp8l(img)
        monkeypatch.setattr(v, "_FAST_MIN_PIXELS", 1 << 60)
        ref = v.decode_webp(data)
        monkeypatch.setattr(v, "_FAST_MIN_PIXELS", 0)
        fast = v.decode_webp(data)
        assert np.array_equal(ref, fast)
        assert np.array_equal(fast, img)
        for cut in rng.integers(30, len(data) - 1, 5):
            trunc = data[: int(cut)]
            for thresh in (1 << 60, 0):
                monkeypatch.setattr(v, "_FAST_MIN_PIXELS", thresh)
                with pytest.raises(ValueError):
                    v.decode_webp(trunc)
