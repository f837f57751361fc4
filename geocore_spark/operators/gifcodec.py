"""GIF (87a/89a) codec in pure Python/numpy — no imaging library.

GIF's only algorithmic dependency is LZW with variable code widths
(LSB-first bit packing, clear/EOI codes, 12-bit dictionary cap), fully
specified in the public GIF89a spec — implementable directly, like the
other real codecs in this family (BMP/PNG/JPEG/WAV/AVI). The decoder
covers the still-image core: global and local color tables, interlaced
row order, 89a extension blocks (graphic control / comment / application
/ plain text, all skipped via the spec's sub-block framing), and returns
the FIRST image frame (animation compositing is presentation logic, not
decoding; callers sampling frames use the video path). The encoder
writes a GIF89a with a power-of-two global color table and real LZW
compression — the fixture writer pinning the decoder round-trip.

Transparency: the first frame is returned as straight palette RGB; a
graphic-control transparent index is honored by substituting the
background color (the spec's disposal-to-background for a single frame).
"""

from __future__ import annotations

import numpy as np

_GIF87 = b"GIF87a"
_GIF89 = b"GIF89a"

# interlace pass structure (spec appendix E): (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW: LSB-first variable-width codes -> palette indexes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary as (prefix_code, last_byte); roots are their own byte
    prefix = np.empty(4096, dtype=np.int32)
    suffix = np.empty(4096, dtype=np.uint8)
    for i in range(clear):
        prefix[i] = -1
        suffix[i] = i
    next_code = eoi + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    stack = bytearray()
    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("corrupt GIF: first code not a root")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            cur = code
        elif code == next_code and next_code < 4096:
            # KwKwK case: entry being defined = prev string + its first byte
            cur = prev
            stack.append(0)  # placeholder; real first byte appended below
        else:
            raise ValueError("corrupt GIF LZW code")
        # expand cur into stack (reversed)
        c = cur
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c]
        first = stack[-1]
        if code == next_code and next_code < 4096:
            stack[0] = first  # resolve the KwKwK placeholder
        # emit reversed
        ln = len(stack)
        if n_out + ln > n_pixels:
            ln = n_pixels - n_out
        for i in range(ln):
            out[n_out + i] = stack[-1 - i]
        n_out += ln
        stack.clear()
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out


def _lzw_encode(indexes: np.ndarray, min_code_size: int) -> bytes:
    """Inverse of :func:`_lzw_decode` — real LZW with dictionary resets."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
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
        else:
            emit(clear, width)
            width = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
        cur = bytes([px])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a -> HxWx3 RGB uint8."""
    if len(payload) < 13 or payload[:6] not in (_GIF87, _GIF89):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(
            n, 3
        )
        pos += 3 * n
    transparent = -1
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                flags = payload[pos + 1]
                if flags & 0x01:
                    transparent = payload[pos + 4]
            while True:
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
        # image descriptor
        ix = int.from_bytes(payload[pos + 1 : pos + 3], "little")
        iy = int.from_bytes(payload[pos + 3 : pos + 5], "little")
        iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        table = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image has no color table")
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        while True:
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            lzw += payload[pos : pos + sz]
            pos += sz
        idx = _lzw_decode(bytes(lzw), min_code_size, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: reorder rows into the 4 passes
            ordered = np.empty_like(idx)
            src = 0
            for first, step in _INTERLACE:
                rows = range(first, ih, step)
                for r in rows:
                    ordered[r] = idx[src]
                    src += 1
            idx = ordered
        if int(idx.max()) >= len(table):
            raise ValueError("GIF palette index out of range")
        # compose the first frame on a screen-sized background
        bg = bg_index if (gct is not None and bg_index < len(gct)) else 0
        screen = np.full((sh, sw), bg, dtype=np.uint8)
        yl, xl = min(iy + ih, sh), min(ix + iw, sw)
        screen[iy:yl, ix:xl] = idx[: yl - iy, : xl - ix]
        rgb = table[np.minimum(screen, len(table) - 1)]
        if 0 <= transparent < len(table):
            mask = screen == transparent
            rgb = rgb.copy()
            rgb[mask] = table[bg] if bg < len(table) else 0
        return np.ascontiguousarray(rgb)
    raise ValueError("GIF contains no image data")


def encode_gif(
    img: np.ndarray, palette_bits: int = 8, interlace: bool = False
) -> bytes:
    """HxWx3 uint8 -> single-frame GIF89a. Colors are quantized to the
    first ``2**palette_bits`` distinct colors encountered (raster order);
    images with more distinct colors raise — this is a fixture writer for
    decoder pins, not a dithering quantizer."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected HxWx3 uint8")
    if not 1 <= palette_bits <= 8:
        raise ValueError("palette_bits must be in 1..8")
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    n_colors = 2 ** palette_bits
    if len(colors) > n_colors:
        raise ValueError(
            f"{len(colors)} distinct colors > palette capacity {n_colors}"
        )
    table = np.zeros((n_colors, 3), dtype=np.uint8)
    table[: len(colors)] = colors
    indexes = idx.astype(np.uint8).reshape(h, w)
    if interlace:
        passes = []
        for first, step in _INTERLACE:
            passes.append(indexes[first::step])
        stream = np.concatenate(passes, axis=0)
    else:
        stream = indexes
    min_code_size = max(palette_bits, 2)
    lzw = _lzw_encode(stream.reshape(-1), min_code_size)
    out = bytearray(_GIF89)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (palette_bits - 1), 0, 0])  # GCT flag+size, bg, aspect
    out += table.tobytes()
    out += bytes([0x2C]) + b"\x00\x00\x00\x00"  # descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code_size])
    for off in range(0, len(lzw), 255):
        blk = lzw[off : off + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)
