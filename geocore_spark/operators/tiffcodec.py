"""TIFF 6.0 codec (still-image core) in pure numpy — no imaging library.

Document-scan and scientific corpora carry TIFF; its baseline spec is
public structs plus two simple compressions, both implementable
directly: PackBits (one-byte RLE) and TIFF-flavor LZW (MSB-first
variable-width codes with the spec's "early change" width bump — note
this differs from GIF's LZW, which is LSB-first and late-change; the
two implementations here and in gifcodec are deliberately separate
because the bit orders and width schedules differ).

Scope:

- decoder: little- and big-endian headers, first IFD, 8-bit samples,
  chunky planar config, grayscale (photometric 0/1, incl. white-is-zero
  inversion), RGB(A), palette (ColorMap scaled 16->8 bit), strips
  (multiple, any RowsPerStrip), compressions 1 (none), 5 (LZW, with
  horizontal-predictor 2 support) and 32773 (PackBits). Tiled TIFF,
  16-bit samples and fax (G3/G4) / JPEG-in-TIFF compressions raise
  NotImplementedError.
- encoder: fixture writer emitting the same core (none / LZW+predictor
  / PackBits, gray or RGB(A), configurable RowsPerStrip) so every
  decode path is pinned by round trips against independent forward
  math; decode additionally validated on independently-encoded real
  TIFFs present in this environment.
"""

from __future__ import annotations

import struct

import numpy as np


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i = j + 1
            continue
        # literal: extend until a run of >= 3 starts (2-byte runs are
        # cheaper inside a literal) or 128 bytes
        j = i
        while j + 1 < n and j - i < 127:
            if (
                j + 2 < n
                and data[j + 1] == data[j + 2]
                and (j + 3 >= n or data[j + 3] == data[j + 1])
            ):
                break
            j += 1
        out.append(j - i)
        out += data[i : j + 1]
        i = j + 1
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW: MSB-first codes, 9-bit start, Clear=256,
    EOI=257, EARLY width change (grow when the next entry would be
    2^width - 1, one code earlier than GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    for i in range(256):
        suffix[i] = i
    next_code = 258
    width = 9
    acc = nbits = pos = 0
    prev = -1
    stack = bytearray()
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW strip")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == CLEAR:
            next_code = 258
            width = 9
            prev = -1
            continue
        if code == EOI:
            break
        if prev < 0:
            if code > 255:
                raise ValueError("corrupt TIFF LZW: first code not a root")
            out.append(code)
            prev = code
            continue
        if code < next_code and (code < 256 or code >= 258):
            cur = code
            kwk = False
        elif code == next_code:
            cur = prev
            kwk = True
        else:
            raise ValueError("corrupt TIFF LZW code")
        c = cur
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c]
        first = stack[-1]
        out += stack[::-1]
        if kwk:
            out.append(first)
        stack.clear()
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            next_code += 1
            # EARLY change: the encoder bumps width when it EMITS the
            # code that makes next_code == 2^width - 1 reachable
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = code
    if len(out) < expected:
        raise ValueError("TIFF LZW strip shorter than expected")
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1

    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        if next_code < 4094:
            table[cand] = next_code
            next_code += 1
            # early change: grow when the JUST-ADDED entry code is
            # 2^w - 1 (one code earlier than GIF/compress); the decoder
            # mirror fires one reception later at next_code == 2^w - 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(CLEAR, width)
            width = 9
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _read_ifd(d: bytes, fmt: str, off: int):
    n = struct.unpack_from(fmt + "H", d, off)[0]
    tags = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(fmt + "HHI", d, off + 2 + 12 * i)
        val_off = off + 10 + 12 * i
        sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
        esz = sizes.get(typ)
        if esz is None:
            continue  # unknown type: skip tag
        total = esz * cnt
        src = val_off if total <= 4 else struct.unpack_from(fmt + "I", d, val_off)[0]
        if typ == 3:
            vals = list(struct.unpack_from(fmt + f"{cnt}H", d, src))
        elif typ == 4:
            vals = list(struct.unpack_from(fmt + f"{cnt}I", d, src))
        elif typ == 1:
            vals = list(d[src : src + cnt])
        elif typ == 2:
            vals = [d[src : src + cnt]]
        else:  # RATIONAL: pairs, unused here
            vals = []
        tags[tag] = vals
    return tags


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF -> HxWxC uint8 (C=1 gray, 3 RGB/palette, 4 RGBA)."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    fmt = "<" if payload[:2] == b"II" else ">"
    if struct.unpack_from(fmt + "H", payload, 2)[0] != 42:
        raise ValueError("bad TIFF magic")
    ifd_off = struct.unpack_from(fmt + "I", payload, 4)[0]
    try:
        t = _read_ifd(payload, fmt, ifd_off)
    except struct.error:
        raise ValueError("truncated TIFF IFD") from None
    try:
        w = t[256][0]
        h = t[257][0]
        strip_offs = t[273]
        strip_counts = t[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}")
    spp = t.get(277, [1])[0]
    bits = t.get(258, [8] * spp)
    comp = t.get(259, [1])[0]
    photo = t.get(262, [1])[0]
    rps = t.get(278, [h])[0] or h
    planar = t.get(284, [1])[0]
    predictor = t.get(317, [1])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} unsupported")
    if planar != 1:
        raise NotImplementedError("planar TIFF unsupported")
    if 322 in t or 323 in t:
        raise NotImplementedError("tiled TIFF unsupported")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp} unsupported")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photo} unsupported")
    if w < 1 or h < 1 or spp < 1:
        raise ValueError("degenerate TIFF dimensions")
    row_bytes = w * spp
    rows = []
    for si, (soff, scnt) in enumerate(zip(strip_offs, strip_counts)):
        n_rows = min(rps, h - si * rps)
        if n_rows <= 0:
            break
        raw = payload[soff : soff + scnt]
        if len(raw) < scnt:
            raise ValueError("truncated TIFF strip")
        expected = n_rows * row_bytes
        if comp == 1:
            if len(raw) < expected:
                raise ValueError("short uncompressed TIFF strip")
            flat = raw[:expected]
        elif comp == 5:
            flat = _tiff_lzw_decode(raw, expected)
        else:
            flat = _packbits_decode(raw, expected)
        arr = np.frombuffer(flat, dtype=np.uint8).reshape(n_rows, w, spp)
        if predictor == 2:  # horizontal differencing: prefix-sum per row
            arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
        rows.append(arr)
    img = np.concatenate(rows, axis=0)
    if img.shape[0] != h:
        raise ValueError("TIFF strips do not cover the image height")
    if photo == 0:  # white-is-zero gray
        img = 255 - img
    if photo == 3:  # palette: ColorMap is 3 planes of 16-bit values
        cmap = t.get(320)
        if not cmap or len(cmap) != 3 * (1 << 8):
            raise ValueError("palette TIFF missing/invalid ColorMap")
        cm = (np.array(cmap, dtype=np.uint32).reshape(3, -1).T >> 8).astype(
            np.uint8
        )
        img = cm[img[..., 0]]
    return np.ascontiguousarray(img)


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    predictor: bool = False,
) -> bytes:
    """HxW / HxWx{1,3,4} uint8 -> little-endian TIFF 6.0 (fixture
    writer). ``compression``: "none" / "lzw" / "packbits"; ``predictor``
    applies horizontal differencing (LZW only, tag 317=2)."""
    if img.ndim == 2:
        img = img[..., None]
    if img.ndim != 3 or img.dtype != np.uint8 or img.shape[2] not in (1, 3, 4):
        raise ValueError("expected HxWx{1,3,4} uint8")
    if compression not in ("none", "lzw", "packbits"):
        raise ValueError(f"unknown compression {compression!r}")
    if predictor and compression != "lzw":
        raise ValueError("predictor is defined here for lzw only")
    h, w, spp = img.shape
    rps = rows_per_strip or h
    photo = 1 if spp == 1 else 2
    strips = []
    for y0 in range(0, h, rps):
        part = img[y0 : y0 + rps]
        if predictor:
            part = np.concatenate(
                [part[:, :1], np.diff(part.astype(np.int16), axis=1) & 0xFF],
                axis=1,
            ).astype(np.uint8)
        raw = part.tobytes()
        if compression == "lzw":
            strips.append(_tiff_lzw_encode(raw))
        elif compression == "packbits":
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    n_strips = len(strips)
    # layout: header(8) | IFD | [bits array if spp>2] | strip tables | data
    entries = []  # (tag, type, count, value_or_offset_placeholder)
    header_end = 8
    n_tags = 10 + (1 if predictor else 0)
    ifd_size = 2 + 12 * n_tags + 4
    cursor = header_end + ifd_size
    extra = bytearray()

    def alloc(data: bytes) -> int:
        nonlocal cursor
        off = cursor
        extra.extend(data)
        cursor += len(data)
        return off

    if spp > 2:
        bits_off = alloc(struct.pack(f"<{spp}H", *([8] * spp)))
        bits_val, bits_cnt = bits_off, spp
    else:
        bits_val, bits_cnt = 8, 1
    if n_strips > 1:
        offs_pos = alloc(b"\x00" * 4 * n_strips)
        cnts_pos = alloc(struct.pack(f"<{n_strips}I", *map(len, strips)))
    data_offs = []
    for s in strips:
        data_offs.append(alloc(s))
    if n_strips > 1:
        struct.pack_into(f"<{n_strips}I", extra, offs_pos - header_end - ifd_size, *data_offs)
        soff_val, scnt_val = offs_pos, cnts_pos
    else:
        soff_val, scnt_val = data_offs[0], len(strips[0])
    entries = [
        (256, 3, 1, w),
        (257, 3, 1, h),
        (258, 3, bits_cnt, bits_val),
        (259, 3, 1, comp_tag),
        (262, 3, 1, photo),
        (273, 4, n_strips, soff_val),
        (277, 3, 1, spp),
        (278, 3, 1, rps),
        (279, 4, n_strips, scnt_val),
        (284, 3, 1, 1),
    ]
    if predictor:
        entries.append((317, 3, 1, 2))
    entries.sort()
    out = bytearray(b"II*\x00" + struct.pack("<I", header_end))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        out += struct.pack("<HHI", tag, typ, cnt)
        if typ == 3 and cnt == 1:
            out += struct.pack("<HH", val, 0)
        else:
            out += struct.pack("<I", val)
    out += b"\x00\x00\x00\x00"  # no next IFD
    out += extra
    return bytes(out)
