"""Pure-stdlib GIF codec for the multimodal pipeline.

Completes the crawled-image format trio (PNG, JPEG, GIF) from the
published GIF89a specification with nothing beyond byte slicing and
numpy: header + logical screen descriptor, global/local color tables,
extension-block skipping, and a REAL LZW decompressor (variable code
width, dictionary growth to 12 bits, CLEAR/END codes, sub-block
reassembly). The matching encoder ships a real LZW compressor
(string-table, dictionary resets at 4096) so round-trip tests exercise
growth AND reset paths; GIF palettes are lossless, so fixture grids
are decode-exact by construction.

Scope (checked, raised on): non-interlaced images; the FIRST image
frame of animated files is decoded and the total frame count is
reported (frame sampling lives in the AVI path — GIF animation is a
preview format, not a video container). Palette decodes to grayscale
via the exact integer mean ``(r + g + b) // 3``, the PNG convention.
"""

from __future__ import annotations

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _lzw_compress(indices: "list[int]", min_code_size: int) -> bytes:
    """Real GIF-LZW: string table seeded with single indices, codes
    grow 9→12 bits, CLEAR emitted when the table fills."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: "list[tuple[int, int]]" = []

    def reset():
        return (
            {(i,): i for i in range(clear)},
            end + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    out_bits.append((clear, width))
    prefix: "tuple[int, ...]" = ()
    for idx in indices:
        cand = prefix + (idx,)
        if cand in table:
            prefix = cand
            continue
        out_bits.append((table[prefix], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= (1 << 12):
            out_bits.append((clear, width))
            table, next_code, width = reset()
        prefix = (idx,)
    if prefix:
        out_bits.append((table[prefix], width))
    out_bits.append((end, width))

    buf = bytearray()
    acc = 0
    nbits = 0
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def _lzw_decompress(data: bytes, min_code_size: int) -> "list[int]":
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    table: "list[tuple[int, ...]]" = []

    def reset():
        nonlocal table
        table = [(i,) for i in range(clear)] + [(), ()]

    reset()
    width = min_code_size + 1
    out: "list[int]" = []
    prev: "tuple[int, ...] | None" = None
    while True:
        code = read(width)
        if code == clear:
            reset()
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # the KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code beyond table")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Reassemble a GIF sub-block chain → (payload, pos after the 0
    terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF sub-block chain truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        chunk = data[pos : pos + n]
        if len(chunk) != n:
            raise ValueError("GIF sub-block truncated")
        out += chunk
        pos += n


def gif_encode_gray(img: np.ndarray) -> bytes:
    """Encode an ``(h, w)`` uint8 grayscale array as a real GIF89a:
    256-entry gray global palette (entry i = (i, i, i) — decode is the
    identity), one non-interlaced image block, real LZW data."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"expected (h, w) grayscale; got {img.shape}")
    h, w = img.shape
    if h < 1 or w < 1:
        raise ValueError(f"image must be non-empty; got {h}x{w}")
    palette = bytes(v for i in range(256) for v in (i, i, i))
    lsd = (
        w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0xF7, 0, 0])  # global table, 8-bit, 256 entries
    )
    lzw = _lzw_compress(list(img.reshape(-1)), 8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    image = (
        b"\x2c" + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + b"\x00"  # no local table, not interlaced
        + bytes([8]) + bytes(blocks) + b"\x00"
    )
    return b"GIF89a" + lsd + palette + image + b"\x3b"


def gif_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a GIF to ``(width, height, (h, w) uint8 grayscale)`` —
    first image frame; palette → gray by exact integer RGB mean."""
    w, h, n_frames, gray = gif_decode_info(data)
    return w, h, gray


def gif_decode_info(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """As :func:`gif_decode` plus the total image-frame count (later
    frames are walked for framing validity but not decoded)."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("GIF header truncated")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    flags = data[10]
    pos = 13
    global_palette = None
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        global_palette = np.frombuffer(
            data[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(-1, 3)
        if global_palette.shape[0] != n:
            raise ValueError("GIF global color table truncated")
        pos += 3 * n
    first = None
    n_frames = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _sub_blocks(data, pos)
        elif b == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("GIF image descriptor truncated")
            iw = int.from_bytes(data[pos + 4 : pos + 6], "little")
            ih = int.from_bytes(data[pos + 6 : pos + 8], "little")
            iflags = data[pos + 8]
            pos += 9
            palette = global_palette
            if iflags & 0x80:
                n = 2 ** ((iflags & 0x07) + 1)
                palette = np.frombuffer(
                    data[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                pos += 3 * n
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if pos >= len(data):
                raise ValueError("GIF LZW header truncated")
            min_code = data[pos]
            pos += 1
            lzw, pos = _sub_blocks(data, pos)
            n_frames += 1
            if first is None:
                if palette is None:
                    raise ValueError("GIF image has no color table")
                idx = _lzw_decompress(lzw, min_code)
                if len(idx) < iw * ih:
                    raise ValueError(
                        f"GIF pixel data short: {len(idx)} < {iw * ih}"
                    )
                arr = np.asarray(idx[: iw * ih], dtype=np.int64)
                if arr.max(initial=0) >= palette.shape[0]:
                    raise ValueError("GIF index beyond palette")
                rgb = palette[arr].astype(np.int64)
                gray = (rgb.sum(axis=1) // 3).astype(np.uint8)
                first = (iw, ih, gray.reshape(ih, iw))
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if first is None:
        raise ValueError("GIF contains no image frame")
    iw, ih, gray = first
    return iw, ih, n_frames, gray
