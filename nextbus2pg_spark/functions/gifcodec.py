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

Round-10 additions: INTERLACED images decode (the four-pass row
ordering of Appendix E); ANIMATED files decode frame-by-frame through
:func:`gif_decode_frames` with real compositing — per-frame placement
rectangles over the logical screen, Graphic Control Extension
transparency, and disposal methods 0/1 (leave) and 2 (restore to
background). Disposal 3 (restore to previous) raises — it is rare and
needs a frame-history stack. ``gif_decode`` keeps returning the FIRST
composited frame. Palette decodes to grayscale via the exact integer
mean ``(r + g + b) // 3``, the PNG convention.
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


def _image_block(
    img: np.ndarray,
    left: int = 0,
    top: int = 0,
    interlace: bool = False,
) -> bytes:
    """One image descriptor + LZW data for an (h, w) uint8 gray array
    rendered with the 256-gray global palette."""
    h, w = img.shape
    rows = img[_row_order(h, True)] if interlace else img
    lzw = _lzw_compress(list(rows.reshape(-1)), 8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"\x2c"
        + left.to_bytes(2, "little") + top.to_bytes(2, "little")
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0x00])
        + bytes([8]) + bytes(blocks) + b"\x00"
    )


def _header(w: int, h: int, background: int = 0) -> bytes:
    palette = bytes(v for i in range(256) for v in (i, i, i))
    lsd = (
        w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0xF7, background, 0])  # global table, 8-bit, 256
    )
    return b"GIF89a" + lsd + palette


def gif_encode_gray(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode an ``(h, w)`` uint8 grayscale array as a real GIF89a:
    256-entry gray global palette (entry i = (i, i, i) — decode is the
    identity), one image block (four-pass interlaced row order when
    ``interlace``), real LZW data."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"expected (h, w) grayscale; got {img.shape}")
    h, w = img.shape
    if h < 1 or w < 1:
        raise ValueError(f"image must be non-empty; got {h}x{w}")
    return (
        _header(w, h) + _image_block(img, interlace=interlace) + b"\x3b"
    )


def gif_encode_gray_frames(
    screen: "tuple[int, int]",
    frames: "list[dict]",
    background: int = 0,
) -> bytes:
    """Encode a real ANIMATED GIF89a over a ``(w, h)`` logical screen.

    Each frame dict: ``img`` ((h, w) uint8, required), ``left``/``top``
    placement (default 0), ``transparent`` palette index or None,
    ``disposal`` (0/1 leave, 2 restore-to-background), ``interlace``.
    A Graphic Control Extension precedes every frame (the 89a
    animation grammar); the gray palette makes decode closed-form for
    oracles, exactly like the still encoder."""
    w, h = screen
    if w < 1 or h < 1:
        raise ValueError(f"screen must be non-empty; got {screen}")
    if not frames:
        raise ValueError("animated GIF needs at least one frame")
    out = bytearray(_header(w, h, background))
    for f in frames:
        img = np.ascontiguousarray(f["img"], dtype=np.uint8)
        if img.ndim != 2:
            raise ValueError(f"expected (h, w) frame; got {img.shape}")
        left, top = int(f.get("left", 0)), int(f.get("top", 0))
        if left + img.shape[1] > w or top + img.shape[0] > h:
            raise ValueError("frame rectangle exceeds screen")
        transparent = f.get("transparent")
        disposal = int(f.get("disposal", 0))
        gce_flags = (disposal & 0x07) << 2
        tidx = 0
        if transparent is not None:
            gce_flags |= 0x01
            tidx = int(transparent)
        out += (
            b"\x21\xf9\x04"
            + bytes([gce_flags]) + b"\x02\x00"  # 2cs delay
            + bytes([tidx]) + b"\x00"
        )
        out += _image_block(
            img, left, top, interlace=bool(f.get("interlace", False))
        )
    out += b"\x3b"
    return bytes(out)


#: Interlaced row passes (GIF89a Appendix E): (first row, step).
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _row_order(ih: int, interlaced: bool) -> "list[int]":
    if not interlaced:
        return list(range(ih))
    order: "list[int]" = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, ih, step))
    return order


def _global_palette(data: bytes) -> "tuple[np.ndarray | None, int]":
    """(global color table or None, position after it)."""
    pos = 13
    flags = data[10]
    if not flags & 0x80:
        return None, pos
    n = 2 ** ((flags & 0x07) + 1)
    palette = np.frombuffer(
        data[pos : pos + 3 * n], dtype=np.uint8
    ).reshape(-1, 3)
    if palette.shape[0] != n:
        raise ValueError("GIF global color table truncated")
    return palette, pos + 3 * n


def _walk_gif(data: bytes):
    """Parse header/screen then yield one dict per image block:
    ``{left, top, iw, ih, interlaced, palette, min_code, lzw,
    transparent, disposal}`` — GCE state (89a) binds to the NEXT
    image per the spec."""
    global_palette, pos = _global_palette(data)
    transparent = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("GIF extension truncated")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9:  # Graphic Control Extension
                if len(payload) < 4:
                    raise ValueError("GIF GCE truncated")
                disposal = (payload[0] >> 2) & 0x07
                transparent = (
                    payload[3] if payload[0] & 0x01 else None
                )
        elif b == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise ValueError("GIF image descriptor truncated")
            left = int.from_bytes(data[pos : pos + 2], "little")
            top = int.from_bytes(data[pos + 2 : pos + 4], "little")
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
                if palette.shape[0] != n:
                    raise ValueError("GIF local color table truncated")
                pos += 3 * n
            if pos >= len(data):
                raise ValueError("GIF LZW header truncated")
            min_code = data[pos]
            pos += 1
            lzw, pos = _sub_blocks(data, pos)
            yield {
                "left": left, "top": top, "iw": iw, "ih": ih,
                "interlaced": bool(iflags & 0x40), "palette": palette,
                "min_code": min_code, "lzw": lzw,
                "transparent": transparent, "disposal": disposal,
            }
            transparent = None  # GCE binds to one image only
            disposal = 0
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")


def _check_header(data: bytes) -> tuple[int, int, int]:
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("GIF header truncated")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    return sw, sh, data[11]  # background color index


def _frame_indices(frame: dict) -> np.ndarray:
    """LZW-decode one image block → (ih, iw) palette indices with
    interlaced row reordering applied."""
    iw, ih = frame["iw"], frame["ih"]
    idx = _lzw_decompress(frame["lzw"], frame["min_code"])
    if len(idx) < iw * ih:
        raise ValueError(f"GIF pixel data short: {len(idx)} < {iw * ih}")
    arr = np.asarray(idx[: iw * ih], dtype=np.int64).reshape(ih, iw)
    if frame["interlaced"]:
        out = np.empty_like(arr)
        out[_row_order(ih, True)] = arr
        arr = out
    return arr


def gif_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a GIF to ``(width, height, (h, w) uint8 grayscale)`` —
    first image frame's rectangle (interlace honored); palette → gray
    by exact integer RGB mean."""
    w, h, n_frames, gray = gif_decode_info(data)
    return w, h, gray


def gif_decode_info(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """As :func:`gif_decode` plus the total image-frame count (later
    frames are walked for framing validity but not decoded)."""
    _check_header(data)
    first = None
    n_frames = 0
    for frame in _walk_gif(data):
        n_frames += 1
        if first is not None:
            continue
        palette = frame["palette"]
        if palette is None:
            raise ValueError("GIF image has no color table")
        arr = _frame_indices(frame)
        if arr.max(initial=0) >= palette.shape[0]:
            raise ValueError("GIF index beyond palette")
        rgb = palette[arr.reshape(-1)].astype(np.int64)
        gray = (rgb.sum(axis=1) // 3).astype(np.uint8)
        first = (frame["iw"], frame["ih"], gray.reshape(frame["ih"],
                                                        frame["iw"]))
    if first is None:
        raise ValueError("GIF contains no image frame")
    iw, ih, gray = first
    return iw, ih, n_frames, gray


def gif_decode_frames(data: bytes) -> "list[np.ndarray]":
    """Decode an animated GIF into a list of FULL-CANVAS ``(sh, sw)``
    uint8 grayscale frames — real compositing per GIF89a: each image
    block draws its rectangle onto the logical screen, GCE-transparent
    pixels leave the canvas unchanged, disposal 0/1 leave the drawn
    frame in place, disposal 2 restores the rectangle to the
    background color after the frame is emitted. Disposal 3 (restore
    to previous) raises — rare, needs a history stack. The canvas
    starts as the background color (global palette's background index;
    black when absent)."""
    sw, sh, bg_index = _check_header(data)
    gp, _ = _global_palette(data)
    bg_rgb = (
        gp[bg_index].astype(np.int64)
        if gp is not None and bg_index < gp.shape[0]
        else np.zeros(3, dtype=np.int64)
    )
    frames: "list[np.ndarray]" = []
    canvas = np.tile(bg_rgb, (sh, sw, 1))
    for frame in _walk_gif(data):
        palette = frame["palette"]
        if palette is None:
            raise ValueError("GIF image has no color table")
        if frame["disposal"] == 3:
            raise ValueError(
                "GIF disposal 'restore to previous' unsupported"
            )
        arr = _frame_indices(frame)
        if arr.max(initial=0) >= palette.shape[0]:
            raise ValueError("GIF index beyond palette")
        left, top = frame["left"], frame["top"]
        iw, ih = frame["iw"], frame["ih"]
        if left + iw > sw or top + ih > sh:
            raise ValueError("GIF frame rectangle exceeds screen")
        rgb = palette[arr].astype(np.int64)  # (ih, iw, 3)
        region = canvas[top : top + ih, left : left + iw]
        if frame["transparent"] is not None:
            opaque = arr != frame["transparent"]
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(
            (canvas.sum(axis=2) // 3).astype(np.uint8)
        )
        if frame["disposal"] == 2:
            canvas[top : top + ih, left : left + iw] = bg_rgb
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames
