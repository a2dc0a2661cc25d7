"""Pure-stdlib EXIF (APP1/TIFF) metadata codec for the multimodal
pipeline.

Crawled JPEGs carry provenance and geometry metadata in an APP1
segment: an ``Exif\\0\\0`` prefix followed by a little TIFF file —
byte-order mark (II/MM), magic 42, and a chain of IFDs whose 12-byte
entries hold typed tag values (TIFF 6.0 §2; Exif 2.3 §4.6). A real
curation pipeline reads Orientation before computing any perceptual
hash (a rotated near-dup otherwise misses) and Make/Model/DateTime for
provenance splits.

Implemented from the published TIFF/Exif structure with ``struct``
only: both byte orders, IFD0 + the Exif sub-IFD, inline and offset
value storage, ASCII/SHORT/LONG types. The matching writer fabricates
real APP1 segments so fixtures and the DuckDB oracle get closed-form
fields without a TIFF parser. Parity citation: the reference stack
has no EXIF surface (its feeds are XML, reference README) — this is
part of the multimodal extension surface the engine adds for
100 TB media curation.
"""

from __future__ import annotations

import struct

#: (tag, name) pairs read from IFD0.
_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
}
_EXIF_POINTER = 0x8769
#: Exif sub-IFD tags.
_EXIF_TAGS = {
    0xA002: "exif_width",
    0xA003: "exif_height",
}

#: TIFF type sizes (type code → bytes per element).
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _read_ifd(tiff: bytes, offset: int, bo: str, tags: dict) -> dict:
    """One IFD at ``offset`` → {name: value} for the requested tags
    (plus ``_exif_ptr`` when the Exif-IFD pointer tag is present)."""
    out: dict = {}
    if offset + 2 > len(tiff):
        raise ValueError("EXIF IFD offset out of bounds")
    (count,) = struct.unpack_from(bo + "H", tiff, offset)
    pos = offset + 2
    if pos + 12 * count > len(tiff):
        raise ValueError("EXIF IFD entries truncated")
    for _ in range(count):
        tag, typ, n = struct.unpack_from(bo + "HHI", tiff, pos)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            pos += 12
            continue  # unknown type: skip, per TIFF reader guidance
        total = size * n
        if total <= 4:
            voff = pos + 8
        else:
            (voff,) = struct.unpack_from(bo + "I", tiff, pos + 8)
            if voff + total > len(tiff):
                raise ValueError("EXIF value offset out of bounds")
        if tag == _EXIF_POINTER and typ == 4:
            (out["_exif_ptr"],) = struct.unpack_from(bo + "I", tiff, voff)
        elif tag in tags:
            name = tags[tag]
            if typ == 2:  # ASCII, NUL-terminated
                raw = tiff[voff : voff + n]
                out[name] = raw.split(b"\x00", 1)[0].decode(
                    "ascii", "replace"
                )
            elif typ == 3:  # SHORT
                (out[name],) = struct.unpack_from(bo + "H", tiff, voff)
            elif typ == 4:  # LONG
                (out[name],) = struct.unpack_from(bo + "I", tiff, voff)
        pos += 12
    return out


def exif_parse(data: bytes) -> "dict | None":
    """Extract EXIF fields from a JPEG → ``{make, model, orientation,
    datetime, exif_width, exif_height}`` (absent fields omitted), or
    ``None`` when the file carries no APP1/Exif segment. Raises
    ``ValueError`` on a structurally broken segment — the decode_media
    quarantine contract."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        marker = data[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS: no metadata past here
            return None
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("JPEG segment truncated")
        pos += seglen
        if marker != 0xE1 or not body.startswith(b"Exif\x00\x00"):
            continue
        tiff = body[6:]
        if len(tiff) < 8:
            raise ValueError("EXIF TIFF header truncated")
        order = tiff[:2]
        if order == b"II":
            bo = "<"
        elif order == b"MM":
            bo = ">"
        else:
            raise ValueError("EXIF bad TIFF byte order")
        magic, ifd0 = struct.unpack_from(bo + "HI", tiff, 2)
        if magic != 42:
            raise ValueError("EXIF bad TIFF magic")
        fields = _read_ifd(tiff, ifd0, bo, _IFD0_TAGS)
        ptr = fields.pop("_exif_ptr", None)
        if ptr is not None:
            fields.update(_read_ifd(tiff, ptr, bo, _EXIF_TAGS))
        return fields
    return None


def _entry(bo: str, tag: int, typ: int, n: int, value) -> "tuple[bytes, bytes]":
    """(12-byte entry with placeholder offset, overflow payload)."""
    if typ == 2:
        raw = value.encode("ascii") + b"\x00"
        n = len(raw)
    elif typ == 3:
        raw = struct.pack(bo + "H", value)
    elif typ == 4:
        raw = struct.pack(bo + "I", value)
    else:
        raise ValueError(f"unsupported writer type {typ}")
    head = struct.pack(bo + "HHI", tag, typ, n)
    if len(raw) <= 4:
        return head + raw.ljust(4, b"\x00"), b""
    return head + b"\x00\x00\x00\x00", raw  # offset patched later


def _ifd(bo: str, entries: "list[tuple]", base: int) -> bytes:
    """Serialize an IFD at ``base`` (offset within the TIFF body):
    count + entries + next=0 + overflow values."""
    fixed = 2 + 12 * len(entries) + 4
    body = bytearray(struct.pack(bo + "H", len(entries)))
    overflow = bytearray()
    for head, payload in entries:
        if payload:
            off = base + fixed + len(overflow)
            head = head[:8] + struct.pack(bo + "I", off)
            overflow += payload
            if len(overflow) % 2:
                overflow += b"\x00"
        body += head
    body += struct.pack(bo + "I", 0)  # no next IFD
    return bytes(body) + bytes(overflow)


def exif_app1(
    make: str,
    model: str,
    orientation: int,
    datetime: str,
    width: int,
    height: int,
    byte_order: str = "II",
) -> bytes:
    """Build a real APP1/Exif segment (marker + length + Exif header +
    TIFF body with IFD0 and an Exif sub-IFD) carrying the six fields
    the parser reads. Deterministic, both byte orders — fixtures embed
    this right after SOI."""
    bo = "<" if byte_order == "II" else ">"
    ifd0_entries = [
        _entry(bo, 0x010F, 2, 0, make),
        _entry(bo, 0x0110, 2, 0, model),
        _entry(bo, 0x0112, 3, 1, orientation),
        _entry(bo, 0x0132, 2, 0, datetime),
        _entry(bo, _EXIF_POINTER, 4, 1, 0),  # patched below
    ]
    # IFD0 starts at offset 8 (right after the TIFF header).
    ifd0_probe = _ifd(bo, ifd0_entries, 8)
    exif_off = 8 + len(ifd0_probe)
    ifd0_entries[-1] = _entry(bo, _EXIF_POINTER, 4, 1, exif_off)
    ifd0 = _ifd(bo, ifd0_entries, 8)
    assert len(ifd0) == len(ifd0_probe)
    exif_entries = [
        _entry(bo, 0xA002, 4, 1, width),
        _entry(bo, 0xA003, 4, 1, height),
    ]
    exif_ifd = _ifd(bo, exif_entries, exif_off)
    tiff = (
        byte_order.encode("ascii")
        + struct.pack(bo + "HI", 42, 8)
        + ifd0
        + exif_ifd
    )
    body = b"Exif\x00\x00" + tiff
    return struct.pack(">BBH", 0xFF, 0xE1, len(body) + 2) + body


def with_exif(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment right after SOI of an existing JPEG."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def apply_orientation(gray, orientation: int):
    """Apply an EXIF orientation (1-8) to an ``(h, w)`` raster so the
    result is upright — the transform a perceptual-hash stage MUST run
    first (a rotated near-dup otherwise hashes differently). Mapping
    per Exif 2.3 §4.6.4 (values name where the stored 0th row/column
    sit visually): 1 identity, 2 mirror-H, 3 rotate 180, 4 mirror-V,
    5 transpose, 6 rotate 90 CW, 7 anti-transpose, 8 rotate 90 CCW.
    """
    import numpy as np

    x = np.asarray(gray)
    if orientation == 1:
        return x
    if orientation == 2:
        return np.fliplr(x)
    if orientation == 3:
        return np.rot90(x, 2)
    if orientation == 4:
        return np.flipud(x)
    if orientation == 5:
        return np.transpose(x)
    if orientation == 6:
        return np.rot90(x, -1)
    if orientation == 7:
        return np.rot90(np.transpose(x), 2)
    if orientation == 8:
        return np.rot90(x, 1)
    raise ValueError(f"EXIF orientation must be 1..8; got {orientation}")
