"""Pure-stdlib RIFF/WAVE PCM codec for the multimodal pipeline.

The audio leg of the multimodal brief, implemented from the published
RIFF/WAVE container layout with nothing beyond ``struct`` and numpy —
the same stance as the PNG/JPEG codecs: REAL container parsing (RIFF
chunk walk, fmt validation, data extraction), run inside the
Arrow-batched ``mapInPandas`` stages of ``operators/multimodal.py``.

Scope (documented, checked, raised on): PCM integer 16-bit
(``wFormatTag = 1``), 1 or 2 channels, any sample rate. Compressed
formats (ADPCM/MP3-in-WAV/float PCM) raise ``ValueError`` — real
corpora transcode upstream; the quarantine contract routes the raise
to ``decode_error``. Stereo decodes to the per-frame integer MEAN
(floor toward −∞ via arithmetic shift semantics is avoided by exact
``(l + r) // 2`` in int32 — engine-replayable), mirroring the image
codecs' "each format decodes to its own canonical mono" rule.

The matching encoder exists so pipelines and the DuckDB oracle can
fabricate real containers deterministically; PCM is lossless, so any
synthetic sample stream is decode-exact by construction (no
constant-block trick needed).
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def wav_encode_pcm16(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """Encode int16 samples as a real RIFF/WAVE file. ``samples`` is
    ``(n,)`` mono or ``(n, 2)`` stereo; interleaving and all header
    fields (block align, byte rate, chunk sizes) follow the spec."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        n_channels = 1
        frames = samples
    elif samples.ndim == 2 and samples.shape[1] in (1, 2):
        n_channels = samples.shape[1]
        frames = samples.reshape(-1)  # row-major == interleaved
    else:
        raise ValueError(
            f"expected (n,) mono or (n, 1|2) frames; got {samples.shape}"
        )
    if sample_rate < 1:
        raise ValueError(f"sample_rate must be >= 1; got {sample_rate}")
    data = frames.astype("<i2").tobytes()
    block_align = 2 * n_channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a RIFF/WAVE payload → ``(sample_rate, n_channels,
    (n_frames,) int32 mono samples)`` (stereo averaged exactly:
    ``(l + r) // 2`` in int32). Unknown chunks (LIST/fact/cue…) are
    skipped per the RIFF rules, including the odd-size pad byte."""
    if data[:4] != WAV_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload (bad magic)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"WAV chunk {tag!r} truncated")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # odd chunks pad one byte
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    wformat, n_channels, sample_rate, _rate, _align, bits = fmt
    if wformat != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV encoding (format={wformat}, bits={bits}); "
            "supported: integer PCM 16-bit"
        )
    if n_channels not in (1, 2):
        raise ValueError(f"unsupported channel count {n_channels}")
    usable = len(pcm) - len(pcm) % (2 * n_channels)
    frames = np.frombuffer(pcm[:usable], dtype="<i2").astype(np.int32)
    if n_channels == 2:
        frames = frames.reshape(-1, 2)
        mono = (frames[:, 0] + frames[:, 1]) // 2
    else:
        mono = frames
    return sample_rate, n_channels, mono
