"""Vendored minimal WAV/PCM codec (stdlib only — ``struct``).

The audio leg of the multimodal operators needs a REAL decode path in
a runtime without torchaudio/ffmpeg.  Canonical RIFF/WAVE PCM is a
public, trivial container: a 44-byte header plus little-endian
samples.  This covers the baseline profile — PCM integer samples
(8/16/32-bit), any channel count and rate; compressed codecs (MP3,
AAC, float PCM) stay behind ``NotImplementedError``.

* :func:`decode_wav` → ``(sample_rate, n_channels, samples)`` with
  samples as a flat interleaved list of ints.
* :func:`encode_wav` writes a spec-valid PCM file for fixtures.
"""

from __future__ import annotations

import struct

WAV_MAGIC = b"RIFF"


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """→ (sample_rate, n_channels, interleaved integer samples).

    Corrupt-input contract (certified by tests/test_codec_hostile.py):
    zero-length / wrong-magic / truncated / bit-flipped streams raise
    ``ValueError``; non-PCM formats and unsupported bit depths raise
    ``NotImplementedError``; no other exception type escapes."""
    try:
        return _decode_wav(data)
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(
            f"corrupt WAV stream: {type(e).__name__}: {e}"
        ) from e


def _decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    if data[:4] != WAV_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    declared = struct.unpack_from("<I", data, 4)[0]
    if 8 + declared > len(data):
        raise ValueError(
            f"truncated WAV (RIFF declares {declared} bytes, "
            f"stream has {len(data) - 8})"
        )
    off = 12
    fmt = None
    saw_data = False
    samples: list[int] = []
    rate = channels = bits = 0
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        size = struct.unpack_from("<I", data, off + 4)[0]
        if off + 8 + size > len(data):
            raise ValueError(
                f"truncated WAV chunk {cid!r} (declares {size} bytes "
                "past end of stream)"
            )
        body = data[off + 8 : off + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            audio_format, channels, rate, _, _, bits = fmt
            if audio_format != 1:
                raise NotImplementedError(
                    f"WAV audio format {audio_format} (only PCM=1)"
                )
            if bits not in (8, 16, 32):
                raise NotImplementedError(f"PCM bit depth {bits}")
        elif cid == b"data":
            if fmt is None:
                raise ValueError("WAV data chunk before fmt chunk")
            saw_data = True
            if bits == 8:  # unsigned
                samples = [b - 128 for b in body]
            elif bits == 16:
                samples = list(
                    struct.unpack(f"<{len(body) // 2}h", body)
                )
            else:
                samples = list(
                    struct.unpack(f"<{len(body) // 4}i", body)
                )
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise ValueError("WAV file has no fmt chunk")
    if not saw_data:
        raise ValueError("WAV file has no data chunk (truncated?)")
    return rate, channels, samples


def encode_wav(
    sample_rate: int, samples: list[int], *, channels: int = 1
) -> bytes:
    """Spec-valid 16-bit PCM WAV from interleaved integer samples."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        16,
    )
    chunks = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
