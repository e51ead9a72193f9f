"""Vendored minimal AVI/MJPEG container codec (stdlib only — ``struct``).

The video leg of the multimodal operators gets a REAL container format
beyond animation streams (APNG/GIF): AVI is a public RIFF layout — a
``hdrl`` LIST carrying the main and per-stream headers, a ``movi``
LIST carrying the frame chunks, an optional ``idx1`` index.  Motion
JPEG stores each frame as an independent baseline JFIF stream, which
the vendored JPEG codec (dataops/jpeg.py) already decodes — so AVI
support is container plumbing, not a new entropy coder.  This covers
the baseline profile: one 'vids' stream, 'MJPG' compression,
``00dc``/``00db`` frame chunks (flat or inside ``rec `` lists);
any other fccHandler stays behind ``NotImplementedError`` — the exact
call site a pyav/ffmpeg integration would fill.

* :func:`decode_avi` → ``(width, height, [jpeg_frame_bytes])``.
* :func:`encode_avi_mjpeg` writes a spec-valid file for fixtures.
"""

from __future__ import annotations

import struct

AVI_MAGIC = b"RIFF"


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    width: int, height: int, frames: list[bytes], *, fps: int = 10
) -> bytes:
    """Wrap pre-encoded baseline-JFIF frames into a spec-valid
    single-stream AVI: RIFF('AVI ') { LIST hdrl { avih, LIST strl
    { strh 'vids'/'MJPG', strf BITMAPINFOHEADER } }, LIST movi
    { '00dc' x n }, idx1 }."""
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        len(frames),  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            max(fps, 1),  # dwRate
            0,  # dwStart
            len(frames),  # dwLength
            0,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize
            0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0,  # biXPelsPerMeter, biYPelsPerMeter
        0, 0,  # biClrUsed, biClrImportant
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)

    # idx1 offsets are relative to the 'movi' list-type fourcc
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
        )
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, off: int, end: int):
    """Yield (fourcc, body_start, body_size) for sibling chunks.  A
    chunk whose declared size runs past ``end`` is a truncated or
    corrupt stream — raise, never silently clamp (a clamped frame
    list read as a successful decode before r11)."""
    while off + 8 <= end:
        cid = data[off : off + 4]
        size = struct.unpack_from("<I", data, off + 4)[0]
        if off + 8 + size > end:
            raise ValueError(
                f"truncated AVI chunk {cid!r} (declares {size} bytes "
                f"past container end)"
            )
        yield cid, off + 8, size
        off += 8 + size + (size & 1)


def decode_avi(data: bytes) -> tuple[int, int, list[bytes]]:
    """→ (width, height, [jpeg_frame_bytes]) for a baseline MJPEG AVI.

    Walks the RIFF tree tolerantly (unknown chunk TYPES skipped), reads
    the frame dimensions from the stream-format BITMAPINFOHEADER, and
    collects every video frame chunk (``..dc``/``..db``) from the
    ``movi`` list, descending into ``rec `` groups.

    Corrupt-input contract (certified by tests/test_codec_hostile.py):
    zero-length / wrong-magic / truncated / bit-flipped streams raise
    ``ValueError``; non-MJPG compression raises ``NotImplementedError``;
    no other exception type escapes."""
    try:
        return _decode_avi(data)
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(
            f"corrupt AVI stream: {type(e).__name__}: {e}"
        ) from e


def _decode_avi(data: bytes) -> tuple[int, int, list[bytes]]:
    if data[:4] != AVI_MAGIC or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    declared = struct.unpack_from("<I", data, 4)[0]
    if 8 + declared > len(data):
        raise ValueError(
            f"truncated AVI (RIFF declares {declared} bytes, "
            f"stream has {len(data) - 8})"
        )
    width = height = 0
    compression = b""
    frames: list[bytes] = []

    def visit_movi(start: int, end: int) -> None:
        for cid, boff, bsize in _walk(data, start, end):
            if cid == b"LIST" and data[boff : boff + 4] == b"rec ":
                visit_movi(boff + 4, boff + bsize)
            elif cid[2:4] in (b"dc", b"db"):
                frames.append(data[boff : boff + bsize])

    def visit(start: int, end: int) -> None:
        nonlocal width, height, compression
        for cid, boff, bsize in _walk(data, start, end):
            if cid == b"LIST":
                ltype = data[boff : boff + 4]
                if ltype == b"movi":
                    visit_movi(boff + 4, boff + bsize)
                else:
                    visit(boff + 4, boff + bsize)
            elif cid == b"strf" and bsize >= 24 and width == 0:
                _, w, h = struct.unpack_from("<Iii", data, boff)
                compression = data[boff + 16 : boff + 20]
                width, height = w, abs(h)

    visit(12, len(data))
    if width == 0:
        raise ValueError("AVI has no video stream format (strf)")
    if compression not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"AVI compression {compression!r} (only MJPG; a pyav/ffmpeg "
            "integration would slot in here)"
        )
    return width, height, frames
