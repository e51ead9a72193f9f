"""Vendored minimal PNG codec (stdlib only — ``zlib`` + ``struct``).

The multimodal operators (multimodal.py) need a REAL image decode path
in a runtime that ships no codec libraries.  PNG is a public format
(RFC 2083 / W3C PNG spec) whose baseline profile — 8-bit depth,
grayscale / RGB / RGBA / palette, the five scanline filters, no
interlace — is small enough to vendor:

* :func:`decode_png` → ``(width, height, channels, pixels)`` with all
  five filter types (None/Sub/Up/Average/Paeth) reconstructed.
* :func:`encode_png` writes valid PNGs and deliberately cycles the
  scanline filter per row, so a decode of our own output exercises
  every reconstruction branch — not just the trivial filter-0 path.
* :func:`to_gray` / :func:`resize_nearest` — the luminance + resize
  helpers the multimodal operators build on.

Interlaced (Adam7) and 16-bit images raise ``NotImplementedError`` —
outside the baseline profile this engine needs.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per color type (PNG spec 4.1.1)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: corrupt-header allocation guard: a forged IHDR (or a zlib bomb
#: behind one) must fail loudly, not wedge the task in a multi-GB
#: bytearray.  2^26 pixels (64 MP) is far beyond any fixture this
#: engine decodes; raise, never allocate, past it.
MAX_PIXELS = 1 << 26
MAX_SIDE = 1 << 15


def _check_dims(width: int, height: int, kind: str = "PNG") -> None:
    if not (
        0 < width <= MAX_SIDE
        and 0 < height <= MAX_SIDE
        and width * height <= MAX_PIXELS
    ):
        raise ValueError(
            f"implausible {kind} dimensions {width}x{height} "
            f"(corrupt header?)"
        )


def _bounded_inflate(z: bytes, expect: int) -> bytes:
    """zlib inflate capped at the header-derived expected size: a
    compression bomb behind a small forged IHDR raises instead of
    allocating unbounded output."""
    d = zlib.decompressobj()
    raw = d.decompress(z, expect + 1)
    if len(raw) > expect or d.unconsumed_tail:
        raise ValueError(
            f"PNG pixel data exceeds expected {expect} bytes "
            "(corrupt header or compression bomb)"
        )
    return raw


def _chunks(data: bytes):
    off = 8
    saw_iend = False
    while off + 8 <= len(data):
        length = struct.unpack_from(">I", data, off)[0]
        ctype = data[off + 4 : off + 8]
        if off + 12 + length > len(data):  # payload + 4-byte CRC
            raise ValueError(
                f"truncated PNG chunk {ctype!r} (declares {length} "
                f"bytes + CRC past end of stream)"
            )
        yield ctype, data[off + 8 : off + 8 + length]
        off += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            saw_iend = True
            return
    if not saw_iend:
        raise ValueError("truncated PNG stream (no IEND chunk)")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(
    raw: bytes, width: int, height: int, bpp: int
) -> bytearray:
    """Reverse per-scanline filtering (PNG spec 6) into raw samples."""
    stride = width * bpp
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = y * stride
        prev_base = base - stride
        for x in range(stride):
            a = out[base + x - bpp] if x >= bpp else 0
            b = out[prev_base + x] if y > 0 else 0
            c = (
                out[prev_base + x - bpp] if (y > 0 and x >= bpp) else 0
            )
            v = line[x]
            if ftype == 0:
                r = v
            elif ftype == 1:
                r = v + a
            elif ftype == 2:
                r = v + b
            elif ftype == 3:
                r = v + ((a + b) >> 1)
            elif ftype == 4:
                r = v + _paeth(a, b, c)
            else:
                raise ValueError(f"bad PNG filter type {ftype}")
            out[base + x] = r & 0xFF
    return out


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, pixels) — pixels are row-major
    interleaved samples; palette images are expanded to RGB.

    Corrupt-input contract (certified by tests/test_codec_hostile.py):
    zero-length / wrong-magic / truncated / bit-flipped streams raise
    ``ValueError``; valid-but-unsupported profiles raise
    ``NotImplementedError``.  No other exception type escapes, and no
    allocation is driven by unvalidated header fields."""
    try:
        return _decode_png(data)
    except (struct.error, zlib.error, IndexError, OverflowError) as e:
        raise ValueError(
            f"corrupt PNG stream: {type(e).__name__}: {e}"
        ) from e


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    width = height = 0
    depth = color = interlace = 0
    idat = bytearray()
    palette = b""
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif ctype == b"PLTE":
            palette = payload
        elif ctype == b"IDAT":
            idat += payload
    if width == 0 and height == 0 and depth == 0:
        raise ValueError("PNG has no IHDR chunk")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
    if interlace:
        raise NotImplementedError("interlaced (Adam7) PNG")
    if color not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    _check_dims(width, height)
    bpp = _CHANNELS[color]
    expect = height * (width * bpp + 1)
    raw = _bounded_inflate(bytes(idat), expect)
    if len(raw) != expect:
        raise ValueError(
            f"PNG pixel data length {len(raw)} != expected {expect}"
        )
    samples = _unfilter(raw, width, height, bpp)
    if color == 3:  # palette → RGB
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(samples):
            rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, bpp, bytes(samples)


def to_gray(channels: int, pixels: bytes) -> bytes:
    """Integer-arithmetic luminance (ITU-R BT.601 weights scaled /256):
    deterministic across engines, no floating point."""
    if channels == 1:
        return pixels
    if channels == 2:  # gray + alpha
        return pixels[0::2]
    out = bytearray(len(pixels) // channels)
    for i in range(len(out)):
        r = pixels[channels * i]
        g = pixels[channels * i + 1]
        b = pixels[channels * i + 2]
        out[i] = (77 * r + 150 * g + 29 * b) >> 8
    return bytes(out)


def resize_nearest(
    pixels: bytes, width: int, height: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resize of a single-channel pixel buffer."""
    out = bytearray(new_w * new_h)
    for y in range(new_h):
        sy = y * height // new_h
        row = sy * width
        base = y * new_w
        for x in range(new_w):
            out[base + x] = pixels[row + x * width // new_w]
    return bytes(out)


# ------------------------------------------------------------------
# Encoder
# ------------------------------------------------------------------

def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def _filter_line(
    ftype: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    out = bytearray(len(line))
    for x in range(len(line)):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x] if prev else 0
        c = prev[x - bpp] if (prev and x >= bpp) else 0
        v = line[x]
        if ftype == 0:
            out[x] = v
        elif ftype == 1:
            out[x] = (v - a) & 0xFF
        elif ftype == 2:
            out[x] = (v - b) & 0xFF
        elif ftype == 3:
            out[x] = (v - ((a + b) >> 1)) & 0xFF
        else:
            out[x] = (v - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def encode_png(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Valid 8-bit PNG (gray, gray+alpha, RGB, or RGBA by channel
    count).  The scanline filter cycles ``row % 5`` so decoding our own
    output exercises every filter-reconstruction branch."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    prev = b""
    for y in range(height):
        line = pixels[y * stride : (y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        raw += _filter_line(ftype, line, prev, channels)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


# ------------------------------------------------------------------
# APNG (animated PNG) — minimal frame codec
# ------------------------------------------------------------------
# The animation profile of the same public spec (W3C PNG 3rd ed. /
# the original APNG extension): an acTL chunk declares the frame
# count, each frame is an fcTL control chunk followed by IDAT (first
# frame) or fdAT (sequence-numbered) data chunks.  This vendored
# subset covers full-frame, no-blend, no-offset animations — enough
# to make video-style frame EXTRACTION a real decode path; partial
# frames and dispose/blend modes stay out of scope.


def decode_apng_frames(data: bytes) -> list[tuple[int, int, int, bytes]]:
    """Decode every frame of an APNG → list of (width, height,
    channels, pixels).  A plain (non-animated) PNG decodes as one
    frame.  Same corrupt-input contract as :func:`decode_png`."""
    try:
        return _decode_apng_frames(data)
    except (struct.error, zlib.error, IndexError, OverflowError) as e:
        raise ValueError(
            f"corrupt APNG stream: {type(e).__name__}: {e}"
        ) from e


def _decode_apng_frames(data: bytes) -> list[tuple[int, int, int, bytes]]:
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    width = height = depth = color = interlace = 0
    frames_data: list[bytearray] = []
    cur: bytearray | None = None
    default_idat = bytearray()
    has_actl = False
    first_is_frame = False
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif ctype == b"acTL":
            has_actl = True
        elif ctype == b"fcTL":
            fw, fh, fx, fy = struct.unpack_from(">IIII", payload, 4)
            if (fw, fh, fx, fy) != (width, height, 0, 0):
                raise NotImplementedError(
                    "APNG sub-frame regions (offset/partial frames)"
                )
            cur = bytearray()
            frames_data.append(cur)
            if not default_idat:
                first_is_frame = True
        elif ctype == b"IDAT":
            if cur is not None and first_is_frame:
                cur += payload
            default_idat += payload
        elif ctype == b"fdAT":
            if cur is None:
                raise ValueError("fdAT before any fcTL")
            cur += payload[4:]  # strip the sequence number
    if depth != 8 or interlace:
        raise NotImplementedError("APNG frames must be 8-bit, no interlace")
    if not has_actl or not frames_data:
        w, h, ch, px = _decode_png(data)
        return [(w, h, ch, px)]
    if color not in _CHANNELS:
        raise ValueError(f"bad PNG color type {color}")
    _check_dims(width, height, "APNG")
    bpp = _CHANNELS[color]
    expect = height * (width * bpp + 1)
    out = []
    for raw in frames_data:
        inflated = _bounded_inflate(bytes(raw), expect)
        if len(inflated) != expect:
            raise ValueError(
                f"APNG frame data length {len(inflated)} != "
                f"expected {expect}"
            )
        samples = _unfilter(inflated, width, height, bpp)
        out.append((width, height, bpp, bytes(samples)))
    return out


def encode_apng(
    width: int, height: int, channels: int, frames: list[bytes]
) -> bytes:
    """Valid APNG from equal-size full frames (filter cycling per row,
    like :func:`encode_png`)."""
    if not frames:
        raise ValueError("need at least one frame")
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels

    def filtered(pixels: bytes) -> bytes:
        raw = bytearray()
        prev = b""
        for y in range(height):
            line = pixels[y * stride : (y + 1) * stride]
            ftype = y % 5
            raw.append(ftype)
            raw += _filter_line(ftype, line, prev, channels)
            prev = line
        return zlib.compress(bytes(raw), 6)

    def fctl(seq: int) -> bytes:
        return _chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB", seq, width, height, 0, 0, 1, 10, 0, 0
            ),
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    out = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    )
    seq = 0
    out += fctl(seq)
    seq += 1
    out += _chunk(b"IDAT", filtered(frames[0]))
    for frame in frames[1:]:
        out += fctl(seq)
        seq += 1
        out += _chunk(
            b"fdAT", struct.pack(">I", seq) + filtered(frame)
        )
        seq += 1
    return out + _chunk(b"IEND", b"")
