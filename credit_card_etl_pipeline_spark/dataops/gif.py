"""Vendored GIF87a/89a codec (LZW) for real animated-frame sampling.

:func:`decode_gif_frames` parses a GIF stream — logical screen, global
/local color tables, graphic-control extensions (disposal,
transparency), interlacing — LZW-decompresses every image block and
composites the animation, returning one full-canvas LUMINANCE frame
per image (Rec.601 integer weights over the palette).
:func:`encode_gif` writes grayscale animations with a 256-level global
palette so fixtures round-trip in-repo.

Pure stdlib; the LZW coder follows the GIF specification (variable
9..12-bit codes, clear/EOI, little-endian bit packing, 255-byte
sub-blocks).  Reference: CompuServe GIF89a specification (public).
"""

from __future__ import annotations

import struct

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# ------------------------------------------------------------------
# LZW (GIF variant)
# ------------------------------------------------------------------

def _lzw_decode(
    data: bytes, min_code_size: int, max_out: int | None = None
) -> bytes:
    """``max_out`` caps the decoded size (LZW expands up to O(n²) of
    the input on crafted streams — a corrupt frame must raise, not
    wedge the task)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            nbits -= code_size
            if code == clear:
                table = table[: clear + 2]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream (code gap)")
            out += entry
            prev = entry
            if max_out is not None and len(out) > max_out:
                raise ValueError(
                    f"LZW output exceeds frame size {max_out} "
                    "(corrupt GIF frame)"
                )
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= (1 << 12):
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------------------
# Stream plumbing
# ------------------------------------------------------------------

def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate 255-byte sub-blocks starting at ``pos``; returns
    (payload, position after the 0 terminator)."""
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        pos += n


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    order = (
        list(range(0, height, 8))
        + list(range(4, height, 8))
        + list(range(2, height, 4))
        + list(range(1, height, 2))
    )
    out: list[bytes] = [b""] * height
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out


def _palette_gray(palette: bytes) -> bytes:
    """256-entry luminance lookup (Rec.601 integer weights)."""
    lut = bytearray(256)
    n = len(palette) // 3
    for i in range(n):
        r, g, b = palette[i * 3 : i * 3 + 3]
        lut[i] = (299 * r + 587 * g + 114 * b) // 1000
    return bytes(lut)


# ------------------------------------------------------------------
# Decoder
# ------------------------------------------------------------------

def decode_gif_frames(data: bytes) -> list[tuple[int, int, bytes]]:
    """All composited frames of a GIF as (width, height, luminance
    bytes) over the full logical screen.  Disposal methods 0/1 (leave),
    2 (restore background), 3 (restore previous) and per-frame
    transparency are honoured.

    Corrupt-input contract (certified by tests/test_codec_hostile.py):
    zero-length / wrong-magic / truncated (no 0x3B trailer) /
    bit-flipped streams raise ``ValueError``; no other exception type
    escapes; allocations are capped by a dimension sanity check."""
    try:
        return _decode_gif_frames(data)
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(
            f"corrupt GIF stream: {type(e).__name__}: {e}"
        ) from e


def _decode_gif_frames(data: bytes) -> list[tuple[int, int, bytes]]:
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    width, height = struct.unpack("<HH", data[6:10])
    if not (0 < width * height <= 1 << 26):
        raise ValueError(
            f"implausible GIF dimensions {width}x{height} "
            "(corrupt header?)"
        )
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + n * 3]
        pos += n * 3

    canvas = bytearray([bg_index]) * (width * height)
    frames: list[tuple[int, int, bytes]] = []
    transparent: int | None = None
    disposal = 0
    prev_canvas: bytes | None = None

    saw_trailer = False
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # GCE
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else None
            continue
        if block != 0x2C:  # image descriptor expected
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        fx, fy, fw, fh = struct.unpack("<HHHH", data[pos : pos + 8])
        if fw * fh > 1 << 26:
            raise ValueError(
                f"implausible GIF frame dimensions {fw}x{fh} "
                "(corrupt descriptor?)"
            )
        fpacked = data[pos + 8]
        pos += 9
        lct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            lct = data[pos : pos + n * 3]
            pos += n * 3
        interlaced = bool(fpacked & 0x40)
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        indices = _lzw_decode(lzw, min_code, max_out=fw * fh)
        if len(indices) < fw * fh:
            indices = indices + bytes(fw * fh - len(indices))
        rows = [indices[r * fw : (r + 1) * fw] for r in range(fh)]
        if interlaced:
            rows = _deinterlace(rows, fh)

        if disposal == 3:
            prev_canvas = bytes(canvas)
        for r, row in enumerate(rows):
            y = fy + r
            if y >= height:
                continue
            base = y * width
            for c, idx in enumerate(row[: max(0, width - fx)]):
                if transparent is not None and idx == transparent:
                    continue
                canvas[base + fx + c] = idx
        lut = _palette_gray(lct)
        frames.append(
            (width, height, bytes(lut[i] for i in canvas))
        )
        if disposal == 2:
            for r in range(fh):
                y = fy + r
                if y >= height:
                    continue
                base = y * width
                for c in range(min(fw, width - fx)):
                    canvas[base + fx + c] = bg_index
        elif disposal == 3 and prev_canvas is not None:
            canvas = bytearray(prev_canvas)
        disposal = 0
        transparent = None
    if not saw_trailer:
        # a partial frame list from a cut stream must not read as a
        # successful decode
        raise ValueError("truncated GIF stream (no 0x3B trailer)")
    return frames


# ------------------------------------------------------------------
# Encoder (grayscale animation; for tests/fixtures)
# ------------------------------------------------------------------

def encode_gif(
    width: int, height: int, frames: list[bytes], *, interlace_first: bool = False
) -> bytes:
    """GIF89a grayscale animation: one image block per frame over a
    256-level gray global palette (pixel value == palette index), all
    frames full-canvas with disposal 'leave'."""
    for f in frames:
        if len(f) != width * height:
            raise ValueError("each frame must be width*height bytes")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries; bg 0
    for i in range(256):
        out += bytes([i, i, i])
    for fno, frame in enumerate(frames):
        out += bytes([0x21, 0xF9, 4, 0x04, 0, 0, 0, 0])  # GCE disposal 1
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, width, height)
        interlaced = interlace_first and fno == 0
        out += bytes([0x40 if interlaced else 0x00])
        pixels = frame
        if interlaced:
            rows = [frame[r * width : (r + 1) * width] for r in range(height)]
            order = (
                list(range(0, height, 8))
                + list(range(4, height, 8))
                + list(range(2, height, 4))
                + list(range(1, height, 2))
            )
            pixels = b"".join(rows[y] for y in order)
        out += bytes([8])  # min LZW code size
        lzw = _lzw_encode(pixels, 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)
