"""Vendored BMP (Windows DIB) decoder — uncompressed 8-bit paletted
and 24/32-bit BI_RGB, the overwhelmingly common on-disk variants.
Bottom-up and top-down row orders, 4-byte row padding, BITMAPINFOHEADER
and the larger V4/V5 headers.  Luminance output via Rec.601 integer
weights, matching the other vendored codecs.  Reference: Windows
BITMAPFILEHEADER/BITMAPINFOHEADER documentation (public)."""

from __future__ import annotations

import struct

BMP_MAGIC = b"BM"


def decode_bmp_gray(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, luminance bytes) of an uncompressed BMP."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP stream")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS(32bpp default)
        raise NotImplementedError(f"BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP")
    top_down = height < 0
    height = abs(height)

    palette: bytes = b""
    if bpp == 8:
        (n_colors,) = struct.unpack("<I", data[46:50])
        n = n_colors or 256
        pal_off = 14 + hdr_size
        palette = data[pal_off : pal_off + n * 4]  # BGRA quads

    row_bytes = (width * bpp // 8 + 3) // 4 * 4
    out = bytearray(width * height)
    for r in range(height):
        src = pix_off + r * row_bytes
        dst_row = r if top_down else height - 1 - r
        base = dst_row * width
        if bpp == 8:
            for c in range(width):
                idx = data[src + c]
                b_, g_, r_ = palette[idx * 4 : idx * 4 + 3]
                out[base + c] = (299 * r_ + 587 * g_ + 114 * b_) // 1000
        else:
            step = bpp // 8
            for c in range(width):
                b_, g_, r_ = data[src + c * step : src + c * step + 3]
                out[base + c] = (299 * r_ + 587 * g_ + 114 * b_) // 1000
    return width, height, bytes(out)


def encode_bmp_gray(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit paletted grayscale BMP (bottom-up), for tests/fixtures."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    row_bytes = (width + 3) // 4 * 4
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
    pix_off = 14 + 40 + len(pal)
    size = pix_off + row_bytes * height
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", size, 0, 0, pix_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0,
        row_bytes * height, 2835, 2835, 256, 0,
    )
    out += pal
    pad = bytes(row_bytes - width)
    for r in range(height - 1, -1, -1):
        out += pixels[r * width : (r + 1) * width] + pad
    return bytes(out)
