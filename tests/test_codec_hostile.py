"""Corrupt-input certification for every vendored codec (VERDICT r10
ask #7): zero-length, wrong-magic, truncated-at-every-byte, declared-
size-overflow, and single-bit-flipped streams must fail LOUDLY with
the documented contract — ``ValueError`` for corrupt bytes,
``NotImplementedError`` for valid-but-unsupported profiles — never a
silent partial decode, never a leaked ``IndexError`` / ``struct.error``
/ ``zlib.error`` / ``KeyError``, and never an unbounded allocation a
forged header could use to wedge an executor task.

No Spark needed: the codecs are pure functions, and the Spark-side
multimodal queries call exactly these entry points inside
mapInPandas (dataops/multimodal.py), so per-cell failure behavior is
decided here.
"""

from __future__ import annotations

import pytest

from credit_card_etl_pipeline_spark.dataops import avi, gif, jpeg, png, wav

ALLOWED = (ValueError, NotImplementedError)


def _fixtures():
    """(name, decode_fn, valid_stream) for every vendored codec, with
    multi-frame containers where the format has them."""
    px = bytes((x * 7 + 13) % 256 for x in range(16 * 12))
    frames = [px, bytes(reversed(px)), px[100:] + px[:100]]
    return [
        ("jpeg", jpeg.decode_jpeg_gray, jpeg.encode_jpeg_gray(16, 12, px)),
        ("png_gray", png.decode_png, png.encode_png(16, 12, 1, px)),
        (
            "png_rgb",
            png.decode_png,
            png.encode_png(16, 4, 3, px[: 16 * 4 * 3]),
        ),
        ("apng", png.decode_apng_frames,
         png.encode_apng(16, 12, 1, frames)),
        ("gif", gif.decode_gif_frames, gif.encode_gif(16, 12, frames)),
        ("avi", avi.decode_avi, avi.encode_avi_mjpeg(16, 12, frames)),
        ("wav", wav.decode_wav,
         wav.encode_wav(8000, [(i * 37) % 251 - 125 for i in range(64)])),
    ]


@pytest.mark.parametrize("name,fn,data", _fixtures(),
                         ids=[f[0] for f in _fixtures()])
def test_valid_stream_decodes(name, fn, data):
    """The hardening must not reject the codec's own valid output."""
    out = fn(data)
    assert out is not None


@pytest.mark.parametrize("name,fn,data", _fixtures(),
                         ids=[f[0] for f in _fixtures()])
def test_zero_length_and_wrong_magic(name, fn, data):
    for blob in (b"", b"\x00", b"\x00" * 64, b"NOTAMAGIC" + data[9:],
                 bytes(reversed(data[:16])) + data[16:]):
        with pytest.raises(ALLOWED):
            fn(blob)


@pytest.mark.parametrize("name,fn,data", _fixtures(),
                         ids=[f[0] for f in _fixtures()])
def test_truncation_at_every_byte_fails_loudly(name, fn, data):
    """data[:k] for EVERY k < len must raise the contract exceptions —
    a truncated container returning a partial frame list / sample list
    is a silent-wrong-answer bug (GIF and AVI did exactly that before
    r11)."""
    for cut in range(len(data)):
        try:
            fn(data[:cut])
        except ALLOWED:
            continue
        else:
            pytest.fail(f"{name}: silent success on {cut}-byte prefix")


@pytest.mark.parametrize("name,fn,data", _fixtures(),
                         ids=[f[0] for f in _fixtures()])
def test_single_bit_flips_never_leak_raw_exceptions(name, fn, data):
    """Flipping any single byte may legitimately still decode (pixel
    bytes are arbitrary), but whatever happens must be a clean decode
    or a contract exception — no IndexError/struct.error/zlib.error/
    KeyError escaping into a Spark task."""
    for i in range(len(data)):
        blob = bytearray(data)
        blob[i] ^= 0xFF
        try:
            fn(bytes(blob))
        except ALLOWED:
            pass  # loud, contractual


def test_forged_dimensions_raise_before_allocating():
    """A tiny stream whose header declares giant dimensions must raise
    ValueError instead of allocating the declared canvas."""
    import struct
    import zlib

    # PNG: 30000 x 30000 IHDR (9e8 pixels) with a 1-byte IDAT
    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", 30000, 30000, 8, 0, 0, 0, 0)
    bad_png = (
        png.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="implausible"):
        png.decode_png(bad_png)

    # GIF: 60000 x 60000 logical screen
    bad_gif = b"GIF89a" + struct.pack("<HH", 60000, 60000) + bytes(3) + b";"
    with pytest.raises(ValueError, match="implausible|truncated"):
        gif.decode_gif_frames(bad_gif)

    # JPEG: legit stream with the SOF dimensions forged to 65535²
    good = jpeg.encode_jpeg_gray(8, 8, bytes(range(64)))
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    forged = bytearray(good)
    forged[sof + 5 : sof + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(bytes(forged))


def test_png_compression_bomb_is_bounded():
    """An IDAT that inflates far past the header-expected size must
    raise (bounded decompress), not materialize the bomb."""
    import struct
    import zlib

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload))
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # expects 10 B
    bomb = zlib.compress(b"\x00" * 10_000_000)  # ~10 KB compressed
    data = (
        png.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="exceeds expected"):
        png.decode_png(data)


def test_gif_lzw_expansion_is_bounded():
    """LZW output is capped at the frame's declared pixel count, so a
    crafted high-expansion stream raises instead of producing O(n²)
    bytes."""
    g = bytes(gif.encode_gif(4, 4, [bytes(range(16))]))
    # decoding the valid one works
    gif.decode_gif_frames(g)
    # walk to the image descriptor (0x2C at a BLOCK boundary — a bare
    # find() would hit palette byte 44): header 13 + global color
    # table, then skip extension blocks
    pos = 13 + (2 << (g[10] & 0x07)) * 3
    while g[pos] == 0x21:  # extension: label + sub-blocks
        pos += 2
        while g[pos] != 0:
            pos += 1 + g[pos]
        pos += 1
    assert g[pos] == 0x2C
    # forge the frame dims down to 1x1 so the real 16-pixel LZW
    # payload overflows the cap
    forged = bytearray(g)
    forged[pos + 5 : pos + 9] = (1).to_bytes(2, "little") * 2
    with pytest.raises(ValueError):
        gif.decode_gif_frames(bytes(forged))


def test_wav_non_pcm_raises_not_implemented():
    """Unsupported-but-valid inputs keep their documented
    NotImplementedError (distinct from corruption)."""
    import struct

    w = bytearray(wav.encode_wav(8000, [0, 1, 2, 3]))
    fmt_off = bytes(w).find(b"fmt ") + 8
    w[fmt_off : fmt_off + 2] = struct.pack("<H", 3)  # IEEE float format
    with pytest.raises(NotImplementedError, match="audio format"):
        wav.decode_wav(bytes(w))
