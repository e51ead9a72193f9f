"""Unit tests for the vendored GIF codec (dataops/gif.py): LZW
roundtrips, interlacing, disposal/compositing, table-overflow, and
multimodal routing."""

from __future__ import annotations

import random
import struct

import pytest

from credit_card_etl_pipeline_spark.dataops.gif import (
    GIF_MAGICS,
    _lzw_decode,
    _lzw_encode,
    decode_gif_frames,
    encode_gif,
)


def test_lzw_roundtrip_random_streams():
    rng = random.Random(9)
    for _ in range(20):
        payload = bytes(
            rng.randrange(256) for _ in range(rng.randrange(0, 4000))
        )
        assert _lzw_decode(_lzw_encode(payload, 8), 8) == payload


def test_animation_roundtrip_pixel_exact():
    w, h = 10, 7
    frames = [
        bytes((f * 40 + i) % 256 for i in range(w * h)) for f in range(3)
    ]
    data = encode_gif(w, h, frames)
    assert data[:6] in GIF_MAGICS
    dec = decode_gif_frames(data)
    assert [px for _, _, px in dec] == frames
    assert all((dw, dh) == (w, h) for dw, dh, _ in dec)


def test_interlaced_frame_deinterlaces():
    w, h = 9, 13
    frame = bytes((i * 7) % 256 for i in range(w * h))
    data = encode_gif(w, h, [frame], interlace_first=True)
    assert decode_gif_frames(data)[0][2] == frame


def test_lzw_table_overflow_emits_clear_and_survives():
    rng = random.Random(1)
    big = bytes(rng.randrange(256) for _ in range(120 * 90))
    data = encode_gif(120, 90, [big])
    assert decode_gif_frames(data)[0][2] == big


def test_transparency_composites_over_previous_frame():
    # hand-build: frame 1 full, frame 2 transparent except one pixel
    w, h = 4, 1
    base = encode_gif(w, h, [bytes([10, 20, 30, 40])])
    # append a second image block with transparency on index 0
    trailer_at = len(base) - 1
    out = bytearray(base[:trailer_at])
    out += bytes([0x21, 0xF9, 4, 0x05, 0, 0, 0, 0])  # GCE transp idx 0
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([0])
    out += bytes([8])
    lzw = _lzw_encode(bytes([0, 0, 99, 0]), 8)
    out += bytes([len(lzw)]) + lzw + bytes([0])
    out += bytes([0x3B])
    frames = decode_gif_frames(bytes(out))
    assert len(frames) == 2
    # transparent pixels keep frame-1 values; pixel 2 overwritten
    assert frames[1][2] == bytes([10, 20, 99, 40])


def test_not_a_gif_raises():
    with pytest.raises(ValueError):
        decode_gif_frames(b"NOTAGIF")


def test_multimodal_routes_gif_magic_and_samples_frames(spark):
    import pandas as pd

    from credit_card_etl_pipeline_spark.dataops.multimodal import (
        decode_image_gray,
        sample_frames,
    )

    frames = [bytes((f * 3 + i) % 256 for i in range(16)) for f in range(5)]
    data = encode_gif(4, 4, frames)
    w, h, gray = decode_image_gray(data)
    assert (w, h, gray) == (4, 4, frames[0])

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [data]})
    )
    got = {
        r["frame_no"]: bytes(r["frame"])
        for r in sample_frames(df, every=2, fake=False).collect()
    }
    assert set(got) == {0, 2, 4}
    assert got[2] == frames[2]


def test_bmp_roundtrip_and_routing():
    from credit_card_etl_pipeline_spark.dataops.bmp import (
        decode_bmp_gray,
        encode_bmp_gray,
    )
    from credit_card_etl_pipeline_spark.dataops.multimodal import (
        decode_image_gray,
    )

    # odd width exercises 4-byte row padding
    px = bytes((i * 7) % 256 for i in range(13 * 5))
    data = encode_bmp_gray(13, 5, px)
    assert decode_bmp_gray(data) == (13, 5, px)
    assert decode_image_gray(data) == (13, 5, px)

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        # RLE8-compressed BMPs have no vendored path
        import struct

        bad = bytearray(data)
        bad[30:34] = struct.pack("<I", 1)
        decode_bmp_gray(bytes(bad))
