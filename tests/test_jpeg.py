"""Unit tests for the vendored baseline JPEG codec (dataops/jpeg.py):
zigzag order, roundtrip error bounds, odd dimensions, honest failure
on unsupported streams, and the multimodal decode-branch routing."""

from __future__ import annotations

import numpy as np
import pytest

from credit_card_etl_pipeline_spark.dataops.jpeg import (
    ZIGZAG,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def test_zigzag_is_the_standard_sequence():
    assert ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert len(set(ZIGZAG)) == 64


def test_roundtrip_smooth_image_tight_bound():
    h, w = 40, 56
    img = np.clip(
        np.linspace(0, 255, w)[None, :] * 0.7
        + np.linspace(0, 60, h)[:, None],
        0,
        255,
    ).astype(np.uint8)
    data = encode_jpeg_gray(w, h, img.tobytes())
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    w2, h2, px = decode_jpeg_gray(data)
    assert (w2, h2) == (w, h)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 8


def test_roundtrip_odd_dimensions_pad_cropped():
    # 13x9: neither dimension a multiple of 8 — padding must not leak
    rng = np.random.RandomState(3)
    img = (rng.rand(9, 13) * 40 + 100).astype(np.uint8)  # low contrast
    data = encode_jpeg_gray(13, 9, img.tobytes())
    w, h, px = decode_jpeg_gray(data)
    assert (w, h) == (13, 9)
    assert len(px) == 13 * 9


def test_roundtrip_noise_bounded_by_quant_tables():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    data = encode_jpeg_gray(16, 16, img.tobytes())
    _, _, px = decode_jpeg_gray(data)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(16, 16)
    # worst-case error for white noise stays far from catastrophic
    assert np.abs(dec.astype(int) - img.astype(int)).max() < 128
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 40


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x89PNG\r\n\x1a\n")


def _rgb_gradient(h, w):
    r = np.clip(np.linspace(20, 235, w)[None, :] * np.ones((h, 1)), 0, 255)
    g = np.clip(np.linspace(30, 200, h)[:, None] * np.ones((1, w)), 0, 255)
    b = np.full((h, w), 96.0)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _luma(rgb):
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    return 0.299 * r + 0.587 * g + 0.114 * b


@pytest.mark.parametrize("subsample", [1, 2])
def test_color_roundtrip_extracts_luma(subsample):
    from credit_card_etl_pipeline_spark.dataops.jpeg import (
        encode_jpeg_color,
    )

    h, w = 24, 40
    rgb = _rgb_gradient(h, w)
    data = encode_jpeg_color(w, h, rgb.tobytes(), subsample=subsample)
    w2, h2, px = decode_jpeg_gray(data)
    assert (w2, h2) == (w, h)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    err = np.abs(dec.astype(float) - _luma(rgb))
    # smooth gradient: decoded Y must track BT.601 luma closely even
    # through 4:2:0 chroma interleaving (which only has to keep the
    # bit stream in sync)
    assert err.max() <= 8, err.max()


def test_color_420_odd_dims():
    from credit_card_etl_pipeline_spark.dataops.jpeg import (
        encode_jpeg_color,
    )

    h, w = 19, 21  # not multiples of the 16x16 MCU
    rgb = _rgb_gradient(h, w)
    data = encode_jpeg_color(w, h, rgb.tobytes(), subsample=2)
    w2, h2, px = decode_jpeg_gray(data)
    assert (w2, h2) == (w, h)
    assert len(px) == w * h


def test_truncated_stream_raises():
    """Pre-r11 the decoder tolerantly returned prefix blocks from a
    cut stream; the corrupt-input contract (VERDICT r10 ask #7,
    tests/test_codec_hostile.py) makes EVERY truncation loud — a
    partial decode read as success hides corruption in a media
    corpus."""
    import pytest

    img = np.full((16, 16), 90, dtype=np.uint8)
    data = encode_jpeg_gray(16, 16, img.tobytes())
    # chop the tail (drop EOI and some entropy bytes)
    with pytest.raises(ValueError, match="EOI|corrupt"):
        decode_jpeg_gray(data[:-6])


def test_multimodal_routes_jpeg_magic():
    from credit_card_etl_pipeline_spark.dataops.multimodal import (
        decode_image_gray,
    )

    img = np.full((8, 8), 200, dtype=np.uint8)
    data = encode_jpeg_gray(8, 8, img.tobytes())
    w, h, gray = decode_image_gray(data)
    assert (w, h) == (8, 8)
    assert abs(gray[0] - 200) <= 4


# ------------------------------------------------------------------
# Property-based coverage (hypothesis)
# ------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_any_size_gray_roundtrips_with_bounded_error(w, h, seed):
    rng = np.random.RandomState(seed)
    # low-contrast random field: quantization error stays modest
    img = (rng.rand(h, w) * 60 + 90).astype(np.uint8)
    data = encode_jpeg_gray(w, h, img.tobytes())
    w2, h2, px = decode_jpeg_gray(data)
    assert (w2, h2) == (w, h)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    # worst-case quant step in the Annex K table is 121 -> error
    # can reach ~60 on adversarial high-frequency content
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 70


@settings(max_examples=30, deadline=None)
@given(cut=st.integers(1, 60), seed=st.integers(0, 1000))
def test_truncation_never_crashes_or_misreports_dims(cut, seed):
    rng = np.random.RandomState(seed)
    img = (rng.rand(16, 16) * 255).astype(np.uint8)
    data = encode_jpeg_gray(16, 16, img.tobytes())
    chopped = data[: max(2, len(data) - cut)]
    try:
        w, h, px = decode_jpeg_gray(chopped)
    except (ValueError, NotImplementedError):
        return  # honest parse failure is fine; hangs/crashes are not
    assert (w, h) == (16, 16)
    assert len(px) == 256
