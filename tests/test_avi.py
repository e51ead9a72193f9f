"""AVI/MJPEG container codec (dataops/avi.py) and its sample_frames
routing: byte-exact frame extraction (the container is lossless even
though JPEG inside is not), header parsing, rec-list descent, and the
honest non-MJPEG boundary."""

from __future__ import annotations

import struct

import pytest

from credit_card_etl_pipeline_spark.dataops import avi, jpeg


def _mk_frames(n=6, W=24, H=16):
    return [
        jpeg.encode_jpeg_gray(
            W,
            H,
            bytes(
                min(255, f * 8 + r * 3 + c * 2)
                for r in range(H)
                for c in range(W)
            ),
        )
        for f in range(n)
    ]


def test_avi_roundtrip_byte_exact():
    frames = _mk_frames()
    data = avi.encode_avi_mjpeg(24, 16, frames)
    w, h, out = avi.decode_avi(data)
    assert (w, h) == (24, 16)
    assert out == frames  # container extraction is lossless


def test_avi_rec_list_descent():
    # players group interleaved chunks in 'rec ' lists — the decoder
    # must descend into them
    frames = _mk_frames(2)
    plain = avi.encode_avi_mjpeg(24, 16, frames)
    # rebuild the movi body with both frames wrapped in one rec list
    inner = b"".join(avi._chunk(b"00dc", f) for f in frames)
    rec = avi._chunk(b"LIST", b"rec " + inner)
    movi = avi._chunk(b"LIST", b"movi" + rec)
    # splice: keep hdrl from the plain file, swap the movi list, drop
    # idx1 (the decoder must not require the index)
    off = 12
    out = b"AVI "
    while off + 8 <= len(plain):
        cid = plain[off : off + 4]
        size = struct.unpack_from("<I", plain, off + 4)[0]
        whole = plain[off : off + 8 + size + (size & 1)]
        if cid == b"LIST" and plain[off + 8 : off + 12] == b"movi":
            out += movi
        elif cid == b"idx1":
            pass
        else:
            out += whole
        off += 8 + size + (size & 1)
    data = b"RIFF" + struct.pack("<I", len(out)) + out
    w, h, got = avi.decode_avi(data)
    assert (w, h) == (24, 16)
    assert got == frames


def test_avi_rejects_non_mjpeg():
    frames = _mk_frames(1)
    data = bytearray(avi.encode_avi_mjpeg(24, 16, frames))
    # biCompression lives 16 bytes into the strf body (after the
    # 8-byte chunk header); the earlier MJPG hit is strh's fccHandler
    i = bytes(data).find(b"strf") + 8 + 16
    assert data[i : i + 4] == b"MJPG"
    data[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        avi.decode_avi(bytes(data))


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        avi.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_sample_frames_real_avi_path(spark):
    from credit_card_etl_pipeline_spark.dataops.multimodal import (
        decode_image_gray,
        sample_frames,
    )

    frames = _mk_frames(6)
    df = spark.createDataFrame(
        [(7, bytearray(avi.encode_avi_mjpeg(24, 16, frames)))],
        "doc_id long, payload binary",
    )
    got = {
        r["frame_no"]: bytes(r["frame"])
        for r in sample_frames(df, every=4, fake=False).collect()
    }
    assert set(got) == {0, 4}
    # the Spark path must emit exactly what a local decode emits
    for fno in (0, 4):
        _, _, gray = decode_image_gray(frames[fno])
        assert got[fno] == gray
