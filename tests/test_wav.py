"""Vendored RIFF/WAVE PCM codec (dataops/wav.py) + real audio decode
path through the multimodal operators."""

from __future__ import annotations

import struct

import pytest

from credit_card_etl_pipeline_spark.dataops.wav import (
    WAV_MAGIC,
    decode_wav,
    encode_wav,
)


def test_roundtrip_16bit_pcm():
    samples = [((i * 37) % 2048) - 1024 for i in range(500)]
    data = encode_wav(16000, samples)
    assert data[:4] == WAV_MAGIC
    rate, channels, got = decode_wav(data)
    assert (rate, channels) == (16000, 1)
    assert got == samples


def test_roundtrip_stereo_interleaved():
    samples = [100, -100, 200, -200, 300, -300]
    data = encode_wav(44100, samples, channels=2)
    rate, channels, got = decode_wav(data)
    assert (rate, channels) == (44100, 2)
    assert got == samples


def test_8bit_and_32bit_decode():
    # hand-assembled 8-bit (unsigned) and 32-bit PCM data chunks
    def wav(bits, body, block_align, channels=1, rate=8000):
        fmt = struct.pack(
            "<HHIIHH", 1, channels, rate, rate * block_align,
            block_align, bits,
        )
        chunks = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body
        )
        return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

    _, _, s8 = decode_wav(wav(8, bytes([0, 128, 255]), 1))
    assert s8 == [-128, 0, 127]
    _, _, s32 = decode_wav(
        wav(32, struct.pack("<3i", -70000, 0, 70000), 4)
    )
    assert s32 == [-70000, 0, 70000]


def test_compressed_format_raises():
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)  # 85 = MP3
    chunks = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    data = b"RIFF" + struct.pack("<I", len(chunks)) + chunks
    with pytest.raises(NotImplementedError, match="only PCM"):
        decode_wav(data)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all")


def test_decode_audio_stats_real_path(spark):
    from credit_card_etl_pipeline_spark.dataops.multimodal import (
        decode_audio_stats,
    )

    samples = [1000, -2000, 3000, -4000]
    df = spark.createDataFrame(
        [(9, bytearray(encode_wav(22050, samples)))],
        "doc_id long, payload binary",
    )
    row = decode_audio_stats(df).collect()[0]
    assert row["sample_rate"] == 22050
    assert row["n_samples"] == 4
    assert row["peak_abs"] == 4000
    assert row["sum_abs"] == 10000
