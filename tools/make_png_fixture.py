#!/usr/bin/env python
"""Regenerate the committed PNG test fixtures.

Two real PNG files exercised by tests/test_png.py through the REAL
(non-fake) multimodal decode path:

* ``gradient_gray.png``  — 32x24 grayscale, pixel = (3*x + 5*y) % 256
* ``gradient_rgb.png``   — 16x16 RGB, channel ramps

The encoder cycles the scanline filter (row % 5), so decoding these
exercises every PNG filter-reconstruction branch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from credit_card_etl_pipeline_spark.dataops.png import encode_png

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
)


def gray_pixels(w: int = 32, h: int = 24) -> bytes:
    return bytes((3 * x + 5 * y) % 256 for y in range(h) for x in range(w))


def rgb_pixels(w: int = 16, h: int = 16) -> bytes:
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes(((x * 16) % 256, (y * 16) % 256, (x * y) % 256))
    return bytes(out)


def main() -> None:
    p1 = os.path.join(FIXTURES, "gradient_gray.png")
    with open(p1, "wb") as f:
        f.write(encode_png(32, 24, 1, gray_pixels()))
    p2 = os.path.join(FIXTURES, "gradient_rgb.png")
    with open(p2, "wb") as f:
        f.write(encode_png(16, 16, 3, rgb_pixels()))
    for p in (p1, p2):
        print(f"wrote {p} ({os.path.getsize(p)} bytes)")


if __name__ == "__main__":
    main()
