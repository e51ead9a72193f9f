"""Vendored baseline JPEG codec (grayscale, ITU-T T.81).

Gives the multimodal operators a REAL JPEG path in a runtime without
Pillow: :func:`decode_jpeg_gray` reads baseline sequential JFIF/EXIF
grayscale images (single component, 8-bit, optional restart markers);
:func:`encode_jpeg_gray` writes them with the Annex K example
quantization/Huffman tables, so fixtures can be generated in-repo and
round-tripped in tests.

Pure numpy + stdlib; the DCT pair is the exact separable float
transform (encode ``C·B·Cᵀ``, decode ``Cᵀ·F·C``).  Color (multi-
component) JPEGs raise ``NotImplementedError`` at the exact spot a
chroma path would land — the pipeline's decode contract is luminance
anyway (see multimodal.decode_image_gray).

References (public): ITU-T T.81 Annex F (baseline entropy coding),
Annex K (example tables); JFIF 1.02 spec.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------
# Annex K example tables
# ------------------------------------------------------------------

#: Standard luminance quantization table (T.81 Table K.1), zigzag OFF
#: (natural row-major order).
QUANT_LUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

#: DC luminance Huffman spec (T.81 Table K.3): (bits per length 1..16,
#: symbol values).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))

#: AC luminance Huffman spec (T.81 Table K.5).
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: Zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
def _zigzag_order() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            # odd diagonals run top→bottom (row ascending), even ones
            # bottom→top (column ascending)
            rc[0] if (rc[0] + rc[1]) % 2 else rc[1],
        ),
    )
    return order


ZIGZAG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        alpha = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            c[u, x] = alpha * np.cos((2 * x + 1) * u * np.pi / 16)
    return c


_C = _dct_matrix()


# ------------------------------------------------------------------
# Huffman table construction (T.81 Annex C canonical codes)
# ------------------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) in canonical order."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _build_codes(bits, vals).items():
        table[(length, code)] = sym
    return table


# ------------------------------------------------------------------
# Bit IO
# ------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill per T.81 F.1.2.3


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RST markers
    are consumed transparently via :meth:`restart`."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _next_byte(self) -> int:
        while True:
            if self.pos >= len(self.data):
                # truncated stream: treat like hitting EOI so the
                # decoder keeps the blocks it has and zero-fills
                raise _MarkerHit(0xD9)
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                m = self.data[self.pos]
                if m == 0x00:
                    self.pos += 1
                    return 0xFF
                # a real marker: signal end to the caller via exception
                raise _MarkerHit(m)
            return b

    def read_bit(self) -> int:
        if self._n == 0:
            self._acc = self._next_byte()
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self._n = 0

    def consume_rst(self) -> None:
        """Skip an RSTn marker at the current (aligned) position."""
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.2.2.1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit category of a coefficient value (T.81 F.1.2.1.2)."""
    return int(abs(v)).bit_length()


# ------------------------------------------------------------------
# Encoder
# ------------------------------------------------------------------

def encode_jpeg_gray(
    width: int, height: int, pixels: bytes
) -> bytes:
    """Baseline grayscale JPEG of row-major 8-bit ``pixels``."""
    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    # pad to 8x8 multiples by edge replication
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = np.pad(
        img, ((0, ph - height), (0, pw - width)), mode="edge"
    ).astype(np.float64) - 128.0

    dc_codes = _build_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    prev_dc = 0
    q = QUANT_LUM.astype(np.float64)
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8]
            coef = _C @ block @ _C.T
            quant = np.round(coef / q).astype(np.int64)
            zz = [int(quant[r, c]) for r, c in ZIGZAG]
            # DC
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            t = _category(diff)
            code, length = dc_codes[t]
            bw.write(code, length)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            # AC with run-length + EOB/ZRL
            run = 0
            for kk in range(1, 64):
                v = zz[kk]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                t = _category(v)
                code, length = ac_codes[(run << 4) | t]
                bw.write(code, length)
                bw.write(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0
            if run:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    qt_zz = bytes(int(QUANT_LUM[r, c]) for r, c in ZIGZAG)
    out += seg(0xDB, b"\x00" + qt_zz)  # DQT table 0, 8-bit
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00",
    )  # SOF0: 1 component, no subsampling, qtable 0
    out += seg(
        0xC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS)
    )  # DHT DC 0
    out += seg(
        0xC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS)
    )  # DHT AC 0
    out += seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------
# Color encoder (4:4:4 or 4:2:0, JFIF YCbCr; for tests/fixtures)
# ------------------------------------------------------------------

def _encode_block(
    block: np.ndarray,
    q: np.ndarray,
    prev_dc: int,
    dc_codes: dict,
    ac_codes: dict,
    bw: _BitWriter,
) -> int:
    """DCT + quantize + entropy-code one 8x8 block; returns its DC."""
    coef = _C @ block @ _C.T
    quant = np.round(coef / q).astype(np.int64)
    zz = [int(quant[r, c]) for r, c in ZIGZAG]
    diff = zz[0] - prev_dc
    t = _category(diff)
    code, length = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for kk in range(1, 64):
        v = zz[kk]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        t = _category(v)
        code, length = ac_codes[(run << 4) | t]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << t) - 1, t)
        run = 0
    if run:
        code, length = ac_codes[0x00]
        bw.write(code, length)
    return zz[0]


def encode_jpeg_color(
    width: int, height: int, rgb: bytes, *, subsample: int = 2
) -> bytes:
    """Baseline color JPEG from row-major interleaved RGB bytes.

    ``subsample=1`` → 4:4:4, ``subsample=2`` → 4:2:0 (chroma box-
    averaged 2x2).  JFIF full-range BT.601 YCbCr; all three components
    share the Annex K luminance tables (spec-legal, keeps the vendored
    surface small)."""
    if subsample not in (1, 2):
        raise ValueError("subsample must be 1 (4:4:4) or 2 (4:2:0)")
    if len(rgb) != width * height * 3:
        raise ValueError("rgb must be width*height*3 bytes")
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    r = arr[:, :, 0].astype(np.float64)
    g = arr[:, :, 1].astype(np.float64)
    b = arr[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    s = subsample
    mcu_h, mcu_w = 8 * s, 8 * s
    ph = (height + mcu_h - 1) // mcu_h * mcu_h
    pw = (width + mcu_w - 1) // mcu_w * mcu_w

    def pad(plane: np.ndarray) -> np.ndarray:
        return np.pad(
            plane,
            ((0, ph - height), (0, pw - width)),
            mode="edge",
        )

    yp = pad(y) - 128.0
    if s == 2:
        # box-average 2x2 on the padded plane
        cbp = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) - 128.0
        crp = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) - 128.0
    else:
        cbp = pad(cb) - 128.0
        crp = pad(cr) - 128.0

    dc_codes = _build_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_codes = _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    bw = _BitWriter()
    q = QUANT_LUM.astype(np.float64)
    prev = [0, 0, 0]
    for my in range(0, ph, mcu_h):
        for mx in range(0, pw, mcu_w):
            # Y blocks: s*s per MCU, raster order
            for vy in range(s):
                for vx in range(s):
                    blk = yp[
                        my + vy * 8 : my + vy * 8 + 8,
                        mx + vx * 8 : mx + vx * 8 + 8,
                    ]
                    prev[0] = _encode_block(
                        blk, q, prev[0], dc_codes, ac_codes, bw
                    )
            cy, cx = my // s, mx // s
            for ci, plane in ((1, cbp), (2, crp)):
                blk = plane[cy : cy + 8, cx : cx + 8]
                prev[ci] = _encode_block(
                    blk, q, prev[ci], dc_codes, ac_codes, bw
                )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    sf = (s << 4) | s
    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    qt_zz = bytes(int(QUANT_LUM[r_, c_]) for r_, c_ in ZIGZAG)
    out += seg(0xDB, b"\x00" + qt_zz)
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, sf, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += seg(0xC4, b"\x00" + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xC4, b"\x10" + bytes(AC_LUM_BITS) + bytes(AC_LUM_VALS))
    out += seg(0xDA, b"\x03\x01\x00\x02\x00\x03\x00\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------
# Decoder (baseline sequential, 1-3 components, luma output)
# ------------------------------------------------------------------

def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, luminance bytes) of a baseline sequential JPEG.

    Accepts grayscale AND interleaved color streams (1-3 components,
    sampling factors up to 2x2 — covers 4:4:4, 4:2:2, 4:2:0), 8-bit,
    any JFIF/EXIF headers, optional restart intervals.  Output is the
    LUMINANCE plane (the Y component IS gray for JFIF YCbCr; chroma
    blocks are entropy-decoded to keep the bit stream in sync, then
    discarded without the IDCT).  Progressive / arithmetic / 12-bit
    streams raise ``NotImplementedError``.

    Corrupt-input contract (certified by tests/test_codec_hostile.py):
    zero-length / wrong-magic / truncated / bit-flipped streams raise
    ``ValueError``; valid-but-unsupported profiles raise
    ``NotImplementedError``; no other exception type escapes, and the
    output allocation is capped by an SOF dimension sanity check."""
    try:
        return _decode_jpeg_gray(data)
    except (struct.error, IndexError, OverflowError, KeyError) as e:
        # KeyError: a bit-flipped table id missing from qtables /
        # huffman decode dicts
        raise ValueError(
            f"corrupt JPEG stream: {type(e).__name__}: {e}"
        ) from e


def _decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_decode: dict[int, dict] = {}
    ac_decode: dict[int, dict] = {}
    width = height = 0
    components: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2:  # pos += 0/1 would re-read the same marker forever
            raise ValueError(f"bad JPEG segment length {seglen} at {pos}")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros((8, 8), dtype=np.int32)
                for k in range(64):
                    r, c = ZIGZAG[k]
                    tab[r, c] = body[p + k]
                p += 64
                qtables[tq] = tab
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                p += 17 + n
                if tc == 0:
                    dc_decode[th] = _build_decode(bits, vals)
                else:
                    ac_decode[th] = _build_decode(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            precision = body[0]
            height, width = struct.unpack(">HH", body[1:5])
            if not (0 < width * height <= 1 << 26):
                raise ValueError(
                    f"implausible JPEG dimensions {width}x{height} "
                    "(corrupt SOF?)"
                )
            ncomp = body[5]
            if precision != 8:
                raise NotImplementedError("non-8-bit precision")
            if ncomp > 3:
                raise NotImplementedError("more than 3 components")
            components = []
            for ci in range(ncomp):
                cid = body[6 + ci * 3]
                hv = body[7 + ci * 3]
                tq = body[8 + ci * 3]
                h_, v_ = hv >> 4, hv & 0x0F
                if not (1 <= h_ <= 2 and 1 <= v_ <= 2):
                    raise NotImplementedError(
                        f"sampling factor {h_}x{v_} out of vendored range"
                    )
                components.append((cid, h_, v_, tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "non-baseline JPEG (progressive/arithmetic)"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(components):
                raise NotImplementedError(
                    "non-interleaved multi-scan stream"
                )
            scan_tabs = {}
            for si in range(ns):
                cs = body[1 + si * 2]
                tsel = body[2 + si * 2]
                scan_tabs[cs] = (tsel >> 4, tsel & 0x0F)
            pos += seglen
            # entropy data byte-stuffs 0xFF (as FF 00 / RSTn), so a
            # raw FF D9 after SOS can only be the EOI; its absence
            # means the stream was cut mid-scan and a complete-looking
            # MCU walk must not read as success
            if b"\xff\xd9" not in data[pos:]:
                raise ValueError("truncated JPEG stream (no EOI)")
            return _decode_scan_interleaved(
                data,
                pos,
                width,
                height,
                components,
                qtables,
                dc_decode,
                ac_decode,
                scan_tabs,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _huff_read(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _entropy_block(
    br: _BitReader, dc_tab: dict, ac_tab: dict, prev_dc: int
) -> tuple[list[int], int]:
    """Entropy-decode one block's 64 zigzag coefficients."""
    zz = [0] * 64
    t = _huff_read(br, dc_tab)
    diff = _extend(br.read_bits(t), t) if t else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _huff_read(br, ac_tab)
        r, s_ = rs >> 4, rs & 0x0F
        if s_ == 0:
            if r == 15:
                k += 16
                continue
            break
        k += r
        if k > 63:
            raise ValueError("AC run overflow")
        zz[k] = _extend(br.read_bits(s_), s_)
        k += 1
    return zz, dc


def _decode_scan_interleaved(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    components: list[tuple[int, int, int, int]],
    qtables: dict[int, np.ndarray],
    dc_decode: dict[int, dict],
    ac_decode: dict[int, dict],
    scan_tabs: dict[int, tuple[int, int]],
    restart_interval: int,
) -> tuple[int, int, bytes]:
    hmax = max(h for _, h, _, _ in components)
    vmax = max(v for _, _, v, _ in components)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    # luma = first component; allocate only its plane
    cid0, h0, v0, tq0 = components[0]
    yplane = np.zeros((mcus_y * v0 * 8, mcus_x * h0 * 8), dtype=np.float64)
    q0 = qtables[tq0].astype(np.float64)

    br = _BitReader(data, pos)
    prev_dc = {cid: 0 for cid, _, _, _ in components}
    mcu = 0
    done = False
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if done:
                break
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.byte_align()
                br.consume_rst()
                for cid in prev_dc:
                    prev_dc[cid] = 0
            mcu += 1
            for idx, (cid, h_, v_, _tq) in enumerate(components):
                dct, act = scan_tabs[cid]
                dc_tab = dc_decode[dct]
                ac_tab = ac_decode[act]
                for vy in range(v_):
                    for vx in range(h_):
                        try:
                            zz, dc = _entropy_block(
                                br, dc_tab, ac_tab, prev_dc[cid]
                            )
                            prev_dc[cid] = dc
                        except _MarkerHit:
                            done = True
                            zz = None
                        if idx == 0 and zz is not None:
                            coef = np.zeros((8, 8), dtype=np.float64)
                            for k in range(64):
                                r, c = ZIGZAG[k]
                                coef[r, c] = zz[k]
                            block = _C.T @ (coef * q0) @ _C
                            by = (my * v0 + vy) * 8
                            bx = (mx * h0 + vx) * 8
                            yplane[by : by + 8, bx : bx + 8] = block
                        if done:
                            break
                    if done:
                        break
                if done:
                    break

    pixels = np.clip(np.round(yplane + 128.0), 0, 255).astype(np.uint8)
    if h0 == hmax and v0 == vmax:
        full = pixels
    else:  # luma subsampled (unusual): nearest-neighbour upsample
        full = np.repeat(
            np.repeat(pixels, vmax // v0, axis=0), hmax // h0, axis=1
        )
    return width, height, full[:height, :width].tobytes()
