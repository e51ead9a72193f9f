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
# Decoder
# ------------------------------------------------------------------

def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, luminance bytes) of a baseline grayscale JPEG.

    Accepts single-component baseline sequential images (8-bit, any
    JFIF/EXIF headers, optional restart intervals); multi-component
    (color) or progressive streams raise ``NotImplementedError``."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_decode: dict[int, dict] = {}
    ac_decode: dict[int, dict] = {}
    width = height = 0
    comp_q = comp_dc = comp_ac = 0
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
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
        elif marker == 0xC4:  # DHT
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = body[0]
            height, width = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            if precision != 8:
                raise NotImplementedError("non-8-bit precision")
            if ncomp != 1:
                raise NotImplementedError(
                    "color JPEG decode not vendored (grayscale only)"
                )
            sampling = body[7]
            if sampling != 0x11:
                raise NotImplementedError("subsampled single component")
            comp_q = body[8]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG (progressive?)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan")
            comp_dc = body[2] >> 4
            comp_ac = body[2] & 0x0F
            pos += seglen
            return _decode_scan(
                data,
                pos,
                width,
                height,
                qtables[comp_q],
                dc_decode[comp_dc],
                ac_decode[comp_ac],
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


def _decode_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    qtab: np.ndarray,
    dc_tab: dict,
    ac_tab: dict,
    restart_interval: int,
) -> tuple[int, int, bytes]:
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    br = _BitReader(data, pos)
    prev_dc = 0
    qf = qtab.astype(np.float64)
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.byte_align()
                br.consume_rst()
                prev_dc = 0
            mcu += 1
            zz = [0] * 64
            try:
                t = _huff_read(br, dc_tab)
                diff = _extend(br.read_bits(t), t) if t else 0
                prev_dc += diff
                zz[0] = prev_dc
                k = 1
                while k < 64:
                    rs = _huff_read(br, ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run overflow")
                    zz[k] = _extend(br.read_bits(s), s)
                    k += 1
            except _MarkerHit:
                pass  # truncated stream: remaining blocks stay zero
            coef = np.zeros((8, 8), dtype=np.float64)
            for k in range(64):
                r, c = ZIGZAG[k]
                coef[r, c] = zz[k]
            block = _C.T @ (coef * qf) @ _C
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    pixels = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
    return width, height, pixels[:height, :width].tobytes()
