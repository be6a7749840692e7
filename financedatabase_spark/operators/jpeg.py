"""Pure-stdlib baseline JPEG codec for the multimodal decode seam.

The container has no Pillow, so non-PNG images were a documented
NotImplementedError seam. This module closes the dominant real-world
format: a spec-valid baseline-DCT JPEG (ITU-T T.81) encoder for
deterministic fixtures and a full decoder — marker parse (SOI/APP/DQT/
DHT/SOF0/SOS/EOI), canonical Huffman decode with 0xFF00 byte
un-stuffing, per-position dequantization, de-zigzag, separable 8x8
IDCT, level shift and clamp. Grayscale (one component) only; 3-component
YCbCr, progressive (SOF2) and restart intervals stay documented
NotImplementedError seams, mirroring the PNG codec's depth gates.

Fixture exactness: JPEG is lossy in general, but the fixtures are built
from coefficient patterns whose IDCT is integral — constant blocks
(DC-only) and a ±1 horizontal basis (the u=4 row-frequency whose
cos((2x+1)·4π/16) values are ±√2/2, so a coefficient of 8d contributes
exactly ±d per pixel). Decode therefore reproduces the synthesis
formula bit-for-bit, which is what lets the DuckDB oracle recompute the
histogram analytically (see plans/queries_documents.py
`multimodal_jpeg_features`).

Reference parity: the reference has no image path (media are opaque
payloads, FinanceDatabase/db/handlers/media_handler.py routes bytes
unparsed); this is the brief's LLM-pipeline image stage, not a port.
"""

from __future__ import annotations

import math
import struct

# -- constants (ITU-T T.81 Annex K: public spec tables) ----------------------

#: zigzag index -> raster index (row*8 + col)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K luminance DC table: (#codes per length 1..16, symbol list)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

#: Annex K luminance AC table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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
assert sum(DC_BITS) == len(DC_VALS)
assert sum(AC_BITS) == len(AC_VALS) == 162

#: IDCT basis: COS[u][x] = cos((2x+1)uπ/16), C[u] = 1/√2 for u=0 else 1
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical Huffman per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)


# -- encoder (fixture synthesis) ---------------------------------------------


class _BitWriter:
    """MSB-first bit packer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc, self._n = 0, 0

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self._acc = (self._acc << pad) | ((1 << pad) - 1)
            self.out.append(self._acc)
            if self._acc == 0xFF:
                self.out.append(0x00)
            self._acc, self._n = 0, 0
        return bytes(self.out)


def _mag_bits(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC value (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    return size, v if v > 0 else v + (1 << size) - 1


def _encode_scan(blocks_zz: list[list[int]]) -> bytes:
    """Entropy-encode quantized coefficient blocks (zigzag order) with
    the Annex K luminance tables: DC prediction + category/bits, AC
    run-length with ZRL and EOB."""
    w = _BitWriter()
    pred = 0
    for bz in blocks_zz:
        size, bits = _mag_bits(bz[0] - pred)
        pred = bz[0]
        code, length = _DC_ENC[size]
        w.put(code, length)
        if size:
            w.put(bits, size)
        last_nz = 0
        for i in range(63, 0, -1):
            if bz[i]:
                last_nz = i
                break
        run = 0
        for i in range(1, last_nz + 1):
            if bz[i] == 0:
                run += 1
                continue
            while run >= 16:
                code, length = _AC_ENC[0xF0]  # ZRL
                w.put(code, length)
                run -= 16
            size, bits = _mag_bits(bz[i])
            code, length = _AC_ENC[(run << 4) | size]
            w.put(code, length)
            w.put(bits, size)
            run = 0
        if last_nz != 63:
            code, length = _AC_ENC[0x00]  # EOB
            w.put(code, length)
    return w.flush()


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def assemble_jpeg(w: int, h: int, qt_zz: list[int], blocks_zz: list[list[int]]) -> bytes:
    """Assemble a complete spec-valid grayscale baseline JPEG from a
    zigzag quant table and per-block quantized coefficients (blocks in
    raster MCU order, ceil(w/8)*ceil(h/8) of them)."""
    app0 = b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
    dqt = bytes([0x00]) + bytes(qt_zz)  # Pq=0 (8-bit), Tq=0
    sof0 = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    dht_ac = bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + _seg(0xFFE0, app0)
        + _seg(0xFFDB, dqt)
        + _seg(0xFFC0, sof0)
        + _seg(0xFFC4, dht_dc)
        + _seg(0xFFC4, dht_ac)
        + _seg(0xFFDA, sos)
        + _encode_scan(blocks_zz)
        + b"\xff\xd9"
    )


#: Fixture quant table (zigzag order): 8 at the two coefficient positions
#: the fixtures use (DC and zigzag 14 = raster (0,4)), varied elsewhere so
#: a decoder that mis-maps the table to positions cannot round-trip.
_FIXTURE_QT = [10 + (i * 7) % 50 for i in range(64)]
_FIXTURE_QT[0] = 8
_FIXTURE_QT[14] = 8

#: ±1 per-pixel sign of the u=4 horizontal basis: cos((2x+1)π/4) signs.
_U4_SIGN = [1, -1, -1, 1, 1, -1, -1, 1]

JPEG_H = 16


def synth_jpeg(doc_id: int) -> bytes:
    """Deterministic JPEG fixture: real baseline grayscale JPEG, width
    16/24/32 by doc (geometry must come from SOF0), height 16. Block
    (bx, by) has base value v = (doc_id*17 + by*31 + bx*7) % 251 + 2;
    blocks in the second block-row add an exact ±d ripple (d =
    (doc_id + bx) % 5 - 2) through the u=4 AC basis, so every fixture
    exercises DC prediction across blocks, mid-run AC coding (13 zeros
    before zigzag 14), negative-coefficient bit encoding, and
    dequantization — while pixel(x, y) stays an integer formula the
    oracle can recompute:

        v               for y < 8
        v + d*s(x % 8)  for y >= 8, s = [+,-,-,+,+,-,-,+]
    """
    doc_id = int(doc_id)
    w, h = 16 + (doc_id % 3) * 8, JPEG_H
    blocks = []
    for by in range(h // 8):
        for bx in range(w // 8):
            v = (doc_id * 17 + by * 31 + bx * 7) % 251 + 2
            bz = [0] * 64
            bz[0] = v - 128  # DC quantized by 8: 8*(v-128)/8
            if by == 1:
                bz[14] = (doc_id + bx) % 5 - 2  # dequantizes to 8d
            blocks.append(bz)
    return assemble_jpeg(w, h, _FIXTURE_QT, blocks)


# -- decoder -----------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy data with 0xFF00 un-stuffing;
    stops at any non-stuffed marker (EOI ends the scan)."""

    def __init__(self, raw: bytes, pos: int) -> None:
        self.raw = raw
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.raw):
                raise ValueError("JPEG entropy stream truncated")
            b = self.raw[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.raw[self.pos] if self.pos < len(self.raw) else 0xD9
                if nxt == 0x00:
                    self.pos += 1
                elif 0xD0 <= nxt <= 0xD7:
                    raise NotImplementedError("JPEG restart markers not supported")
                else:
                    raise ValueError("JPEG scan ended before all blocks decoded")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


class _HuffDec:
    """Canonical Huffman decoder from a DHT (bits, values) spec: per-
    length first-code/first-index tables (T.81 F.2.2.3 DECODE)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = r.bit()
        for length in range(1, 17):
            if code <= self.maxcode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
            code = (code << 1) | r.bit()
        raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    """Map `size` appended bits to a signed value (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _idct_block(coef: list[int]) -> list[int]:
    """Separable 8x8 inverse DCT on raster-order dequantized
    coefficients; returns 64 level-shifted clamped pixels."""
    tmp = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        row = coef[v * 8:(v + 1) * 8]
        if not any(row):
            continue
        for x in range(8):
            s = 0.0
            for u in range(8):
                if row[u]:
                    s += _C[u] * row[u] * _COS[u][x]
            tmp[v][x] = s
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                if tmp[v][x]:
                    s += _C[v] * tmp[v][x] * _COS[v][y]
            p = round(s / 4) + 128
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def jpeg_pixels(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a grayscale baseline JPEG to (width, height, row-major
    pixels). Raises NotImplementedError on the documented seams
    (progressive, multi-component, 16-bit quant, restart intervals) and
    ValueError on malformed streams."""
    raw = bytes(payload)
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, list[int]] = {}
    dcs: dict[int, _HuffDec] = {}
    acs: dict[int, _HuffDec] = {}
    w = h = 0
    comp_qt = 0
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = raw[pos + 1]
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential DCT (SOF0) supported, got SOF marker 0xFF{marker:02X}"
            )
        if marker == 0xDD:
            raise NotImplementedError("JPEG restart intervals (DRI) not supported")
        (seglen,) = struct.unpack_from(">H", raw, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(raw):
            raise ValueError("JPEG segment truncated (declared length exceeds stream)")
        body = raw[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables not supported")
                if off + 65 > len(body):
                    raise ValueError("JPEG DQT truncated (needs 64 table entries)")
                qts[tq] = list(body[off + 1:off + 65])
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                if off + 17 > len(body):
                    raise ValueError("JPEG DHT truncated (needs 16 length counts)")
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1:off + 17])
                n = sum(bits)
                if off + 17 + n > len(body):
                    raise ValueError("JPEG DHT truncated (value list short)")
                vals = list(body[off + 17:off + 17 + n])
                (dcs if tc == 0 else acs)[th] = _HuffDec(bits, vals)
                off += 17 + n
        elif marker == 0xC0:  # SOF0
            if len(body) < 9:
                raise ValueError("JPEG SOF0 truncated")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG samples supported")
            if ncomp != 1:
                raise NotImplementedError(
                    f"only grayscale (1-component) JPEG supported, got {ncomp} components"
                )
            if body[7] != 0x11:
                raise NotImplementedError("subsampled JPEG not supported")
            comp_qt = body[8]
        elif marker == 0xDA:  # SOS
            if len(body) < 6:
                raise ValueError("JPEG SOS truncated")
            if not (w and h):
                raise ValueError("JPEG SOS before SOF0")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            if comp_qt not in qts or dc_id not in dcs or ac_id not in acs:
                raise ValueError(
                    "JPEG SOS references undefined quant/Huffman table"
                )
            qt = qts[comp_qt]
            dec_dc, dec_ac = dcs[dc_id], acs[ac_id]
            r = _BitReader(raw, pos + 2 + seglen)
            bw, bh = (w + 7) // 8, (h + 7) // 8
            pred = 0
            img = [[0] * (bw * 8) for _ in range(bh * 8)]
            for by in range(bh):
                for bx in range(bw):
                    size = dec_dc.decode(r)
                    pred += _extend(r.bits(size), size)
                    zz = [0] * 64
                    zz[0] = pred * qt[0]
                    k = 1
                    while k < 64:
                        rs = dec_ac.decode(r)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overrun")
                        zz[k] = _extend(r.bits(rs & 0xF), rs & 0xF) * qt[k]
                        k += 1
                    coef = [0] * 64
                    for zi, ri in enumerate(ZIGZAG):
                        coef[ri] = zz[zi]
                    px = _idct_block(coef)
                    for y in range(8):
                        row = img[by * 8 + y]
                        row[bx * 8:bx * 8 + 8] = px[y * 8:y * 8 + 8]
            flat: list[int] = []
            for y in range(h):
                flat.extend(img[y][:w])
            return w, h, flat
        pos += 2 + seglen
    raise ValueError("JPEG has no scan (missing SOS)")


def jpeg_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Image codec for the `decode_features` seam: decode a grayscale
    baseline JPEG and emit the same normalized ``dim``-bin luminance
    histogram as `png_decode`/`pil_decode` (integer bin math, int/int
    division — bit-stable across engines)."""
    w, h, px = jpeg_pixels(payload)
    counts = [0] * dim
    for v in px:
        counts[v * dim // 256] += 1
    n = max(len(px), 1)
    return [c / n for c in counts]
