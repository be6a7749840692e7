"""JPEG arithmetic entropy coding — T.81 Annex D QM-coder plus the
Annex F sequential DC/AC conditioning, pure stdlib.

This closes the last big image-codec seam: frames marked SOF9 (extended
sequential DCT, arithmetic coding) and SOF10 (PROGRESSIVE DCT,
arithmetic coding — the Annex G scan taxonomy via the progressive
stage coders at the bottom of this module) decode for real. Everything here is
from the PUBLIC standard: the probability-estimation state machine is
ITU-T T.81 Table D.3 (the 113-state Qe ladder plus the non-adaptive
state used for AC signs), the decoder is the Annex D flowcharts
(INITDEC/DECODE/renormalization with the byte-stuffing and
marker-means-zero-data conventions of D.2.6), and the statistical
models are Annex F's: Table F.4 for DC (49 bins — 5 conditioning
categories from the previous diff classified by the DAC marker's L/U
bounds, a magnitude-category ladder X1.. and shared mantissa bins) and
Table F.5 for AC (245 bins — per-index EOB/significance/size decisions,
two magnitude ladders split at the DAC Kx bound, signs coded with the
fixed equiprobable state). Register conventions (16-bit A, the C layout
with byte extraction at bit 19, ct counters) follow the standard's
software-oriented form, the same one every public implementation uses.

The ENCODER here exists for fixtures (`operators/jpeg.py` assembles
arithmetic variants of the standard synth images) and implements
D.1 with direct carry propagation into the emitted byte list (the
equivalent of the spec's stacked-0xFF bookkeeping) and the D.1.8
flush. Conformance is NOT self-certified: the test suite cross-checks
both directions against an independent implementation — libjpeg via
two small C helpers compiled at test time (this encoder's streams
decoded by libjpeg, libjpeg's arithmetic streams decoded by this
decoder) — so the state table and register discipline are validated
against a real codec, not just against themselves.

Reference parity: the reference has no media path at all (media are
opaque payloads); this extends the LLM-pipeline image tier the same
way the Huffman/progressive/lossless decoders in jpeg.py do.
"""

from __future__ import annotations

#: T.81 Table D.3 — Qe value and probability estimation state machine:
#: (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS). Index 113 is the
#: non-adaptive equiprobable state (AC sign coding, F.1.4.4.1.3).
QM_TABLE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]

#: statistics bank sizes — Annex F Tables F.4 / F.5 and Annex H Table H.2
DC_STAT_BINS = 49
AC_STAT_BINS = 245
LL_STAT_BINS = 158


class ArithDecoder:
    """Annex D arithmetic decoder over an entropy-coded segment.

    Statistics live OUTSIDE the decoder (bytearrays of "statistics
    bytes": low 7 bits = Table D.3 index, high bit = current MPS sense)
    so one register set serves every context bank. Byte feed follows
    D.2.6: a stuffed 0x00 after 0xFF is discarded; any real marker
    stops consumption and supplies zero bytes from then on (legal in
    arithmetic coding — the tail needs no more data). ``self.pos``
    always points at the unconsumed suffix; when a marker terminated
    the feed, at the marker's 0xFF."""

    def __init__(self, raw: bytes, pos: int) -> None:
        self.raw = raw
        self.pos = pos
        self.marker_pos: int | None = None
        self.c = 0
        self.a = 0
        self.ct = -16  # two initial bytes are fetched by the first decode

    def _byte(self) -> int:
        if self.marker_pos is not None:
            return 0  # past the marker: supply zero data (D.2.6)
        raw = self.raw
        if self.pos >= len(raw):
            self.marker_pos = self.pos
            return 0
        b = raw[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        # 0xFF: stuffed zero -> data byte 0xFF; anything else is a marker
        nxt = raw[self.pos + 1] if self.pos + 1 < len(raw) else None
        if nxt == 0x00:
            self.pos += 2
            return 0xFF
        self.marker_pos = self.pos
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        """Decode one binary decision against statistics byte st[i]."""
        # renormalize / feed (D.2.6 RENORMD; includes INITDEC's fill)
        a, c, ct = self.a, self.c, self.ct
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                c = (c << 8) | self._byte()
                ct += 8
                if ct < 0:
                    ct += 1
                    if ct == 0:
                        a = 0x8000  # two initial bytes in: A = 1.0 after <<
            a <<= 1
        sv = st[i]
        qe, nm, nl, sw = QM_TABLE[sv & 0x7F]
        # DECODE (D.2.4) with conditional exchange (D.2.5)
        a -= qe
        temp = a << ct
        if c >= temp:
            c -= temp
            if a < qe:
                st[i] = (sv & 0x80) | nm
            else:
                st[i] = ((sv & 0x80) ^ (sw << 7)) | nl
                sv ^= 0x80
            a = qe
        elif a < 0x8000:
            if a < qe:
                st[i] = ((sv & 0x80) ^ (sw << 7)) | nl
                sv ^= 0x80
            else:
                st[i] = (sv & 0x80) | nm
        self.a, self.c, self.ct = a, c, ct
        return sv >> 7

    def restart(self) -> None:
        """Re-init the registers after a restart marker was consumed by
        the caller (statistics resets are the caller's job too)."""
        self.marker_pos = None
        self.c = 0
        self.a = 0
        self.ct = -16

    def marker_start(self) -> int:
        """Position of the marker that terminated (or will terminate)
        the entropy segment: scan forward from the unconsumed suffix."""
        p = self.marker_pos if self.marker_pos is not None else self.pos
        raw = self.raw
        while p + 1 < len(raw) and not (raw[p] == 0xFF and raw[p + 1] != 0x00):
            p += 1
        return p


class ArithEncoder:
    """Annex D arithmetic encoder (fixture assembly). Carry propagation
    runs directly through the emitted byte list — the functional
    equivalent of D.1's stacked-0xFF bookkeeping — and `finish` applies
    the D.1.8 flush plus the 0xFF -> 0xFF 0x00 stuffing pass."""

    def __init__(self) -> None:
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.out = bytearray()

    def _carry(self) -> None:
        i = len(self.out) - 1
        while True:
            if i < 0:
                raise ValueError("arithmetic encoder carry past stream start")
            if self.out[i] == 0xFF:
                self.out[i] = 0x00
                i -= 1
            else:
                self.out[i] += 1
                return

    def encode(self, st: bytearray, i: int, val: int) -> None:
        sv = st[i]
        qe, nm, nl, sw = QM_TABLE[sv & 0x7F]
        self.a -= qe
        if val != (sv >> 7):
            # LPS path (D.1.4) with conditional exchange
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[i] = ((sv & 0x80) ^ (sw << 7)) | nl
        else:
            # MPS path
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) | nm
        while True:  # RENORME (D.1.6) with byte out at bit 19
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                byte = self.c >> 19
                if byte > 0xFF:
                    self._carry()
                    byte &= 0xFF
                self.out.append(byte)
                self.c &= 0x7FFFF
                self.ct = 8
            if self.a >= 0x8000:
                return

    def finish(self) -> bytes:
        """D.1.8 flush, then marker-safe 0xFF stuffing."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            self._carry()
            self.c &= 0x7FFFFFF
        self.out.append((self.c >> 19) & 0xFF)
        self.out.append((self.c >> 11) & 0xFF)
        while self.out and self.out[-1] == 0x00:
            self.out.pop()  # trailing zeros are supplied by the decoder
        stuffed = bytearray()
        for b in self.out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


class ArithStats:
    """Per-scan statistics area (F.1.4.4): one DC bank per DC table id,
    one AC bank per AC table id, the shared fixed bin, and the
    per-component DC prediction state. Reset at scan start and at every
    restart marker."""

    def __init__(self, ncomp: int) -> None:
        self.dc: dict[int, bytearray] = {}
        self.ac: dict[int, bytearray] = {}
        self.fixed = bytearray([113])  # non-adaptive state, MPS = 0
        self.last_dc: list[int] = [0] * ncomp
        self.dc_context: list[int] = [0] * ncomp

    def dc_bank(self, tbl: int) -> bytearray:
        if tbl not in self.dc:
            self.dc[tbl] = bytearray(DC_STAT_BINS)
        return self.dc[tbl]

    def ac_bank(self, tbl: int) -> bytearray:
        if tbl not in self.ac:
            self.ac[tbl] = bytearray(AC_STAT_BINS)
        return self.ac[tbl]

    def reset(self) -> None:
        for bank in self.dc.values():
            bank[:] = bytes(len(bank))
        for bank in self.ac.values():
            bank[:] = bytes(len(bank))
        self.fixed[0] = 113
        self.last_dc = [0] * len(self.last_dc)
        self.dc_context = [0] * len(self.dc_context)


def decode_dc_arith(
    dec: ArithDecoder, stats: ArithStats, ci: int, dc_tbl: int, cond: dict,
    prec: int,
) -> int:
    """Decode one DC difference (F.2.4.1 Decode_DC_DIFF) and return the
    accumulated DC value for component ``ci``. Shared by the sequential
    block decode and the progressive DC-first scan (G.2.1 — identical
    statistical model, the caller applies the point transform)."""
    dc_l, dc_u = cond.get(("dc", dc_tbl), (0, 1))
    dcs = stats.dc_bank(dc_tbl)
    base = stats.dc_context[ci]
    if dec.decode(dcs, base):  # diff != 0
        sign = dec.decode(dcs, base + 1)
        st = base + 2 + sign  # SP / SN
        m = 0
        if dec.decode(dcs, st):  # Sz > 0 (magnitude category ladder)
            m = 1
            st = 20  # X1
            while dec.decode(dcs, st):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("JPEG arithmetic DC magnitude overflow")
                st += 1
        # conditioning category for the NEXT block (F.1.4.4.1.2)
        if m < (1 << dc_l) >> 1:
            stats.dc_context[ci] = 0
        elif m > (1 << dc_u) >> 1:
            stats.dc_context[ci] = 12 + sign * 4
        else:
            stats.dc_context[ci] = 4 + sign * 4
        v = m
        st += 14  # mantissa bins follow the ladder station
        m >>= 1
        while m:
            if dec.decode(dcs, st):
                v |= m
            m >>= 1
        v += 1
        if sign:
            v = -v
        stats.last_dc[ci] += v
    else:
        stats.dc_context[ci] = 0
    # corrupt-stream guard: |quantized DC| <= 8 * 2^(prec-1) / qt[0];
    # 1 << (prec + 3) bounds it with slack at qt[0] = 1
    lim = 1 << (prec + 3)
    if not -lim < stats.last_dc[ci] < lim:
        raise ValueError("JPEG arithmetic DC predictor out of range")
    return stats.last_dc[ci]


def decode_block_arith(
    dec: ArithDecoder, stats: ArithStats, ci: int, dc_tbl: int, ac_tbl: int,
    cond: dict, prec: int,
) -> list[int]:
    """Decode one block's QUANTIZED coefficients in zigzag order
    (F.2.4.1 Decode_DC_DIFF + F.2.4.2 Decode_AC_coefficients).
    ``cond`` carries the DAC conditioning: dc (L, U) per DC table,
    ac Kx per AC table."""
    zz = [0] * 64
    kx = cond.get(("ac", ac_tbl), 5)
    zz[0] = decode_dc_arith(dec, stats, ci, dc_tbl, cond, prec)

    acs = stats.ac_bank(ac_tbl)
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if dec.decode(acs, st):  # EOB
            break
        while dec.decode(acs, st + 1) == 0:  # coefficient is zero
            st += 3
            k += 1
            if k > 63:
                raise ValueError("JPEG arithmetic AC coefficient overrun")
        sign = dec.decode(stats.fixed, 0)
        st += 2  # shared SP/X1 station
        m = 0
        if dec.decode(acs, st):
            m = 1
            if dec.decode(acs, st):
                m = 2
                st = 189 if k <= kx else 217  # X2 of the low/high ladder
                while dec.decode(acs, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("JPEG arithmetic AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        m >>= 1
        while m:
            if dec.decode(acs, st):
                v |= m
            m >>= 1
        v += 1
        zz[k] = -v if sign else v
        k += 1
    return zz


def encode_dc_arith(
    enc: ArithEncoder, stats: ArithStats, ci: int, dc_tbl: int, cond: dict,
    value: int,
) -> None:
    """Encode the DC difference that brings component ``ci`` to
    ``value`` (F.1.4.1, Figures F.4/F.6-F.9). Shared by the sequential
    block encode and the progressive DC-first scan."""
    dc_l, dc_u = cond.get(("dc", dc_tbl), (0, 1))
    dcs = stats.dc_bank(dc_tbl)
    base = stats.dc_context[ci]
    v = value - stats.last_dc[ci]
    stats.last_dc[ci] = value
    if v == 0:
        enc.encode(dcs, base, 0)
        stats.dc_context[ci] = 0
    else:
        enc.encode(dcs, base, 1)
        sign = 1 if v < 0 else 0
        enc.encode(dcs, base + 1, sign)
        st = base + 2 + sign
        sz = (-v if sign else v) - 1
        m = 0
        if sz:
            enc.encode(dcs, st, 1)
            m = 1
            st = 20
            v2 = sz
            while v2 := v2 >> 1:
                enc.encode(dcs, st, 1)
                m <<= 1
                st += 1
        enc.encode(dcs, st, 0)
        if m < (1 << dc_l) >> 1:
            stats.dc_context[ci] = 0
        elif m > (1 << dc_u) >> 1:
            stats.dc_context[ci] = 12 + sign * 4
        else:
            stats.dc_context[ci] = 4 + sign * 4
        st += 14
        m >>= 1
        while m:
            enc.encode(dcs, st, 1 if m & sz else 0)
            m >>= 1


def encode_block_arith(
    enc: ArithEncoder, stats: ArithStats, ci: int, dc_tbl: int, ac_tbl: int,
    cond: dict, zz: list[int],
) -> None:
    """Encode one block's quantized zigzag coefficients — the encoder
    twin of `decode_block_arith` (F.1.4.1/F.1.4.2, Figures F.4-F.9)."""
    kx = cond.get(("ac", ac_tbl), 5)
    encode_dc_arith(enc, stats, ci, dc_tbl, cond, zz[0])

    acs = stats.ac_bank(ac_tbl)
    ke = 63
    while ke >= 1 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(acs, st, 0)  # not EOB yet
        while zz[k] == 0:
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        enc.encode(acs, st + 1, 1)
        v = zz[k]
        sign = 1 if v < 0 else 0
        enc.encode(stats.fixed, 0, sign)
        st += 2
        sz = (-v if sign else v) - 1
        m = 0
        if sz:
            enc.encode(acs, st, 1)
            m = 1
            v2 = sz
            if v2 := v2 >> 1:
                enc.encode(acs, st, 1)
                m <<= 1
                st = 189 if k <= kx else 217
                while v2 := v2 >> 1:
                    enc.encode(acs, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(acs, st, 0)
        st += 14
        m >>= 1
        while m:
            enc.encode(acs, st, 1 if m & sz else 0)
            m >>= 1
        k += 1
    if k <= 63:
        enc.encode(acs, 3 * (k - 1), 1)  # EOB


# -- lossless process (T.81 Annex H over the Annex D coder) -------------------


def ll_classify(diff: int, low: int, up: int) -> int:
    """Classify a signed prediction difference into the five Annex H
    conditioning categories — 0 zero/near-zero, 1/2 small +/-, 3/4
    large +/- — using the same magnitude-category thresholds as the DC
    model (F.1.4.4.1.2, applied per H.1.2.2 to the differences coded at
    the left and upper neighbor positions): the top power of two of
    Sz = |diff| - 1 compared against (1 << L) >> 1 and (1 << U) >> 1
    from the DAC DC conditioning of the scan's table id."""
    if diff == 0:
        return 0
    sz = (-diff if diff < 0 else diff) - 1
    m = 1 << (sz.bit_length() - 1) if sz else 0
    if m < (1 << low) >> 1:
        return 0
    sign = 1 if diff < 0 else 0
    if m > (1 << up) >> 1:
        return 3 + sign
    return 1 + sign


def decode_lossless_diff_arith(
    dec: ArithDecoder, bank: bytearray, da_cat: int, db_cat: int,
) -> int:
    """Decode one lossless prediction difference (H.2.1 over the DC
    decision tree of F.2.4.1): the zero/sign/Sz>0 decisions sit in the
    4-bin group of the (Da, Db) context pair — 25 contexts at
    4*(5*Db + Da) covering bins 0..99 — and the magnitude-category
    ladder plus mantissa bins come in two sets (X1..X15 at 100/129,
    M2..M15 following each at +14, Table H.2), the second set selected
    when Db is classified large (H.1.2.2.3). Differences are coded
    modulo 2^16 (H.1.2.1), so Sz tops out at 32767 (top bit 2^14) and
    the same 2^15 ladder guard as the DC model stays unreachable on
    well-formed streams.

    Table H.2's row/column assignment of the 25 pair contexts cannot be
    cross-validated here: no independent lossless-arithmetic JPEG codec
    exists in common libraries (libjpeg/libjpeg-turbo decode arithmetic
    DCT and lossless HUFFMAN, never both at once), so conformance of
    the (Da, Db) -> bin mapping rests on the spec reading documented
    here — Db-major, categories ordered (0, +S, -S, +L, -L) — while
    the coder itself is the libjpeg-validated Annex D machine."""
    base = 4 * (5 * db_cat + da_cat)
    if not dec.decode(bank, base):
        return 0
    sign = dec.decode(bank, base + 1)
    st = base + 2 + sign
    m = 0
    if dec.decode(bank, st):
        m = 1
        st = 129 if db_cat >= 3 else 100  # X1 of the chosen ladder
        while dec.decode(bank, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("JPEG arithmetic lossless magnitude overflow")
            st += 1
    v = m
    st += 14
    m >>= 1
    while m:
        if dec.decode(bank, st):
            v |= m
        m >>= 1
    v += 1
    return -v if sign else v


def encode_lossless_diff_arith(
    enc: ArithEncoder, bank: bytearray, da_cat: int, db_cat: int, v: int,
) -> None:
    """Encoder twin of `decode_lossless_diff_arith` (H.1.2 over the
    F.1.4.1 DC tree). ``v`` is the mod-2^16 difference mapped into
    [-32768, 32767]."""
    base = 4 * (5 * db_cat + da_cat)
    if v == 0:
        enc.encode(bank, base, 0)
        return
    enc.encode(bank, base, 1)
    sign = 1 if v < 0 else 0
    enc.encode(bank, base + 1, sign)
    st = base + 2 + sign
    sz = (-v if sign else v) - 1
    m = 0
    if sz:
        enc.encode(bank, st, 1)
        m = 1
        st = 129 if db_cat >= 3 else 100
        v2 = sz
        while v2 := v2 >> 1:
            enc.encode(bank, st, 1)
            m <<= 1
            st += 1
    enc.encode(bank, st, 0)
    st += 14
    m >>= 1
    while m:
        enc.encode(bank, st, 1 if m & sz else 0)
        m >>= 1


# -- progressive stages (T.81 Annex G over the Annex D coder) -----------------


def decode_ac_first_arith(
    dec: ArithDecoder, stats: ArithStats, ac_tbl: int, cond: dict,
    blk: list[int], ss: int, se: int, al: int,
) -> None:
    """Progressive AC FIRST scan for one block (G.2.2 over F.2.4.2):
    the sequential AC model band-limited to Ss..Se, decoded magnitudes
    scaled by 2^Al into the zigzag coefficient store."""
    kx = cond.get(("ac", ac_tbl), 5)
    acs = stats.ac_bank(ac_tbl)
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(acs, st):  # EOB
            return
        while dec.decode(acs, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("JPEG arithmetic AC coefficient overrun")
        sign = dec.decode(stats.fixed, 0)
        st += 2
        m = 0
        if dec.decode(acs, st):
            m = 1
            if dec.decode(acs, st):
                m = 2
                st = 189 if k <= kx else 217
                while dec.decode(acs, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("JPEG arithmetic AC magnitude overflow")
                    st += 1
        v = m
        st += 14
        m >>= 1
        while m:
            if dec.decode(acs, st):
                v |= m
            m >>= 1
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def decode_ac_refine_arith(
    dec: ArithDecoder, stats: ArithStats, ac_tbl: int,
    blk: list[int], ss: int, se: int, al: int,
) -> None:
    """Progressive AC REFINEMENT scan for one block (G.2.2 correction
    pass): per coefficient, history-nonzero entries get one correction
    bit at the SE+2 station, newly nonzero entries are signalled at the
    significance station with a fixed-state sign; the EOB decision is
    asked only past the previous stage's end-of-block index."""
    acs = stats.ac_bank(ac_tbl)
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex >= ss and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex:
            if dec.decode(acs, st):
                return  # EOB
        while True:
            if blk[k]:  # previously nonzero: one correction bit
                if dec.decode(acs, st + 2):
                    blk[k] += m1 if blk[k] < 0 else p1
                break
            if dec.decode(acs, st + 1):  # newly nonzero
                blk[k] = m1 if dec.decode(stats.fixed, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("JPEG arithmetic AC refinement overrun")
        k += 1


def encode_ac_first_arith(
    enc: ArithEncoder, stats: ArithStats, ac_tbl: int, cond: dict,
    blk: list[int], ss: int, se: int, al: int,
) -> None:
    """Encoder twin of `decode_ac_first_arith` (G.1.2.3 over F.1.4.2):
    codes the band's coefficients at magnitude (|v| >> Al)."""
    kx = cond.get(("ac", ac_tbl), 5)
    acs = stats.ac_bank(ac_tbl)
    ke = se
    while ke >= ss and (abs(blk[ke]) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(acs, st, 0)  # not EOB yet
        while (abs(blk[k]) >> al) == 0:
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        enc.encode(acs, st + 1, 1)
        sign = 1 if blk[k] < 0 else 0
        enc.encode(stats.fixed, 0, sign)
        st += 2
        sz = (abs(blk[k]) >> al) - 1
        m = 0
        if sz:
            enc.encode(acs, st, 1)
            m = 1
            v2 = sz
            if v2 := v2 >> 1:
                enc.encode(acs, st, 1)
                m <<= 1
                st = 189 if k <= kx else 217
                while v2 := v2 >> 1:
                    enc.encode(acs, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(acs, st, 0)
        st += 14
        m >>= 1
        while m:
            enc.encode(acs, st, 1 if m & sz else 0)
            m >>= 1
        k += 1
    if k <= se:
        enc.encode(acs, 3 * (k - 1), 1)  # EOB


def encode_ac_refine_arith(
    enc: ArithEncoder, stats: ArithStats, ac_tbl: int,
    blk: list[int], ss: int, se: int, ah: int, al: int,
) -> None:
    """Encoder twin of `decode_ac_refine_arith` (G.1.2.3 correction
    pass): Ah is the previous scan's low bit position, Al this one's."""
    acs = stats.ac_bank(ac_tbl)
    ke = se
    while ke >= ss and (abs(blk[ke]) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(blk[kex]) >> ah) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(acs, st, 0)  # not EOB yet
        while True:
            mag = abs(blk[k]) >> al
            if mag:
                if mag >> 1:  # previously nonzero: correction bit
                    enc.encode(acs, st + 2, mag & 1)
                else:  # newly nonzero at this bit position
                    enc.encode(acs, st + 1, 1)
                    enc.encode(stats.fixed, 0, 1 if blk[k] < 0 else 0)
                break
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(acs, 3 * (k - 1), 1)  # EOB
