"""Pure-stdlib baseline TIFF codec for the multimodal decode seam.

TIFF 6.0 (the public Adobe/Aldus specification) baseline features, in
both byte orders: IFD walk (tag/type/count/value entries, inline values
vs offsets), strip-organized image data (StripOffsets/StripByteCounts/
RowsPerStrip), PhotometricInterpretation 0/1 (grayscale, either
polarity), 2 (RGB chunky), 3 (palette via the 16-bit ColorMap),
Compression 1 (none), 32773 (PackBits), and 5 (TIFF LZW — MSB-first
code packing with the EARLY-CHANGE width bump at table size 2^n - 1,
the documented divergence from GIF's LZW — plus the horizontal
differencing Predictor 2). Multi-strip images reset PackBits/LZW state
per strip, as the spec requires.

Fail-loud posture: truncated headers/IFDs/strips, unsupported
compressions or photometrics, LZW codes outside the table, strip
byte-count mismatches, and missing mandatory tags raise ValueError
(or NotImplementedError for genuinely out-of-scope baseline extensions
— tiles, CCITT fax, JPEG-in-TIFF, planar configuration 2).

Reference parity: the reference has no media path (media are opaque
payloads); this extends the LLM-pipeline image tier like the
PNG/JPEG/GIF codecs.
"""

from __future__ import annotations

import struct

#: (tag, name) — the baseline tags this decoder consumes
_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320

#: field type -> (struct char, size); types 1-5 cover baseline
_TYPES = {1: ("B", 1), 2: ("B", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8)}


def _unpack_packbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits (TIFF Compression 32773): n >= 0 copies n+1
    literals, n in -127..-1 repeats the next byte 1-n times, -128 is a
    no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i] - 256 if data[i] > 127 else data[i]
        i += 1
        if n == -128:
            continue
        if n >= 0:
            if i + n + 1 > len(data):
                raise ValueError("PackBits literal run truncated")
            out += data[i:i + n + 1]
            i += n + 1
        else:
            if i >= len(data):
                raise ValueError("PackBits repeat run truncated")
            out += bytes([data[i]]) * (1 - n)
            i += 1
    if len(out) != expected:
        raise ValueError(
            f"PackBits expanded to {len(out)} bytes, strip declares {expected}"
        )
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF LZW (Compression 5): 8-bit symbols, CLEAR=256, EOI=257,
    MSB-first bit packing, and the EARLY width change — the code width
    bumps when the table reaches 2^n - 1 entries (one earlier than
    GIF), per TIFF 6.0 §13."""
    CLEAR, EOI = 256, 257
    base: list[bytes | None] = [bytes([i]) for i in range(256)] + [None, None]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated before EOI")
            acc = (acc << 8) | data[pos]
            nbits += 8
            pos += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError(f"TIFF LZW code {code} is not a literal after CLEAR")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(
                f"TIFF LZW code {code} outside the {len(table)}-entry table"
            )
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # EARLY CHANGE, decoder side: the decoder's table lags the
            # encoder's by ONE entry (the next code reveals the pending
            # entry's first byte), so where the encoder widens at
            # 2^n - 1 entries, the decoder widens at 2^n - 2
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
        out += entry
        prev = entry
        if len(out) > expected:
            raise ValueError(
                f"TIFF LZW output overruns the strip: {len(out)} > {expected}"
            )
    if len(out) != expected:
        raise ValueError(
            f"TIFF LZW decoded {len(out)} bytes, strip declares {expected}"
        )
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """Encoder twin of `_lzw_decode_tiff` (fixture side): real
    dictionary compression, MSB-first packing, early width change,
    CLEAR reset when the table fills."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(CLEAR, width)
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4095:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([byte])
    if prev:
        emit(table[prev], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def tiff_pixels(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode the FIRST IFD of a baseline TIFF to (width, height,
    row-major (r, g, b) tuples). See the module docstring for scope."""
    raw = bytes(payload)
    if len(raw) < 8:
        raise ValueError("TIFF header truncated")
    if raw[:2] == b"II":
        e = "<"
    elif raw[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF (missing II/MM byte-order mark)")
    (magic,) = struct.unpack_from(e + "H", raw, 2)
    if magic != 42:
        raise ValueError(f"TIFF magic is {magic}, expected 42")
    (ifd_off,) = struct.unpack_from(e + "I", raw, 4)
    if ifd_off + 2 > len(raw):
        raise ValueError("TIFF IFD offset outside the file")
    (n_entries,) = struct.unpack_from(e + "H", raw, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(raw):
            raise ValueError("TIFF IFD entry truncated")
        tag, typ, cnt = struct.unpack_from(e + "HHI", raw, off)
        if typ not in _TYPES:
            continue  # unknown field type: skip per spec
        ch, sz = _TYPES[typ]
        total = sz * cnt
        if total <= 4:
            voff = off + 8
        else:
            (voff,) = struct.unpack_from(e + "I", raw, off + 8)
        if voff + total > len(raw):
            raise ValueError(f"TIFF tag {tag} values outside the file")
        if typ == 5:  # rational: keep numerators (unused by this decoder)
            vals = [
                struct.unpack_from(e + "II", raw, voff + 8 * k)[0]
                for k in range(cnt)
            ]
        else:
            vals = list(struct.unpack_from(e + str(cnt) + ch, raw, voff))
        tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF is missing mandatory tag {tag}")
        return default

    w = one(_TAG_WIDTH)
    h = one(_TAG_LENGTH)
    if not w or not h:
        raise ValueError(f"TIFF has empty {w}x{h} raster")
    comp = one(_TAG_COMPRESSION, 1)
    photo = one(_TAG_PHOTOMETRIC)
    spp = one(_TAG_SPP, 1)
    bits = tags.get(_TAG_BITS, [8])
    predictor = one(_TAG_PREDICTOR, 1)
    planar = one(_TAG_PLANAR, 1)
    if planar != 1:
        raise NotImplementedError("planar (non-chunky) TIFF not supported")
    if any(b != 8 for b in bits):
        raise NotImplementedError(
            f"only 8 bits per sample supported, got {bits}"
        )
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} not supported (none/LZW/PackBits here; "
            f"CCITT, JPEG-in-TIFF need codecs out of baseline scope)"
        )
    if predictor not in (1, 2):
        raise ValueError(f"TIFF predictor {predictor} invalid (1 or 2)")
    if photo not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"TIFF photometric {photo} not supported (gray/RGB/palette here)"
        )
    if photo == 2 and spp < 3:
        raise ValueError("RGB TIFF needs SamplesPerPixel >= 3")
    if photo in (0, 1, 3) and spp != 1:
        raise ValueError(f"photometric {photo} requires 1 sample/pixel")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts missing or mismatched")
    rps = one(_TAG_ROWS_PER_STRIP, h)
    cmap = None
    if photo == 3:
        cm = tags.get(_TAG_COLORMAP)
        if not cm or len(cm) != 3 * 256:
            raise ValueError(
                "palette TIFF needs a 3*256-entry 16-bit ColorMap at 8 bits"
            )
        cmap = cm
    row_bytes = w * spp
    plane = bytearray()
    for si, (soff, scnt) in enumerate(zip(offsets, counts)):
        if soff + scnt > len(raw):
            raise ValueError(f"TIFF strip {si} outside the file")
        nrows = min(rps, h - si * rps)
        if nrows <= 0:
            raise ValueError(f"TIFF has more strips than rows cover ({si})")
        expected = nrows * row_bytes
        chunk = raw[soff:soff + scnt]
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError(
                    f"TIFF strip {si} holds {len(chunk)} bytes, needs {expected}"
                )
            data = chunk[:expected]
        elif comp == 32773:
            data = _unpack_packbits(chunk, expected)
        else:
            data = _lzw_decode_tiff(chunk, expected)
        if predictor == 2:
            # horizontal differencing: per row, per sample channel
            buf = bytearray(data)
            for r in range(nrows):
                base = r * row_bytes
                for x in range(spp, row_bytes):
                    buf[base + x] = (buf[base + x] + buf[base + x - spp]) & 0xFF
            data = bytes(buf)
        plane += data
    if len(plane) != h * row_bytes:
        raise ValueError(
            f"TIFF strips cover {len(plane)} bytes, raster needs {h * row_bytes}"
        )
    out: list[tuple[int, int, int]] = []
    if photo == 2:
        for p in range(w * h):
            out.append((plane[spp * p], plane[spp * p + 1], plane[spp * p + 2]))
    elif photo == 3:
        for p in range(w * h):
            i = plane[p]
            out.append((cmap[i] >> 8, cmap[256 + i] >> 8, cmap[512 + i] >> 8))
    else:
        inv = photo == 0  # WhiteIsZero
        for p in range(w * h):
            v = 255 - plane[p] if inv else plane[p]
            out.append((v, v, v))
    return w, h, out


def tiff_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Image codec for the `decode_features` seam: decode the first IFD
    and emit the normalized ``dim``-bin Rec.601 integer-luma histogram
    (same output shape as png/jpeg/gif decode)."""
    w, h, px = tiff_pixels(payload)
    counts = [0] * dim
    for r, g, b in px:
        luma = (299 * r + 587 * g + 114 * b) // 1000
        counts[(luma * dim) >> 8] += 1
    n = w * h
    return [c / n for c in counts]


def assemble_tiff(
    w: int,
    h: int,
    photometric: int,
    plane: bytes,
    compression: int = 1,
    rows_per_strip: int | None = None,
    predictor: int = 1,
    colormap: list[int] | None = None,
    big_endian: bool = False,
    spp: int = 1,
) -> bytes:
    """Assemble a spec-valid single-IFD baseline TIFF (fixture side).
    ``plane`` is the raw chunky sample stream (w*h*spp bytes)."""
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    row_bytes = w * spp
    strips_raw = []
    for s0 in range(0, h, rps):
        nrows = min(rps, h - s0)
        data = plane[s0 * row_bytes:(s0 + nrows) * row_bytes]
        if predictor == 2:
            buf = bytearray(data)
            for r in range(nrows):
                base = r * row_bytes
                for x in range(row_bytes - 1, spp - 1, -1):
                    buf[base + x] = (buf[base + x] - buf[base + x - spp]) & 0xFF
            data = bytes(buf)
        if compression == 32773:
            # naive PackBits: literal runs capped at 128 with one
            # repeat run per row boundary exercise
            out = bytearray()
            i = 0
            while i < len(data):
                run = 1
                while (
                    run < 128 and i + run < len(data)
                    and data[i + run] == data[i]
                ):
                    run += 1
                if run >= 2:
                    out += bytes([(257 - run) & 0xFF, data[i]])
                    i += run
                else:
                    lit = 1
                    while (
                        lit < 128 and i + lit < len(data)
                        and (i + lit + 1 >= len(data)
                             or data[i + lit] != data[i + lit + 1])
                    ):
                        lit += 1
                    out += bytes([lit - 1]) + data[i:i + lit]
                    i += lit
            strips_raw.append(bytes(out))
        elif compression == 5:
            strips_raw.append(_lzw_encode_tiff(data))
        else:
            strips_raw.append(data)

    entries: list[tuple[int, int, list[int]]] = [
        (_TAG_WIDTH, 3, [w]),
        (_TAG_LENGTH, 3, [h]),
        (_TAG_BITS, 3, [8] * spp),
        (_TAG_COMPRESSION, 3, [compression]),
        (_TAG_PHOTOMETRIC, 3, [photometric]),
        (_TAG_SPP, 3, [spp]),
        (_TAG_ROWS_PER_STRIP, 3, [rps]),
    ]
    if predictor != 1:
        entries.append((_TAG_PREDICTOR, 3, [predictor]))
    if colormap is not None:
        entries.append((_TAG_COLORMAP, 3, list(colormap)))
    # layout: header(8) + IFD + overflow values + strips. The strip
    # offsets depend on the overflow size, which includes the strip
    # offset/count arrays themselves — so compute the overflow size
    # FIRST (every value is fixed-length), then lay out in one pass.
    n_strips = len(strips_raw)
    entries.append((_TAG_STRIP_COUNTS, 4, [len(s) for s in strips_raw]))
    entries.append((_TAG_STRIP_OFFSETS, 4, [0] * n_strips))  # patched below
    n_all = len(entries)
    ifd_size = 2 + 12 * n_all + 4

    def value_bytes(typ: int, vals: list[int]) -> bytes:
        ch, _sz = _TYPES[typ]
        return struct.pack(e + str(len(vals)) + ch, *vals)

    overflow_size = 0
    for _tag, typ, vals in entries:
        vb_len = _TYPES[typ][1] * len(vals)
        if vb_len > 4:
            overflow_size += vb_len + (vb_len & 1)
    strip_base = 8 + ifd_size + overflow_size
    offsets = []
    pos = strip_base
    for s in strips_raw:
        offsets.append(pos)
        pos += len(s) + (len(s) & 1)
    entries[-1] = (_TAG_STRIP_OFFSETS, 4, offsets)

    entries.sort(key=lambda t: t[0])  # IFD entries must be tag-ordered
    overflow = bytearray()
    ifd = bytearray()
    for tag, typ, vals in entries:
        vb = value_bytes(typ, vals)
        if len(vb) <= 4:
            ifd += struct.pack(e + "HHI", tag, typ, len(vals)) + vb.ljust(4, b"\x00")
        else:
            off = 8 + ifd_size + len(overflow)
            overflow += vb
            if len(overflow) % 2:
                overflow.append(0)
            ifd += struct.pack(e + "HHII", tag, typ, len(vals), off)
    assert len(overflow) == overflow_size
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)
    out += struct.pack(e + "H", n_all) + ifd + struct.pack(e + "I", 0)
    out += overflow
    for s in strips_raw:
        out += s
        if len(s) & 1:
            out += b"\x00"
    return bytes(out)


def synth_tiff(doc_id: int) -> bytes:
    """Deterministic TIFF fixture, cycling doc%4; canvas
    w = 16 + (doc%3)*8, h = 16; gray pixel g(y, x) =
    (doc*31 + y*17 + x*7) % 256.

    0: little-endian uncompressed GRAYSCALE (BlackIsZero), single strip.
    1: big-endian PACKBITS WhiteIsZero grayscale (decoder must invert
       and honor MM byte order), 4-row strips.
    2: little-endian LZW RGB with PREDICTOR 2 (horizontal differencing
       across 3 interleaved channels; early-change width bump), 8-row
       strips; channel c = (g + c*5) % 256.
    3: big-endian uncompressed PALETTE image: index = g % 16, ColorMap
       entry i = 257 * ((doc*7 + i*11) % 256) per channel rotation
       (r=i*11, g=i*13, b=i*17 multipliers), 16-bit entries whose high
       byte is the 8-bit channel."""
    doc_id = int(doc_id)
    v = doc_id % 4
    w = 16 + (doc_id % 3) * 8
    h = 16
    gray = bytes(
        (doc_id * 31 + y * 17 + x * 7) % 256 for y in range(h) for x in range(w)
    )
    if v == 0:
        return assemble_tiff(w, h, 1, gray)
    if v == 1:
        return assemble_tiff(
            w, h, 0, gray, compression=32773, rows_per_strip=4, big_endian=True,
        )
    if v == 2:
        rgb = bytearray()
        for g in gray:
            rgb += bytes(((g + c * 5) % 256 for c in range(3)))
        return assemble_tiff(
            w, h, 2, bytes(rgb), compression=5, rows_per_strip=8,
            predictor=2, spp=3,
        )
    cmap = (
        [257 * ((doc_id * 7 + i * 11) % 256) for i in range(256)]
        + [257 * ((doc_id * 7 + i * 13) % 256) for i in range(256)]
        + [257 * ((doc_id * 7 + i * 17) % 256) for i in range(256)]
    )
    idx = bytes(b % 16 for b in gray)
    return assemble_tiff(w, h, 3, idx, colormap=cmap, big_endian=True)
