"""Pure-stdlib GIF codec for the multimodal decode seam.

GIF87a/89a (the public CompuServe specification, the W3C-hosted
GIF89a text) was the remaining always-gated raster format: the
container ships no Pillow, so image/gif payloads raised the documented
NotImplementedError. This module closes it the same way jpeg.py and
the PNG path did — a spec-faithful decoder plus a fixture encoder:

- Variable-width LZW in both directions (LSB-first code packing,
  CLEAR/END codes, dictionary growth to 12 bits with the standard
  early-change width bump, the KwKwK first-character case, encoder
  CLEAR-reset at table overflow), data chopped into <=255-byte
  sub-blocks.
- Logical screen descriptor + global color table; per-image LOCAL
  color tables overriding it; the four-pass INTERLACE row order.
- GIF89a extensions: the graphic control extension's TRANSPARENCY
  index (transparent pixels leave the underlying canvas visible) and
  DISPOSAL methods 0/1 (leave), 2 (restore background), 3 (restore
  previous); comment/application/plain-text extensions skipped by
  sub-block walking.
- ANIMATION: frames composite onto the canvas in order; the decode
  surface is the final composited canvas. The initial canvas is the
  global background color (the common renderer convention when no
  frame has covered a pixel yet; documented here, mirrored by the
  fixture oracles).
- Fail-loud posture throughout: truncated sub-blocks, LZW codes
  outside the table, pixel-count mismatches, frame rects outside the
  canvas, and a missing trailer all raise ValueError.

Reference parity: the reference (Zino-ctrlZ/FinanceDatabase) has no
media path at all — media are opaque payloads; this extends the
LLM-pipeline image tier exactly like the PNG/JPEG codecs do.
"""

from __future__ import annotations

import struct


def _lzw_decode(data: bytes, mcs: int, npix: int) -> list[int]:
    """Decode a GIF LZW code stream (already de-sub-blocked) of
    ``npix`` palette indices. ``mcs`` is the LZW minimum code size."""
    if not 2 <= mcs <= 8:
        raise ValueError(f"GIF LZW minimum code size {mcs} outside 2-8")
    clear = 1 << mcs
    end = clear + 1
    base: list[tuple[int, ...] | None] = [(i,) for i in range(clear)]
    base += [None, None]  # clear, end
    table = list(base)
    width = mcs + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated before END code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError(f"GIF LZW code {code} is not a literal after CLEAR")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table):
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(
                f"GIF LZW code {code} outside the {len(table)}-entry table"
            )
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            if len(table) == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        prev = entry
        if len(out) > npix:
            raise ValueError(
                f"GIF LZW output overruns the image: {len(out)} > {npix} pixels"
            )
    if len(out) != npix:
        raise ValueError(
            f"GIF LZW decoded {len(out)} pixels, image descriptor says {npix}"
        )
    return out


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """Encode palette indices as a GIF LZW code stream (fixture side):
    real dictionary compression with the width bump mirrored against
    `_lzw_decode` and a CLEAR reset when the table fills."""
    clear = 1 << mcs
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    prev: tuple[int, ...] = ()
    for idx in indices:
        if idx >= clear:
            raise ValueError(f"palette index {idx} needs more than {mcs} bits")
        cur = prev + (idx,)
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = mcs + 1
        prev = (idx,)
    if prev:
        emit(table[prev], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Chop a byte stream into <=255-byte length-prefixed sub-blocks
    plus the zero terminator."""
    out = bytearray()
    for off in range(0, len(data), 255):
        chunk = data[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(raw: bytes, pos: int) -> tuple[bytes, int]:
    """Collect length-prefixed sub-blocks until the zero terminator."""
    out = bytearray()
    while True:
        if pos >= len(raw):
            raise ValueError("GIF sub-block stream truncated")
        n = raw[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(raw):
            raise ValueError("GIF sub-block truncated")
        out += raw[pos:pos + n]
        pos += n


#: the four interlace passes: (first row, step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indices: list[int], w: int, h: int) -> list[int]:
    out = [0] * (w * h)
    src = 0
    for first, step in _INTERLACE:
        for y in range(first, h, step):
            out[y * w:(y + 1) * w] = indices[src:src + w]
            src += w
    return out


def gif_canvas(payload: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Decode a GIF to (width, height, final composited canvas) as
    row-major (r, g, b) tuples: every frame rendered in order with its
    graphic-control transparency and disposal applied. Raises
    ValueError on malformed streams (see module docstring)."""
    raw = bytes(payload)
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing 87a/89a signature)")
    if len(raw) < 13:
        raise ValueError("GIF logical screen descriptor truncated")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", raw, 6)
    if not w or not h:
        raise ValueError(f"GIF has empty {w}x{h} canvas")
    pos = 13
    gct: list[tuple[int, int, int]] | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(raw):
            raise ValueError("GIF global color table truncated")
        gct = [tuple(raw[pos + 3 * i:pos + 3 * i + 3]) for i in range(n)]
        pos += 3 * n
    bg_rgb = gct[bg] if gct and bg < len(gct) else (0, 0, 0)
    canvas: list[tuple[int, int, int]] = [bg_rgb] * (w * h)
    covered = False  # at least one frame decoded
    transparent: int | None = None
    disposal = 0
    # disposal is applied LAZILY, just before the NEXT frame composites:
    # real renderers never apply the final frame's disposal (it only
    # defines what a frame after it would composite over), so a
    # single-frame disposal=2 GIF must NOT decode as a background field
    pending: tuple[int, int, int, int, int, list | None] | None = None
    ended = False
    while pos < len(raw):
        block = raw[pos]
        pos += 1
        if block == 0x3B:  # trailer
            ended = True
            break
        if block == 0x21:  # extension
            if pos >= len(raw):
                raise ValueError("GIF extension truncated")
            label = raw[pos]
            pos += 1
            body, pos = _read_sub_blocks(raw, pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise ValueError("GIF graphic control extension truncated")
                flags = body[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block introducer 0x{block:02X}")
        if pos + 9 > len(raw):
            raise ValueError("GIF image descriptor truncated")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", raw, pos)
        pos += 9
        if not iw or not ih or left + iw > w or top + ih > h:
            raise ValueError(
                f"GIF frame rect {iw}x{ih}@({left},{top}) outside the "
                f"{w}x{h} canvas"
            )
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(raw):
                raise ValueError("GIF local color table truncated")
            pal = [tuple(raw[pos + 3 * i:pos + 3 * i + 3]) for i in range(n)]
            pos += 3 * n
        elif gct is not None:
            pal = gct
        else:
            raise ValueError("GIF frame has neither local nor global color table")
        if pos >= len(raw):
            raise ValueError("GIF LZW minimum code size missing")
        mcs = raw[pos]
        pos += 1
        data, pos = _read_sub_blocks(raw, pos)
        indices = _lzw_decode(data, mcs, iw * ih)
        if ipacked & 0x40:
            indices = _deinterlace(indices, iw, ih)
        # the PREVIOUS frame's disposal takes effect now, before this
        # frame composites
        if pending is not None:
            pdisp, pleft, ptop, piw, pih, psaved = pending
            if pdisp == 2:
                for y in range(pih):
                    row = (ptop + y) * w + pleft
                    canvas[row:row + piw] = [bg_rgb] * piw
            elif pdisp == 3 and psaved is not None:
                for y in range(pih):
                    row = (ptop + y) * w + pleft
                    canvas[row:row + piw] = psaved[y]
            pending = None
        saved = None
        if disposal == 3:  # restore-previous: snapshot the region
            saved = [
                canvas[(top + y) * w + left:(top + y) * w + left + iw]
                for y in range(ih)
            ]
        for y in range(ih):
            row = (top + y) * w + left
            for x in range(iw):
                idx = indices[y * iw + x]
                if transparent is not None and idx == transparent:
                    continue
                if idx >= len(pal):
                    raise ValueError(
                        f"GIF pixel index {idx} outside the {len(pal)}-entry "
                        f"palette"
                    )
                canvas[row + x] = pal[idx]
        covered = True
        # queue this frame's disposal; it is applied only if another
        # frame follows (the final frame's disposal is never applied)
        if disposal in (2, 3):
            pending = (disposal, left, top, iw, ih, saved)
        transparent = None
        disposal = 0
    if not ended:
        raise ValueError("GIF stream missing the 0x3B trailer")
    if not covered:
        raise ValueError("GIF has no image data")
    return w, h, canvas


def gif_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Image codec for the `decode_features` seam: decode the GIF's
    final composited canvas and emit the normalized ``dim``-bin LUMA
    histogram (luma = (299r + 587g + 114b) // 1000 — integer Rec.601
    weights, bit-stable across engines; same output shape as
    png_decode/jpeg_decode).

    The feature is the FINAL canvas as a renderer shows it: disposal is
    applied lazily between frames, so the last frame's disposal (which
    only defines what a frame AFTER it would composite over) is never
    applied — a single-frame disposal=2 GIF shows the frame, not a
    background field."""
    w, h, canvas = gif_canvas(payload)
    counts = [0] * dim
    for r, g, b in canvas:
        luma = (299 * r + 587 * g + 114 * b) // 1000
        counts[(luma * dim) >> 8] += 1
    n = w * h
    return [c / n for c in counts]


def assemble_gif(
    w: int,
    h: int,
    gct: list[tuple[int, int, int]] | None,
    frames: list[dict],
    bg: int = 0,
    version: bytes = b"89a",
) -> bytes:
    """Assemble a spec-valid GIF. Each frame dict: ``indices`` (row-major
    palette indices, iw*ih), optional ``left``/``top``/``iw``/``ih``
    (default full canvas), ``lct`` (local color table), ``interlace``
    (store rows in the four-pass order), ``transparent`` (index),
    ``disposal`` (0-3), ``mcs`` (LZW minimum code size, default the
    smallest legal for the palette). ``gct=None`` requires every frame
    to carry an ``lct``."""

    def _ctsize(n: int) -> int:
        bits = max(1, (n - 1).bit_length())
        return bits

    out = bytearray(b"GIF" + version)
    packed = 0
    if gct is not None:
        bits = _ctsize(len(gct))
        packed = 0x80 | (bits - 1)
    out += struct.pack("<HHBBB", w, h, packed, bg, 0)
    if gct is not None:
        n = 2 << ((packed & 0x07))
        for i in range(n):
            out += bytes(gct[i] if i < len(gct) else (0, 0, 0))
    for fr in frames:
        iw = fr.get("iw", w)
        ih = fr.get("ih", h)
        left = fr.get("left", 0)
        top = fr.get("top", 0)
        if fr.get("transparent") is not None or fr.get("disposal"):
            flags = (fr.get("disposal", 0) & 0x07) << 2
            tidx = fr.get("transparent")
            if tidx is not None:
                flags |= 0x01
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, tidx or 0, 0])
        ipacked = 0
        lct = fr.get("lct")
        if lct is not None:
            bits = _ctsize(len(lct))
            ipacked |= 0x80 | (bits - 1)
        if fr.get("interlace"):
            ipacked |= 0x40
        out += b"\x2c" + struct.pack("<HHHHB", left, top, iw, ih, ipacked)
        if lct is not None:
            n = 2 << (ipacked & 0x07)
            for i in range(n):
                out += bytes(lct[i] if i < len(lct) else (0, 0, 0))
        pal_n = len(lct) if lct is not None else len(gct)
        indices = fr["indices"]
        if len(indices) != iw * ih:
            raise ValueError(f"frame needs {iw * ih} indices, got {len(indices)}")
        if fr.get("interlace"):
            rows = []
            for first, step in _INTERLACE:
                for y in range(first, ih, step):
                    rows.extend(indices[y * iw:(y + 1) * iw])
            indices = rows
        mcs = fr.get("mcs", max(2, _ctsize(pal_n)))
        out += bytes([mcs]) + _sub_blocks(_lzw_encode(indices, mcs))
    out += b"\x3b"
    return bytes(out)


def synth_gif(doc_id: int) -> bytes:
    """Deterministic GIF fixture, cycling doc%4 over the decoder's
    feature axes; palette entry i is
    (r, g, b) = ((doc*7 + i*3) % 256, (doc*11 + i*5) % 256,
    (doc*13 + i*7) % 256). Canvas w = 16 + (doc%3)*8, h = 16;
    base-frame index(y, x) = (doc*31 + y*17 + x*7) % 256.

    0: GIF87a, one full-canvas frame, 256-color GCT, 8-bit LZW.
    1: one INTERLACED frame under a 16-color LOCAL table (index % 16,
       4-bit LZW width growth), no GCT use for pixels.
    2: animation — the base frame, then an 8x8 overlay at (4, 4) with
       indices (doc*5 + y*3 + x) % 256 where every index % 5 == 0 is
       TRANSPARENT (base shows through), disposal 1.
    3: disposal-2 animation — the base frame marked restore-background,
       then the 8x8 overlay at (4, 4): the final canvas is the overlay
       over a background-color field (bg index doc % 256).
    """
    doc_id = int(doc_id)
    v = doc_id % 4
    w = 16 + (doc_id % 3) * 8
    h = 16
    pal = [
        (
            (doc_id * 7 + i * 3) % 256,
            (doc_id * 11 + i * 5) % 256,
            (doc_id * 13 + i * 7) % 256,
        )
        for i in range(256)
    ]
    base = [(doc_id * 31 + y * 17 + x * 7) % 256 for y in range(h) for x in range(w)]
    if v == 0:
        return assemble_gif(w, h, pal, [{"indices": base}], version=b"87a")
    if v == 1:
        return assemble_gif(
            w, h, pal,
            [{"indices": [i % 16 for i in base], "lct": pal[:16],
              "interlace": True}],
        )
    overlay = [(doc_id * 5 + y * 3 + x) % 256 for y in range(8) for x in range(8)]
    if v == 2:
        tr = [i if i % 5 else 255 for i in overlay]  # remap; 255 = clear
        return assemble_gif(
            w, h, pal,
            [
                {"indices": base},
                {"indices": tr, "left": 4, "top": 4, "iw": 8, "ih": 8,
                 "transparent": 255, "disposal": 1},
            ],
        )
    return assemble_gif(
        w, h, pal,
        [
            {"indices": base, "disposal": 2},
            {"indices": overlay, "left": 4, "top": 4, "iw": 8, "ih": 8},
        ],
        bg=doc_id % 256,
    )
