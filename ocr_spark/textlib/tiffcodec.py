"""Pure-Python/numpy baseline TIFF codec — TIFF 6.0 from the spec.

TIFF is the scanned-document interchange format — exactly the payload
family the reference service's domain (salary slips, bank statements,
ID cards pushed through OCR) meets in the wild — so the decode layer
covers the baseline profile from the public specification (Adobe TIFF
Revision 6.0, 1992):

  decode:
    * both byte orders (II little / MM big), IFD walk (first image),
      inline and offset tag values
    * strip organisation (RowsPerStrip / StripOffsets /
      StripByteCounts)
    * compressions: 1 (none), 32773 (PackBits RLE), 5 (LZW — the
      TIFF flavor: MSB-first bit packing and EARLY code-width change
      at 2^n - 1, deliberately different from GIF's LSB-first late
      change; horizontal-differencing Predictor 2 supported)
    * photometric interpretations: BlackIsZero, WhiteIsZero
      (inverted), RGB (+ extra samples dropped), Palette (16-bit
      color map scaled to 8)
    * 8-bit samples, 1/3/4 samples per pixel
  encode (test mirror): uncompressed / PackBits / LZW with optional
    predictor, grayscale or RGB, strip splitting.

Raises imagecodec.ImageFormatError on corrupt or out-of-profile
bytes (tiled TIFFs, 16-bit samples, JPEG-in-TIFF...) — callers fall
back to the byte-histogram featurizer like every codec here.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageFormatError

TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

# tag ids
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PREDICTOR, _COLORMAP = 317, 320

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4, 11: 4,
              12: 8}


def _read_ifd(data: bytes, order: str):
    """First IFD -> {tag: [values]}."""
    if len(data) < 8:
        raise ImageFormatError("truncated TIFF header")
    (ifd_off,) = struct.unpack(order + "I", data[4:8])
    if ifd_off + 2 > len(data):
        raise ImageFormatError("bad TIFF IFD offset")
    (n_entries,) = struct.unpack(order + "H", data[ifd_off:ifd_off + 2])
    tags: dict[int, list] = {}
    pos = ifd_off + 2
    for _ in range(n_entries):
        if pos + 12 > len(data):
            raise ImageFormatError("truncated TIFF IFD")
        tag, typ, cnt = struct.unpack(order + "HHI", data[pos:pos + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            pos += 12
            continue
        total = size * cnt
        if total <= 4:
            raw = data[pos + 8:pos + 8 + total]
        else:
            (off,) = struct.unpack(order + "I", data[pos + 8:pos + 12])
            if off + total > len(data):
                raise ImageFormatError("TIFF tag data out of range")
            raw = data[off:off + total]
        if typ in (3, 8):
            vals = list(struct.unpack(order + "H" * cnt, raw))
        elif typ in (4, 9, 11):
            fmt = "I" if typ == 4 else ("i" if typ == 9 else "f")
            vals = list(struct.unpack(order + fmt * cnt, raw))
        elif typ in (1, 2, 6, 7):
            vals = list(raw)
        else:           # RATIONAL: keep numerators, unused here
            vals = list(struct.unpack(order + "I" * (2 * cnt), raw))[::2]
        tags[tag] = vals
        pos += 12
    return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        b = src[i]
        i += 1
        if b < 128:             # literal run of b+1
            if i + b + 1 > n:
                raise ImageFormatError("truncated PackBits literal")
            out += src[i:i + b + 1]
            i += b + 1
        elif b > 128:           # replicate next byte 257-b times
            if i >= n:
                raise ImageFormatError("truncated PackBits replicate")
            out += bytes([src[i]]) * (257 - b)
            i += 1
        # 128: no-op
    if len(out) < expected:
        raise ImageFormatError("PackBits output short")
    return bytes(out[:expected])


def _tiff_lzw_decode(src: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (spec section 13): MSB-first bit order, codes
    256=Clear / 257=EOI, table starts at 258, and the EARLY width
    change — the width bumps when the next assigned code would be
    2^width - 1 (one code sooner than GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitpos = 0
    nbits = len(src) * 8

    def fresh():
        return {i: bytes([i]) for i in range(256)}

    table = fresh()
    width = 9
    next_code = 258
    prev: bytes | None = None
    while bitpos + width <= nbits and len(out) < expected:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(src[byte0:byte0 + 4].ljust(4, b"\0"),
                               "big")
        code = (chunk >> (32 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == CLEAR:
            table = fresh()
            width = 9
            next_code = 258
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ImageFormatError("bad first TIFF LZW code")
        else:
            entry = table.get(code)
            if entry is None:
                if code != next_code:
                    raise ImageFormatError("TIFF LZW code out of range")
                entry = prev + prev[:1]
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1      # EARLY change (TIFF spec p.61)
        out += entry
        prev = entry
    if len(out) < expected:
        raise ImageFormatError("TIFF LZW stream ended short")
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF -> uint8 array: (H, W) grayscale or (H, W, 3)
    RGB (palette resolved, WhiteIsZero inverted, extra samples
    dropped)."""
    if data[:4] not in TIFF_MAGICS:
        raise ImageFormatError("not a TIFF stream")
    order = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, order)
    try:
        w = tags[_W][0]
        h = tags[_H][0]
        offsets = tags[_STRIP_OFF]
        counts = tags[_STRIP_CNT]
    except KeyError as e:
        raise ImageFormatError(f"TIFF missing required tag {e}") from None
    if w <= 0 or h <= 0:
        raise ImageFormatError("bad TIFF dimensions")
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])
    comp = tags.get(_COMP, [1])[0]
    photo = tags.get(_PHOTO, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0] or h
    if any(b != 8 for b in bits[:spp]):
        raise ImageFormatError(
            f"only 8-bit TIFF samples supported (got {bits})")
    if spp not in (1, 3, 4):
        raise ImageFormatError(f"unsupported TIFF samples/pixel {spp}")
    if comp not in (1, 5, 32773):
        raise ImageFormatError(
            f"unsupported TIFF compression {comp} (tiles/JPEG gate)")
    if len(offsets) != len(counts):
        raise ImageFormatError("strip offsets/counts mismatch")

    row_bytes = w * spp
    out = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise ImageFormatError("TIFF strip out of range")
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        if nrows <= 0:
            raise ImageFormatError("more strips than rows")
        expected = nrows * row_bytes
        raw = data[off:off + cnt]
        if comp == 1:
            if len(raw) < expected:
                raise ImageFormatError("TIFF strip short")
            strip = raw[:expected]
        elif comp == 32773:
            strip = _unpackbits(raw, expected)
        else:
            strip = _tiff_lzw_decode(raw, expected)
        out += strip
    arr = np.frombuffer(bytes(out), np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing per sample lane: undo by cumsum
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    elif predictor != 1:
        raise ImageFormatError(f"unsupported TIFF predictor {predictor}")
    if photo == 3:              # palette
        cmap = tags.get(_COLORMAP)
        if not cmap or len(cmap) < 3 * 256:
            raise ImageFormatError("palette TIFF missing ColorMap")
        cm = (np.array(cmap[:3 * 256], np.uint32)
              .reshape(3, 256).T // 257).astype(np.uint8)
        return cm[arr[:, :, 0]]
    if spp == 1:
        gray = arr[:, :, 0]
        if photo == 0:          # WhiteIsZero
            gray = (255 - gray.astype(np.int16)).astype(np.uint8)
        return gray
    return arr[:, :, :3].copy()


# ---------------------------------------------------------------------------
# Encoder (test mirror)
# ---------------------------------------------------------------------------


def _packbits(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 1 < n and row[i + 1] == row[i]
                        and (i + 2 >= n or row[i + 2] == row[i]))):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


class _TiffLzwWriter:
    """MSB-first early-change LZW (the encoder twin of
    _tiff_lzw_decode — independent table/width bookkeeping)."""

    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._cnt = 0
        self._reset()

    def _reset(self):
        self.table = {bytes([i]): i for i in range(256)}
        self.next_code = 258
        self.width = 9

    def _put(self, code: int):
        self._acc = (self._acc << self.width) | code
        self._cnt += self.width
        while self._cnt >= 8:
            self.out.append((self._acc >> (self._cnt - 8)) & 0xFF)
            self._cnt -= 8
        self._acc &= (1 << self._cnt) - 1

    def encode(self, pixels: bytes) -> bytes:
        self._put(256)                      # Clear
        run = b""
        for p in pixels:
            cand = run + bytes([p])
            if cand in self.table:
                run = cand
                continue
            self._put(self.table[run])
            if self.next_code < 4096:
                self.table[cand] = self.next_code
                self.next_code += 1
                # the decoder's dictionary is one entry BEHIND the
                # encoder's at each reception, so the encoder's early
                # change lands one assignment after the decoder's
                # (decoder: after adding 2^n - 2; encoder: after
                # adding 2^n - 1)
                if self.next_code == (1 << self.width) \
                        and self.width < 12:
                    self.width += 1
            else:
                self._put(256)
                self._reset()
            run = bytes([p])
        if run:
            self._put(self.table[run])
        self._put(257)                      # EOI
        if self._cnt:
            self.out.append((self._acc << (8 - self._cnt)) & 0xFF)
        return bytes(self.out)


def encode_tiff(arr: np.ndarray, *, compression: int = 1,
                predictor: int = 1, rows_per_strip: int | None = None,
                byte_order: str = "<",
                photometric: int | None = None,
                colormap: np.ndarray | None = None) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB -> baseline TIFF with
    compression 1 (none), 5 (LZW) or 32773 (PackBits); predictor 2
    (horizontal differencing) valid with LZW. ``photometric``
    overrides the inferred interpretation (0 = WhiteIsZero for
    inverted scans, 3 = palette with ``colormap`` as a (256, 3)
    uint16 table)."""
    arr = np.asarray(arr, np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    spp = 1 if gray else arr.shape[2]
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5 or 32773")
    if predictor == 2 and compression != 5:
        raise ValueError("predictor 2 is an LZW option")
    rows_per_strip = rows_per_strip or h
    pix = arr.reshape(h, w * spp) if not gray else arr
    if predictor == 2:
        lanes = arr.reshape(h, w, spp).astype(np.int16)
        diff = np.empty_like(lanes)
        diff[:, 0] = lanes[:, 0]
        diff[:, 1:] = lanes[:, 1:] - lanes[:, :-1]
        pix = (diff % 256).astype(np.uint8).reshape(h, w * spp)

    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = pix[y0:y0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(_packbits(raw))
        else:
            strips.append(_TiffLzwWriter().encode(raw))

    o = byte_order
    entries = []

    def tag(tid, typ, vals):
        entries.append((tid, typ, vals))

    tag(_W, 3, [w])
    tag(_H, 3, [h])
    tag(_BITS, 3, [8] * spp)
    tag(_COMP, 3, [compression])
    photo = photometric if photometric is not None else (1 if gray
                                                         else 2)
    tag(_PHOTO, 3, [photo])
    tag(_SPP, 3, [spp])
    tag(_ROWS_PER_STRIP, 3, [rows_per_strip])
    if predictor != 1:
        tag(_PREDICTOR, 3, [predictor])
    if colormap is not None:
        cm = np.asarray(colormap, np.uint16)
        if cm.shape != (256, 3):
            raise ValueError("colormap must be (256, 3) uint16")
        tag(_COLORMAP, 3, [int(v) for v in cm.T.reshape(-1)])

    # layout: header(8) + IFD + tag overflow + strip data
    n_tags = len(entries) + 2       # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n_tags + 4
    heap = bytearray()
    heap_base = ifd_off + ifd_size

    def pack_vals(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return b"".join(struct.pack(o + fmt, v) for v in vals)

    strip_count = len(strips)
    # reserve heap space for strip tables if needed, then strip bytes
    def heap_put(blob):
        off = heap_base + len(heap)
        heap.extend(blob)
        return off

    # place oversized tag values first
    placed = []
    for tid, typ, vals in entries:
        blob = pack_vals(typ, vals)
        if len(blob) <= 4:
            placed.append((tid, typ, len(vals), blob.ljust(4, b"\0")))
        else:
            off = heap_put(blob)
            placed.append((tid, typ, len(vals),
                           struct.pack(o + "I", off)))
    # strip tables
    tables_need_heap = strip_count > 1
    off_blob_pos = heap_base + len(heap)
    if tables_need_heap:
        heap.extend(b"\0" * 4 * strip_count)       # offsets placeholder
    cnt_blob = pack_vals(4, [len(s) for s in strips])
    if len(cnt_blob) <= 4:
        cnt_entry = cnt_blob.ljust(4, b"\0")
    else:
        cnt_entry = struct.pack(o + "I", heap_put(cnt_blob))
    # strip data
    strip_offs = []
    for s in strips:
        strip_offs.append(heap_put(s))
    if tables_need_heap:
        heap[off_blob_pos - heap_base:off_blob_pos - heap_base
             + 4 * strip_count] = pack_vals(4, strip_offs)
        off_entry = struct.pack(o + "I", off_blob_pos)
    else:
        off_entry = pack_vals(4, strip_offs).ljust(4, b"\0")
    placed.append((_STRIP_OFF, 4, strip_count, off_entry))
    placed.append((_STRIP_CNT, 4, strip_count, cnt_entry))
    placed.sort(key=lambda e: e[0])

    out = bytearray()
    out += (b"II*\x00" if o == "<" else b"MM\x00*")
    out += struct.pack(o + "I", ifd_off)
    out += struct.pack(o + "H", n_tags)
    for tid, typ, cnt, val4 in placed:
        out += struct.pack(o + "HHI", tid, typ, cnt) + val4
    out += struct.pack(o + "I", 0)          # no next IFD
    out += heap
    return bytes(out)
