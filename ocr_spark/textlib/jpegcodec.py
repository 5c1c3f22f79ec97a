"""Pure-Python/numpy JPEG codec — ITU-T T.81 from the spec.

The container ships no imaging library, and JPEG is the dominant image
format in any real web crawl — so, like the PNG/BMP/PPM decoders in
imagecodec.py, this is a complete implementation of the PUBLIC spec
(ITU-T Rec. T.81 / ISO 10918-1), not a stub:

  decode — baseline sequential (SOF0/SOF1) AND progressive (SOF2):
    * marker segment parsing: DQT (8/16-bit precision), DHT, SOF0/1/2,
      DRI, SOS; APPn/COM skipped by declared length
    * canonical Huffman decode built from BITS/HUFFVAL (Annex C)
    * byte-stuffing removal (FF 00) and restart-marker resync
      (byte-align, RSTn, DC predictor reset — Annex B.2.1/E.2.4)
    * differential DC with EXTEND sign recovery, AC run/size with
      ZRL and EOB (F.2.2.1-F.2.2.2), zigzag coefficient order
    * progressive scan accumulation (Annex G.2): spectral selection
      bands, successive-approximation point transforms, EOB runs,
      AC refinement with correction-bit ordering, interleaved DC /
      non-interleaved AC scan geometry
    * dequantization and the exact separable float IDCT (A.3.3) via
      a precomputed orthonormal 8x8 basis matrix, +128 level shift
    * chroma upsampling by sample replication to the luma grid, and
      JFIF full-range YCbCr -> RGB (CCIR 601 constants)
  encode (test/builder mirror, NOT the decoder run backwards: forward
    DCT + quantization + canonical Huffman assignment are independent
    code paths, so a shared sign/offset bug cannot cancel):
    * baseline: grayscale or YCbCr/RGB 3-component, 1x1 or 2x2
      subsampling, explicit or Annex-K-default quantization tables
    * progressive: arbitrary scan scripts (spectral bands +
      successive approximation) emitting the same quantized
      coefficients — decode(progressive) must equal decode(baseline)
      exactly, which is what the fuzz tests pin

Scope gates (raise ImageFormatError -> callers fall back to the
byte-histogram featurizer, same contract as every codec here):
arithmetic coding, hierarchical, lossless, 12-bit precision, and
CMYK/Adobe 4-component streams.

The Annex K quantization and Huffman tables are transcribed from the
spec; self-consistency is pinned by encoder<->decoder round-trips and
hand-assembled bitstream vectors in tests/test_jpegcodec.py, and a
PIL cross-check test runs wherever pillow is installed (skipped in
this container).
"""

from __future__ import annotations

import math

import numpy as np

from .imagecodec import ImageFormatError

# ---------------------------------------------------------------------------
# Spec constants
# ---------------------------------------------------------------------------

# zigzag scan: position k -> (row, col), generated per Figure 5 rather
# than transcribed (a typo here would be invisible to round-trips).


def _zigzag_order() -> list[tuple[int, int]]:
    order, r, c = [], 0, 0
    for _ in range(64):
        order.append((r, c))
        if (r + c) % 2 == 0:
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


ZIGZAG = _zigzag_order()
_ZROWS = np.array([r for r, _ in ZIGZAG])
_ZCOLS = np.array([c for _, c in ZIGZAG])

# Annex K.1/K.2 example quantization tables (row-major).
QUANT_LUMA_K1 = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

QUANT_CHROMA_K2 = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
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
     0xF9, 0xFA])
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA])

for _bits, _vals in (HUFF_AC_LUMA, HUFF_AC_CHROMA):
    assert sum(_bits) == len(_vals) == 162, "Annex K AC table transcription"

# Orthonormal DCT-II basis: A[x, u] = 0.5 * C(u) * cos((2x+1)u*pi/16).
# f = A @ F @ A.T  (IDCT, A.3.3);  F = A.T @ f @ A  (FDCT, A.3.3).
_A = np.array([[0.5 * (1 / math.sqrt(2) if u == 0 else 1.0)
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for u in range(8)] for x in range(8)])


def idct2(coef: np.ndarray) -> np.ndarray:
    """Exact float 2-D inverse DCT of one 8x8 coefficient block."""
    return _A @ coef @ _A.T


def fdct2(block: np.ndarray) -> np.ndarray:
    """Exact float 2-D forward DCT of one 8x8 sample block."""
    return _A.T @ block @ _A


def _build_decode_table(bits, huffval) -> dict:
    """Canonical Huffman (Annex C): {(length, code) -> symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits, huffval) -> dict:
    """Canonical Huffman: {symbol -> (code, length)}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[huffval[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00
    byte-unstuffing. Reading into a real marker raises — a conforming
    stream pads the final byte with 1-bits, so only corruption (or a
    desynced Huffman state) ever gets here."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._cur = 0
        self._cnt = 0

    def read_bit(self) -> int:
        if self._cnt == 0:
            d, p = self.data, self.pos
            if p >= len(d):
                raise ImageFormatError("truncated entropy data")
            b = d[p]
            if b == 0xFF:
                nxt = d[p + 1] if p + 1 < len(d) else None
                if nxt != 0x00:
                    raise ImageFormatError(
                        "entropy decode ran into marker "
                        f"FF {nxt:02X}" if nxt is not None else
                        "entropy decode ran off the stream")
                self.pos = p + 2
            else:
                self.pos = p + 1
            self._cur = b
            self._cnt = 8
        self._cnt -= 1
        return (self._cur >> self._cnt) & 1

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ImageFormatError("invalid Huffman code")

    def receive_extend(self, ssss: int) -> int:
        """RECEIVE + EXTEND (F.2.2.1): ssss magnitude bits to a signed
        coefficient value."""
        if ssss == 0:
            return 0
        v = 0
        for _ in range(ssss):
            v = (v << 1) | self.read_bit()
        if v < (1 << (ssss - 1)):
            v -= (1 << ssss) - 1
        return v

    def restart_sync(self) -> None:
        """Byte-align and consume the expected RSTn (E.2.4)."""
        self._cnt = 0
        d, p = self.data, self.pos
        if p + 1 >= len(d) or d[p] != 0xFF or not 0xD0 <= d[p + 1] <= 0xD7:
            raise ImageFormatError("expected restart marker")
        self.pos = p + 2


def _decode_block(reader: _BitReader, dc_table: dict, ac_table: dict,
                  pred: int) -> tuple[np.ndarray, int]:
    """One 8x8 data unit -> (zigzag coefficient vector, new DC pred)."""
    zz = np.zeros(64, dtype=np.int32)
    pred += reader.receive_extend(reader.decode_symbol(dc_table))
    zz[0] = pred
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:          # ZRL: run of 16 zeros
                k += 16
                continue
            break                # EOB
        k += r
        if k > 63:
            raise ImageFormatError("AC run past end of block")
        zz[k] = reader.receive_extend(s)
        k += 1
    return zz, pred


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr -> RGB uint8 (CCIR 601 constants)."""
    y = ycc[:, :, 0].astype(np.float64)
    cb = ycc[:, :, 1].astype(np.float64) - 128.0
    cr = ycc[:, :, 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB -> YCbCr uint8."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.round(np.dstack([y, cb, cr])), 0, 255).astype(np.uint8)


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 array, (H, W) for grayscale or (H, W, 3)
    RGB. Decodes baseline sequential (SOF0/1) and progressive (SOF2,
    Annex G: spectral selection + successive approximation, EOB runs,
    AC refinement). Raises ImageFormatError on corrupt bytes or on
    processes outside that gate (arithmetic coding, hierarchical,
    lossless, 12-bit, 4-component)."""
    if not data.startswith(b"\xff\xd8"):
        raise ImageFormatError("not a JPEG stream (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    prog_state = None
    restart_interval = 0
    pos = 2
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ImageFormatError("ran off stream looking for marker")
        if data[pos] != 0xFF:
            raise ImageFormatError(f"expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xFF:       # fill byte, resync
            pos -= 1
            continue
        if marker == 0xD9:       # EOI
            if prog_state is not None:
                return _reconstruct_progressive(frame, prog_state,
                                                qtables)
            raise ImageFormatError("EOI before SOS")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue             # standalone markers
        if pos + 2 > n:
            raise ImageFormatError("truncated marker segment")
        seglen = (data[pos] << 8) | data[pos + 1]
        if seglen < 2 or pos + seglen > n:
            raise ImageFormatError("bad marker segment length")
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:       # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq not in (0, 1):
                    raise ImageFormatError("bad DQT precision")
                nbytes = 64 * (2 if pq else 1)
                if i + nbytes > len(seg):
                    raise ImageFormatError("truncated DQT")
                if pq:
                    vals = np.frombuffer(seg[i:i + 128],
                                         dtype=">u2").astype(np.int32)
                else:
                    vals = np.frombuffer(seg[i:i + 64],
                                         dtype=np.uint8).astype(np.int32)
                tab = np.zeros((8, 8), dtype=np.int32)
                tab[_ZROWS, _ZCOLS] = vals
                qtables[tq] = tab
                i += nbytes
        elif marker == 0xC4:     # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                nval = sum(bits)
                vals = list(seg[i + 17:i + 17 + nval])
                if len(vals) < nval:
                    raise ImageFormatError("truncated DHT")
                table = _build_decode_table(bits, vals)
                (ac_tables if tc else dc_tables)[th] = table
                i += 17 + nval
        elif marker in (0xC0, 0xC1, 0xC2):   # SOF0/1 baseline, SOF2 prog
            if seg[0] != 8:
                raise ImageFormatError("only 8-bit precision supported")
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            ncomp = seg[5]
            if h == 0 or w == 0:
                raise ImageFormatError("bad frame dimensions")
            if ncomp not in (1, 3):
                raise ImageFormatError(
                    f"{ncomp}-component JPEG not supported (CMYK gate)")
            comps = []
            for ci in range(ncomp):
                cid = seg[6 + 3 * ci]
                hv = seg[7 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": seg[8 + 3 * ci]})
                if not (1 <= comps[-1]["h"] <= 4
                        and 1 <= comps[-1]["v"] <= 4):
                    raise ImageFormatError("bad sampling factors")
            frame = {"w": w, "h": h, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageFormatError(
                "non-baseline/progressive JPEG process (arithmetic/"
                "hierarchical/lossless) not supported")
        elif marker == 0xDD:     # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:     # SOS
            if frame is None:
                raise ImageFormatError("SOS before SOF")
            if not frame["progressive"]:
                return _decode_scan(data, pos, seg, frame, qtables,
                                    dc_tables, ac_tables,
                                    restart_interval)
            if prog_state is None:
                prog_state = _init_progressive_state(frame)
            pos = _decode_progressive_scan(
                data, pos, seg, frame, prog_state, dc_tables,
                ac_tables, restart_interval)
        # APPn / COM / DNL: skipped by length


def _decode_scan(data, pos, seg, frame, qtables, dc_tables, ac_tables,
                 restart_interval) -> np.ndarray:
    ns = seg[0]
    comps = frame["comps"]
    if ns != len(comps):
        raise ImageFormatError("scan/frame component count mismatch")
    by_id = {c["id"]: c for c in comps}
    scan = []
    for i in range(ns):
        cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        c = by_id.get(cid)
        if c is None:
            raise ImageFormatError("scan names unknown component")
        if c["tq"] not in qtables:
            raise ImageFormatError("missing quantization table")
        if tt >> 4 not in dc_tables or tt & 0x0F not in ac_tables:
            raise ImageFormatError("missing Huffman table")
        scan.append((c, dc_tables[tt >> 4], ac_tables[tt & 0x0F],
                     qtables[c["tq"]]))
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if ns == 1:
        # non-interleaved: MCU is one data unit on the component's
        # own block grid (A.2.2)
        c = scan[0][0]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        mcus_x, mcus_y = -(-cw // 8), -(-ch // 8)
        units = [(0, 1, 1)]
    else:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        units = [(i, scan[i][0]["h"], scan[i][0]["v"])
                 for i in range(ns)]
    planes = []
    for i, (c, _, _, _) in enumerate(scan):
        if ns == 1:
            planes.append(np.zeros((mcus_y * 8, mcus_x * 8),
                                   dtype=np.uint8))
        else:
            planes.append(np.zeros((mcus_y * c["v"] * 8,
                                    mcus_x * c["h"] * 8),
                                   dtype=np.uint8))
    reader = _BitReader(data, pos)
    preds = [0] * ns
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.restart_sync()
                preds = [0] * ns
            for si, ch_, cv in units:
                c, dc_t, ac_t, q = scan[si]
                for by in range(cv):
                    for bx in range(ch_):
                        zz, preds[si] = _decode_block(
                            reader, dc_t, ac_t, preds[si])
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[_ZROWS, _ZCOLS] = zz * q[_ZROWS, _ZCOLS]
                        samp = np.clip(np.round(idct2(coef) + 128.0),
                                       0, 255).astype(np.uint8)
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch_ + bx) * 8
                        planes[si][y0:y0 + 8, x0:x0 + 8] = samp
            mcu += 1
    return _assemble_planes(planes, [s[0] for s in scan], w, h,
                            hmax, vmax)


def _assemble_planes(planes, comps, w, h, hmax, vmax) -> np.ndarray:
    """Crop each component plane to its sampled size, replicate up to
    the luma grid, crop to (h, w); single plane -> grayscale, three ->
    JFIF YCbCr -> RGB."""
    out_planes = []
    for p, c in zip(planes, comps):
        cw = -(-w * c["h"] // hmax)
        ch2 = -(-h * c["v"] // vmax)
        p = p[:ch2, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0]
    return ycbcr_to_rgb(np.dstack(out_planes))


# ---------------------------------------------------------------------------
# Progressive decode (Annex G.2): every scan accumulates coefficient
# bits into per-component (blocks_y, blocks_x, 64) zigzag arrays; the
# shared dequant + IDCT + assemble runs once after EOI.
# ---------------------------------------------------------------------------


def _comp_block_grid(frame, c):
    """(blocks_y, blocks_x) for a component — the MCU-padded grid
    (interleaved DC scans write the padded area; non-interleaved AC
    scans cover the component's own ceil grid, a subset)."""
    hmax = max(x["h"] for x in frame["comps"])
    vmax = max(x["v"] for x in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return mcus_y * c["v"], mcus_x * c["h"]


def _init_progressive_state(frame) -> dict:
    coef = []
    for c in frame["comps"]:
        by, bx = _comp_block_grid(frame, c)
        coef.append(np.zeros((by, bx, 64), dtype=np.int32))
    return {"coef": coef}


def _skip_to_marker(data: bytes, pos: int) -> int:
    """Advance past entropy data (incl. pad bits + stuffing) to the
    next real marker's 0xFF."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    raise ImageFormatError("ran off stream after scan")


def _refine_nonzero(block, k, reader, p1, m1) -> None:
    """One correction bit for a nonzero-history coefficient
    (G.2.3): a 1-bit moves the value one quantum away from zero if
    this scan's bit is not already set."""
    if reader.read_bit():
        if block[k] > 0:
            if not (block[k] & p1):
                block[k] += p1
        else:
            if not (block[k] & p1):
                block[k] += m1


def _decode_prog_ac_first(reader, block, ac_t, ss, se, al, state) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_symbol(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:            # EOBn
                eobrun = (1 << r) - 1
                if r:
                    eobrun += _receive_bits(reader, r)
                state["eobrun"] = eobrun
                return
            k += 16               # ZRL
            continue
        k += r
        if k > se:
            raise ImageFormatError("AC run past spectral end")
        block[k] = reader.receive_extend(s) << al
        k += 1


def _decode_prog_ac_refine(reader, block, ac_t, ss, se, al, state) -> None:
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_t)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # EOBn: the run INCLUDES this block — the tail
                    # below refines its remainder and decrements.
                    eobrun = 1 << r
                    if r:
                        eobrun += _receive_bits(reader, r)
                    state["eobrun"] = eobrun
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ImageFormatError(
                        "refinement scan coefficient size != 1")
                val = p1 if reader.read_bit() else m1
            # advance: r zero-history positions, refining nonzeros
            while k <= se:
                if block[k] != 0:
                    _refine_nonzero(block, k, reader, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                block[k] = val
            k += 1
    if state["eobrun"] > 0:
        # inside an EOB run: only correction bits for nonzeros remain
        while k <= se:
            if block[k] != 0:
                _refine_nonzero(block, k, reader, p1, m1)
            k += 1
        state["eobrun"] -= 1


def _receive_bits(reader, n: int) -> int:
    v = 0
    for _ in range(n):
        v = (v << 1) | reader.read_bit()
    return v


def _decode_progressive_scan(data, pos, seg, frame, state, dc_tables,
                             ac_tables, restart_interval) -> int:
    ns = seg[0]
    comps = frame["comps"]
    by_id = {c["id"]: i for i, c in enumerate(comps)}
    scomps = []
    for i in range(ns):
        cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        if cid not in by_id:
            raise ImageFormatError("scan names unknown component")
        scomps.append((by_id[cid], tt >> 4, tt & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
    if not (0 <= ss <= se <= 63):
        raise ImageFormatError("bad spectral selection")
    if ss == 0 and se != 0:
        raise ImageFormatError(
            "progressive DC and AC may not share a scan")
    if ss > 0 and ns != 1:
        raise ImageFormatError("progressive AC scans are one-component")

    reader = _BitReader(data, pos)
    sstate = {"eobrun": 0}
    preds = [0] * ns
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    def maybe_restart(unit_idx):
        nonlocal preds
        if restart_interval and unit_idx and \
                unit_idx % restart_interval == 0:
            reader.restart_sync()
            preds = [0] * ns
            sstate["eobrun"] = 0

    if ss == 0:
        # DC scan: interleaved in MCU order (or the one component)
        if ns > 1 or (ns == 1 and len(comps) == 1):
            mcus_x = -(-frame["w"] // (8 * hmax))
            mcus_y = -(-frame["h"] // (8 * vmax))
        else:
            c = comps[scomps[0][0]]
            cw = -(-frame["w"] * c["h"] // hmax)
            ch = -(-frame["h"] * c["v"] // vmax)
            mcus_x, mcus_y = -(-cw // 8), -(-ch // 8)
        mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart(mcu)
                for si, (ci, tdc, _) in enumerate(scomps):
                    c = comps[ci]
                    ch_, cv = (c["h"], c["v"]) if ns > 1 else (1, 1)
                    for byy in range(cv):
                        for bxx in range(ch_):
                            if ns > 1:
                                yb = my * cv + byy
                                xb = mx * ch_ + bxx
                            else:
                                yb, xb = my, mx
                            blk = state["coef"][ci][yb, xb]
                            if ah == 0:
                                if tdc not in dc_tables:
                                    raise ImageFormatError(
                                        "missing DC table")
                                diff = reader.receive_extend(
                                    reader.decode_symbol(dc_tables[tdc]))
                                preds[si] += diff
                                blk[0] = preds[si] << al
                            else:
                                if reader.read_bit():
                                    blk[0] |= 1 << al
                mcu += 1
    else:
        ci, _, tac = scomps[0]
        if tac not in ac_tables:
            raise ImageFormatError("missing AC table")
        ac_t = ac_tables[tac]
        c = comps[ci]
        cw = -(-frame["w"] * c["h"] // hmax)
        ch = -(-frame["h"] * c["v"] // vmax)
        bxs, bys = -(-cw // 8), -(-ch // 8)
        unit = 0
        for yb in range(bys):
            for xb in range(bxs):
                maybe_restart(unit)
                blk = state["coef"][ci][yb, xb]
                if ah == 0:
                    _decode_prog_ac_first(reader, blk, ac_t, ss, se,
                                          al, sstate)
                else:
                    _decode_prog_ac_refine(reader, blk, ac_t, ss, se,
                                           al, sstate)
                unit += 1
    return _skip_to_marker(data, reader.pos)


def _reconstruct_progressive(frame, state, qtables) -> np.ndarray:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qtables:
            raise ImageFormatError("missing quantization table")
        q = qtables[c["tq"]][_ZROWS, _ZCOLS].astype(np.int64)
        coef = state["coef"][ci]
        by, bx = coef.shape[:2]
        plane = np.zeros((by * 8, bx * 8), dtype=np.uint8)
        for yb in range(by):
            for xb in range(bx):
                mat = np.zeros((8, 8), dtype=np.float64)
                mat[_ZROWS, _ZCOLS] = coef[yb, xb] * q
                plane[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] = np.clip(
                    np.round(idct2(mat) + 128.0), 0, 255)
        planes.append(plane)
    return _assemble_planes(planes, comps, frame["w"], frame["h"],
                            hmax, vmax)


# ---------------------------------------------------------------------------
# Encoder (test/builder mirror)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self._acc = 0
        self._cnt = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> i) & 1)
            self._cnt += 1
            if self._cnt == 8:
                b = self._acc & 0xFF
                self.buf.append(b)
                if b == 0xFF:
                    self.buf.append(0x00)   # byte stuffing
                self._acc = 0
                self._cnt = 0

    def flush(self) -> None:
        while self._cnt:
            self.write(1, 1)    # pad with 1-bits (B.2.1)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (SSSS category, magnitude bits per EXTEND)."""
    if v == 0:
        return 0, 0
    ssss = abs(v).bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _encode_block(bw: _BitWriter, coef_zz: np.ndarray, dc_map: dict,
                  ac_map: dict, pred: int) -> int:
    dc = int(coef_zz[0])
    ssss, bits = _magnitude(dc - pred)
    code, length = dc_map[ssss]
    bw.write(code, length)
    if ssss:
        bw.write(bits, ssss)
    run = 0
    nz = np.nonzero(coef_zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_map[0xF0]     # ZRL
            bw.write(code, length)
            run -= 16
        ssss, bits = _magnitude(v)
        code, length = ac_map[(run << 4) | ssss]
        bw.write(code, length)
        bw.write(bits, ssss)
        run = 0
    if last < 63:
        code, length = ac_map[0x00]         # EOB
        bw.write(code, length)
    return dc


def _pad_to_blocks(plane: np.ndarray, bh: int, bw_: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw_ - w)), mode="edge")


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tid])
                + bytes(int(table[r, c]) for r, c in ZIGZAG))


def _dht_segment(tc: int, th: int, bits, huffval) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits)
                + bytes(huffval))


def encode_jpeg_baseline(arr: np.ndarray, *, subsample: tuple[int, int] = (2, 2),
                         quant_luma: np.ndarray | None = None,
                         quant_chroma: np.ndarray | None = None,
                         colorspace: str = "rgb") -> bytes:
    """Encode a uint8 array as baseline sequential JPEG.

    ``arr`` is (H, W) grayscale, or (H, W, 3) in ``colorspace`` "rgb"
    (converted to YCbCr here) or "ycbcr" (planes used as-is — the
    planted-payload builder path, where exact integer plane values
    must survive to the bitstream). ``subsample`` is the chroma
    (horizontal, vertical) factor — (1, 1) or (2, 2). Quant tables
    default to Annex K; pass flat tables for near-lossless tests."""
    arr = np.asarray(arr, dtype=np.uint8)
    ql = QUANT_LUMA_K1 if quant_luma is None else np.asarray(quant_luma)
    qc = (QUANT_CHROMA_K2 if quant_chroma is None
          else np.asarray(quant_chroma))
    if subsample not in ((1, 1), (2, 2)):
        raise ValueError("subsample must be (1,1) or (2,2)")
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comp_planes = [arr]
        samp = [(1, 1)]
        qmap = [0]
    else:
        ycc = arr if colorspace == "ycbcr" else rgb_to_ycbcr(arr)
        sx, sy = subsample
        y = ycc[:, :, 0]
        if sx == 1:
            cb, cr = ycc[:, :, 1], ycc[:, :, 2]
        else:
            ch = -(-h // sy) * sy
            cw = -(-w // sx) * sx
            full = np.pad(ycc[:, :, 1:].astype(np.float64),
                          ((0, ch - h), (0, cw - w), (0, 0)), mode="edge")
            boxes = full.reshape(ch // sy, sy, cw // sx, sx, 2)
            sub = np.clip(np.round(boxes.mean(axis=(1, 3))),
                          0, 255).astype(np.uint8)
            cb, cr = sub[:, :, 0], sub[:, :, 1]
        comp_planes = [y, cb, cr]
        samp = [subsample, (1, 1), (1, 1)]
        qmap = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = []
    for p, (ch_, cv) in zip(comp_planes, samp):
        padded.append(_pad_to_blocks(p, mcus_y * cv * 8, mcus_x * ch_ * 8))

    out = bytearray(b"\xff\xd8")       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qmap[ci]])
    out += _seg(0xC0, sof)
    out += _dht_segment(0, 0, *HUFF_DC_LUMA)
    out += _dht_segment(1, 0, *HUFF_AC_LUMA)
    if not gray:
        out += _dht_segment(0, 1, *HUFF_DC_CHROMA)
        out += _dht_segment(1, 1, *HUFF_AC_CHROMA)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tt = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, tt])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_maps = [_build_encode_table(*HUFF_DC_LUMA)]
    ac_maps = [_build_encode_table(*HUFF_AC_LUMA)]
    if not gray:
        dc_maps.append(_build_encode_table(*HUFF_DC_CHROMA))
        ac_maps.append(_build_encode_table(*HUFF_AC_CHROMA))
        dc_maps.append(dc_maps[1])
        ac_maps.append(ac_maps[1])
    qts = [ql] + ([] if gray else [qc, qc])
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                ch_, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch_):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch_ + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8] \
                            .astype(np.float64) - 128.0
                        coef = fdct2(block)
                        q = qts[ci]
                        zz = np.round(coef[_ZROWS, _ZCOLS]
                                      / q[_ZROWS, _ZCOLS]).astype(np.int32)
                        preds[ci] = _encode_block(
                            bw, zz, dc_maps[ci], ac_maps[ci], preds[ci])
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"                 # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (Annex G.1 — test mirror for the SOF2 decoder).
# Independent of the decoder: spectral bands + successive-approximation
# point transforms, EOB-run accumulation, and refinement-bit buffering
# are emitted from the quantized coefficients directly.
# ---------------------------------------------------------------------------


# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the Annex K
# baseline tables do not contain (baseline never uses them) — real
# progressive encoders ship custom DHTs. This fixed flat-8-bit table
# covers every symbol a progressive AC scan can emit (EOB0..EOB14,
# ZRL, (run 0-15, size 1-14)): 240 codes of length 8, Kraft sum
# 240/256 < 1, the all-ones code unused. Compression-suboptimal,
# conformance-exact.
_PROG_AC_SYMBOLS = ([r << 4 for r in range(15)] + [0xF0]
                    + [(r << 4) | s
                       for r in range(16) for s in range(1, 15)])
PROG_AC_TABLE = ([0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
                 _PROG_AC_SYMBOLS)
assert len(_PROG_AC_SYMBOLS) == 240


def _prep_components(arr, subsample, ql, qc, colorspace):
    """Shared front half of both encoders: planes, sampling factors,
    quant map, MCU grid."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comp_planes = [arr]
        samp = [(1, 1)]
        qts = [ql]
    else:
        ycc = arr if colorspace == "ycbcr" else rgb_to_ycbcr(arr)
        sx, sy = subsample
        y = ycc[:, :, 0]
        if sx == 1:
            cb, cr = ycc[:, :, 1], ycc[:, :, 2]
        else:
            ch = -(-h // sy) * sy
            cw = -(-w // sx) * sx
            full = np.pad(ycc[:, :, 1:].astype(np.float64),
                          ((0, ch - h), (0, cw - w), (0, 0)), mode="edge")
            boxes = full.reshape(ch // sy, sy, cw // sx, sx, 2)
            sub = np.clip(np.round(boxes.mean(axis=(1, 3))),
                          0, 255).astype(np.uint8)
            cb, cr = sub[:, :, 0], sub[:, :, 1]
        comp_planes = [y, cb, cr]
        samp = [subsample, (1, 1), (1, 1)]
        qts = [ql, qc, qc]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    return comp_planes, samp, qts, hmax, vmax, mcus_x, mcus_y, h, w, gray


def _coef_blocks(plane, q, by, bx):
    """Quantized zigzag coefficient array (by, bx, 64) of one padded
    component plane."""
    padded = _pad_to_blocks(plane, by * 8, bx * 8)
    out = np.zeros((by, bx, 64), dtype=np.int32)
    qz = q[_ZROWS, _ZCOLS]
    for yb in range(by):
        for xb in range(bx):
            block = padded[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] \
                .astype(np.float64) - 128.0
            out[yb, xb] = np.round(
                fdct2(block)[_ZROWS, _ZCOLS] / qz).astype(np.int32)
    return out


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (G.1.2.2): magnitude shift, sign kept."""
    return -((-v) >> al) if v < 0 else v >> al


class _EobState:
    """EOB-run + buffered-correction-bit accumulator for one AC scan."""

    def __init__(self, bw, ac_map):
        self.bw = bw
        self.ac_map = ac_map
        self.run = 0
        self.bits: list[int] = []

    def flush(self):
        while self.run > 0:
            r = min(14, self.run.bit_length() - 1)
            n = min(self.run, (1 << (r + 1)) - 1)
            code, length = self.ac_map[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(n - (1 << r), r)
            self.run -= n
        for b in self.bits:
            self.bw.write(b, 1)
        self.bits = []


def _emit_ac_first_block(eob: _EobState, vals) -> None:
    nz = np.nonzero(vals)[0]
    if len(nz) == 0:
        eob.run += 1
        if eob.run == 0x7FFF:
            eob.flush()
        return
    eob.flush()
    bw, ac_map = eob.bw, eob.ac_map
    last = nz[-1]
    r = 0
    for k in range(last + 1):
        v = int(vals[k])
        if v == 0:
            r += 1
            continue
        while r >= 16:
            code, length = ac_map[0xF0]
            bw.write(code, length)
            r -= 16
        ssss, bits = _magnitude(v)
        code, length = ac_map[(r << 4) | ssss]
        bw.write(code, length)
        bw.write(bits, ssss)
        r = 0
    if last < len(vals) - 1:
        eob.run += 1
        if eob.run == 0x7FFF:
            eob.flush()


def _emit_ac_refine_block(eob: _EobState, vals) -> None:
    """One block of an AC refinement scan (G.1.2.3 semantics, the
    shape public progressive encoders share): newly-significant
    coefficients (|shifted| == 1) emit (run<<4)|1 + sign with the
    correction bits of crossed history coefficients appended;
    history coefficients (|shifted| > 1) buffer their low bit; ZRL
    only before the last newly-significant position; everything after
    it folds into the shared EOB run (block INCLUDED — the decoder's
    run consumption starts with this block's tail)."""
    bw, ac_map = eob.bw, eob.ac_map
    absv = [abs(int(v)) for v in vals]
    new_sig = [k for k, t in enumerate(absv) if t == 1]
    eobk = new_sig[-1] if new_sig else -1
    r = 0
    pending: list[int] = []
    for k, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobk:
            eob.flush()
            code, length = ac_map[0xF0]
            bw.write(code, length)
            r -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:                        # history: correction bit
            pending.append(t & 1)
            continue
        eob.flush()
        code, length = ac_map[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(vals[k]) > 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        eob.run += 1
        eob.bits.extend(pending)
        if eob.run == 0x7FFF:
            eob.flush()


DEFAULT_PROG_SCANS = (
    # (comp_selector, ss, se, ah, al): "all" = interleaved DC
    ("all", 0, 0, 0, 1),
    ("each", 1, 5, 0, 2),
    ("each", 6, 63, 0, 2),
    ("each", 1, 5, 2, 1),
    ("each", 6, 63, 2, 1),
    ("all", 0, 0, 1, 0),
    ("each", 1, 5, 1, 0),
    ("each", 6, 63, 1, 0),
)


def encode_jpeg_progressive(arr: np.ndarray, *,
                            subsample: tuple[int, int] = (2, 2),
                            quant_luma: np.ndarray | None = None,
                            quant_chroma: np.ndarray | None = None,
                            colorspace: str = "rgb",
                            scans=DEFAULT_PROG_SCANS) -> bytes:
    """Encode as progressive JPEG (SOF2) with the given scan script.

    The default script runs spectral selection (DC; AC 1-5; AC 6-63)
    with successive approximation (DC Al=1 then the refinement bit;
    AC Al=2 then two refinement passes to 0), so a conforming decoder
    must exercise EOB runs, ZRL-in-refinement, correction-bit order,
    and band-by-band accumulation — and the final coefficients equal
    the baseline encoding's exactly (test-pinned)."""
    ql = QUANT_LUMA_K1 if quant_luma is None else np.asarray(quant_luma)
    qc = (QUANT_CHROMA_K2 if quant_chroma is None
          else np.asarray(quant_chroma))
    if subsample not in ((1, 1), (2, 2)):
        raise ValueError("subsample must be (1,1) or (2,2)")
    (comp_planes, samp, qts, hmax, vmax, mcus_x, mcus_y, h, w,
     gray) = _prep_components(arr, subsample, ql, qc, colorspace)
    ncomp = len(comp_planes)
    coefs = []
    for ci in range(ncomp):
        ch_, cv = samp[ci]
        coefs.append(_coef_blocks(comp_planes[ci], qts[ci],
                                  mcus_y * cv, mcus_x * ch_))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1],
                      0 if ci == 0 else 1])
    out += _seg(0xC2, sof)
    out += _dht_segment(0, 0, *HUFF_DC_LUMA)
    out += _dht_segment(1, 2, *PROG_AC_TABLE)
    if not gray:
        out += _dht_segment(0, 1, *HUFF_DC_CHROMA)
    dc_maps = [_build_encode_table(*HUFF_DC_LUMA)]
    prog_ac_map = _build_encode_table(*PROG_AC_TABLE)
    ac_maps = [prog_ac_map]
    if not gray:
        dc_maps += [_build_encode_table(*HUFF_DC_CHROMA)] * 2
        ac_maps += [prog_ac_map] * 2

    for sel, ss, se, ah, al in scans:
        if ss == 0:
            # DC scan, interleaved over every component
            sos = bytes([ncomp])
            for ci in range(ncomp):
                sos += bytes([ci + 1, (0 if ci == 0 else 1) << 4])
            sos += bytes([0, 0, (ah << 4) | al])
            out += _seg(0xDA, sos)
            bw = _BitWriter()
            preds = [0] * ncomp
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci in range(ncomp):
                        ch_, cv = samp[ci] if ncomp > 1 else (1, 1)
                        for byy in range(cv):
                            for bxx in range(ch_):
                                dc = int(coefs[ci][my * cv + byy,
                                                   mx * ch_ + bxx, 0])
                                if ah == 0:
                                    v = dc >> al      # arithmetic shift
                                    ssss, bits = _magnitude(v - preds[ci])
                                    code, length = dc_maps[ci][ssss]
                                    bw.write(code, length)
                                    if ssss:
                                        bw.write(bits, ssss)
                                    preds[ci] = v
                                else:
                                    bw.write((dc >> al) & 1, 1)
            bw.flush()
            out += bw.buf
        else:
            for ci in (range(ncomp) if sel == "each" else [0]):
                sos = bytes([1, ci + 1, 0x02]) \
                    + bytes([ss, se, (ah << 4) | al])
                out += _seg(0xDA, sos)
                bw = _BitWriter()
                eob = _EobState(bw, ac_maps[ci])
                ch_, cv = samp[ci]
                cw = -(-w * ch_ // hmax)
                chh = -(-h * cv // vmax)
                bxs, bys = -(-cw // 8), -(-chh // 8)
                for yb in range(bys):
                    for xb in range(bxs):
                        band = coefs[ci][yb, xb, ss:se + 1]
                        if ah == 0:
                            vals = np.array(
                                [_pt_ac(int(v), al) for v in band],
                                dtype=np.int64)
                            _emit_ac_first_block(eob, vals)
                        else:
                            vals = np.array(
                                [_pt_ac(int(v), al) for v in band],
                                dtype=np.int64)
                            _emit_ac_refine_block(eob, vals)
                eob.flush()
                bw.flush()
                out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
