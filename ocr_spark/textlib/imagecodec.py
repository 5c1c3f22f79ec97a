"""Pure-Python/numpy image codecs: PNG, BMP, PPM — no PIL/cv2.

The multimodal operators need REAL pixel access, and this environment
ships no imaging library — but PNG is just DEFLATE (zlib, available)
plus five per-row byte filters, BMP's BI_RGB form is raw bytes, and
PPM is trivially raw. So the decoders here are complete
implementations of the public formats, not stubs:

  * PNG  — W3C PNG spec (RFC 2083 / ISO 15948): chunk framing with
           CRC-32 verification, color types 0/2/3/4/6, bit depths
           1/2/4/8/16 (palette + grayscale sub-byte depths included),
           all five filters (None/Sub/Up/Average/Paeth), tRNS palette
           alpha, and Adam7 interlacing.
  * BMP  — BITMAPINFOHEADER, uncompressed (BI_RGB) 24/32-bit,
           bottom-up and top-down row orders, plus 8-bit paletted
           with or without RLE8 compression (r5).
  * PPM  — Netpbm P6, maxval <= 255.

JPEG (baseline sequential AND progressive) lives in its own module
(jpegcodec.py — entropy decode + DCT is a codec project of its own).

An encoder (`encode_png`) ships too — it drives the round-trip tests
and is deliberately NOT the decoder mirrored: it applies the forward
filter transform per row while the decoder reverses it, so a shared
sign/offset mistake cannot cancel out.

All decoders return numpy arrays shaped (H, W) for single-channel or
(H, W, C) otherwise, dtype uint8 (uint16 for 16-bit PNG).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class ImageFormatError(Exception):
    """Raised on corrupt or unsupported image bytes."""


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _iter_chunks(data: bytes):
    pos = len(PNG_SIGNATURE)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        end = pos + 8 + length
        if end + 4 > n:
            raise ImageFormatError(f"truncated chunk {ctype!r}")
        body = data[pos + 8:end]
        (crc,) = struct.unpack(">I", data[end:end + 4])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ImageFormatError(f"CRC mismatch in chunk {ctype!r}")
        yield ctype, body
        pos = end + 4
        if ctype == b"IEND":
            return
    raise ImageFormatError("missing IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, rowbytes: int, bpp: int) -> np.ndarray:
    """Reverse the per-row PNG filters. Returns (height, rowbytes) uint8.

    Filters 0/1/2 vectorize (Sub is a cumulative sum over bpp-strided
    lanes); Average and Paeth depend on the just-reconstructed left
    neighbor, so those rows fall back to a scalar loop.
    """
    if len(raw) != height * (rowbytes + 1):
        raise ImageFormatError(
            f"decompressed size {len(raw)} != expected "
            f"{height * (rowbytes + 1)} for {height} rows of {rowbytes}")
    src = np.frombuffer(raw, dtype=np.uint8).reshape(height, rowbytes + 1)
    out = np.zeros((height, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.uint8)
    for y in range(height):
        ftype = int(src[y, 0])
        row = src[y, 1:]
        if ftype == 0:
            rec = row.copy()
        elif ftype == 1:  # Sub
            lanes = row.reshape(-1, bpp).astype(np.uint32)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = row + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average — left-dependent: bytearray int loop
            # (Python ints over bytes are ~5-10x faster than per-item
            # numpy scalar access for these inherently sequential rows)
            rb = row.tobytes()
            pb = prev.tobytes()
            acc = bytearray(rowbytes)
            for x in range(bpp):
                acc[x] = (rb[x] + (pb[x] >> 1)) & 0xFF
            for x in range(bpp, rowbytes):
                acc[x] = (rb[x] + ((acc[x - bpp] + pb[x]) >> 1)) & 0xFF
            rec = np.frombuffer(bytes(acc), dtype=np.uint8)
        elif ftype == 4:  # Paeth — same sequential shape
            rb = row.tobytes()
            pb = prev.tobytes()
            acc = bytearray(rowbytes)
            for x in range(bpp):
                acc[x] = (rb[x] + pb[x]) & 0xFF  # a=c=0 -> predictor is b
            for x in range(bpp, rowbytes):
                a = acc[x - bpp]
                b = pb[x]
                c = pb[x - bpp]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb_ = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                if pa <= pb_ and pa <= pc:
                    pred = a
                elif pb_ <= pc:
                    pred = b
                else:
                    pred = c
                acc[x] = (rb[x] + pred) & 0xFF
            rec = np.frombuffer(bytes(acc), dtype=np.uint8)
        else:
            raise ImageFormatError(f"unknown PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out


def _rows_to_samples(rows: np.ndarray, width: int, channels: int,
                     bit_depth: int) -> np.ndarray:
    """(H, rowbytes) filtered-out bytes -> (H, width, channels) samples."""
    height = rows.shape[0]
    if bit_depth == 8:
        arr = rows[:, :width * channels]
        return arr.reshape(height, width, channels)
    if bit_depth == 16:
        arr = rows[:, :width * channels * 2].reshape(height, -1)
        flat = arr.reshape(height, width * channels, 2).astype(np.uint16)
        return ((flat[..., 0] << 8) | flat[..., 1]).reshape(
            height, width, channels)
    # 1/2/4-bit: packed big-endian within bytes, one channel only.
    bits = np.unpackbits(rows, axis=1)
    per = bit_depth
    vals = np.zeros((height, width), dtype=np.uint8)
    for k in range(per):
        vals = (vals << 1) | bits[:, k:width * per:per][:, :width]
    return vals.reshape(height, width, 1)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to (H, W[, C]) uint8/uint16 pixels."""
    if not data.startswith(PNG_SIGNATURE):
        raise ImageFormatError("not a PNG: bad signature")
    ihdr = None
    palette = None
    trns = None
    idat = []
    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            if len(body) % 3:
                raise ImageFormatError("PLTE length not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None:
        raise ImageFormatError("missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if width == 0 or height == 0:
        raise ImageFormatError("zero-sized image")
    if comp != 0 or filt != 0:
        raise ImageFormatError("unknown compression/filter method")
    if color_type not in _PNG_CHANNELS:
        raise ImageFormatError(f"unknown color type {color_type}")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ImageFormatError(f"bad bit depth {bit_depth}")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ImageFormatError(
            f"bit depth {bit_depth} invalid for color type {color_type}")
    if color_type == 3 and bit_depth == 16:
        raise ImageFormatError("palette images cannot be 16-bit")
    if color_type == 3 and palette is None:
        raise ImageFormatError("palette image missing PLTE")
    if not idat:
        raise ImageFormatError("missing IDAT")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ImageFormatError(f"corrupt IDAT stream: {e}") from None

    channels = _PNG_CHANNELS[color_type]
    bpp = max(1, (bit_depth * channels) // 8)

    def rowbytes(w: int) -> int:
        return (w * bit_depth * channels + 7) // 8

    if interlace == 0:
        rows = _unfilter(raw, height, rowbytes(width), bpp)
        img = _rows_to_samples(rows, width, channels, bit_depth)
    elif interlace == 1:  # Adam7
        dtype = np.uint16 if bit_depth == 16 else np.uint8
        img = np.zeros((height, width, channels), dtype=dtype)
        pos = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            nbytes = ph * (rowbytes(pw) + 1)
            rows = _unfilter(raw[pos:pos + nbytes], ph, rowbytes(pw), bpp)
            pos += nbytes
            img[y0::ys, x0::xs] = _rows_to_samples(rows, pw, channels,
                                                   bit_depth)
        if pos != len(raw):
            raise ImageFormatError("interlaced data length mismatch")
    else:
        raise ImageFormatError(f"unknown interlace method {interlace}")

    if color_type == 3:
        idx = img[..., 0]
        if int(idx.max()) >= len(palette):
            raise ImageFormatError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[:len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    if channels == 1:
        return img[..., 0]
    return img


# ---------------------------------------------------------------------------
# PNG encode (drives round-trip tests; forward filters, not the
# decoder mirrored)
# ---------------------------------------------------------------------------

def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    r = row.astype(np.int32)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int32)
    ul = np.zeros_like(up)
    ul[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - ((left + up) >> 1)
    elif ftype == 4:
        pred = np.array([_paeth(int(a), int(b), int(c))
                         for a, b, c in zip(left, up, ul)], dtype=np.int32)
        out = r - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int = 0,
               interlace: bool = False) -> bytes:
    """Encode (H, W[, C]) uint8 or uint16 pixels as PNG.

    ``filter_type`` picks the per-row filter (0-4, or -1 to cycle
    through all five — the test hook that exercises every decoder
    branch). Grayscale C=1, GA C=2, RGB C=3, RGBA C=4.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"bad image shape {arr.shape}")
    height, width, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if arr.dtype == np.uint16:
        bit_depth = 16
        flat = np.zeros((height, width, channels, 2), dtype=np.uint8)
        flat[..., 0] = arr >> 8
        flat[..., 1] = arr & 0xFF
        rows = flat.reshape(height, width * channels * 2)
    elif arr.dtype == np.uint8:
        bit_depth = 8
        rows = arr.reshape(height, width * channels)
    else:
        raise ValueError(f"bad dtype {arr.dtype}")
    bpp = max(1, (bit_depth * channels) // 8)

    def filter_image(img_rows: np.ndarray) -> bytes:
        prev = np.zeros(img_rows.shape[1], dtype=np.uint8)
        parts = []
        for y in range(img_rows.shape[0]):
            ft = (y % 5) if filter_type == -1 else filter_type
            parts.append(bytes([ft]))
            parts.append(_filter_row(ft, img_rows[y], prev, bpp).tobytes())
            prev = img_rows[y]
        return b"".join(parts)

    if not interlace:
        payload = filter_image(rows)
    else:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = arr[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            if bit_depth == 16:
                f = np.zeros(sub.shape + (2,), dtype=np.uint8)
                f[..., 0] = sub >> 8
                f[..., 1] = sub & 0xFF
                sub_rows = f.reshape(sub.shape[0], -1)
            else:
                sub_rows = sub.reshape(sub.shape[0], -1)
            parts.append(filter_image(sub_rows))
        payload = b"".join(parts)

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 1 if interlace else 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(payload))
            + _chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP / PPM decode
# ---------------------------------------------------------------------------

def decode_bmp(data: bytes) -> np.ndarray:
    """BMP -> uint8 pixels: uncompressed (BI_RGB) 24/32-bit RGB(A),
    plus 8-bit paletted with or without RLE8 (BI_RLE8) — the
    compression classic old scanners emit."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ImageFormatError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ImageFormatError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bits = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    (clr_used,) = struct.unpack("<I", data[46:50])
    if planes != 1:
        raise ImageFormatError("unsupported BMP planes")
    topdown = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ImageFormatError("bad BMP dimensions")
    if bits == 8 and compression in (0, 1):
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(data):
            raise ImageFormatError("truncated BMP palette")
        pal = np.frombuffer(data[pal_off:pal_end],
                            np.uint8).reshape(n_colors, 4)
        rgb = pal[:, [2, 1, 0]]                   # BGRX -> RGB
        if compression == 0:
            stride = (width + 3) & ~3
            need = pix_off + stride * height
            if len(data) < need:
                raise ImageFormatError("truncated BMP pixel data")
            idx = np.frombuffer(data[pix_off:need], np.uint8) \
                .reshape(height, stride)[:, :width]
        else:
            idx = _bmp_rle8(data[pix_off:], width, height)
        if int(idx.max(initial=0)) >= n_colors:
            raise ImageFormatError("BMP index outside palette")
        img = rgb[idx]
        return np.ascontiguousarray(img if topdown else img[::-1])
    if compression != 0 or bits not in (24, 32):
        raise ImageFormatError(
            f"unsupported BMP (bits={bits}, compression={compression})")
    nch = bits // 8
    stride = (width * nch + 3) & ~3
    need = pix_off + stride * height
    if len(data) < need:
        raise ImageFormatError("truncated BMP pixel data")
    rows = np.frombuffer(data[pix_off:need],
                         dtype=np.uint8).reshape(height, stride)
    img = rows[:, :width * nch].reshape(height, width, nch)
    if not topdown:
        img = img[::-1]
    # BGR(A) -> RGB(A)
    out = img[..., [2, 1, 0] + ([3] if nch == 4 else [])]
    return np.ascontiguousarray(out)


def _bmp_rle8(src: bytes, width: int, height: int) -> np.ndarray:
    """BI_RLE8 -> (H, W) palette indices, bottom-up row order as
    stored (the caller flips). Escapes per the spec: 00 00 end of
    line, 00 01 end of bitmap, 00 02 dx dy delta (skipped pixels stay
    index 0), 00 n>=3 absolute run padded to a word boundary."""
    out = np.zeros((height, width), np.uint8)
    x = y = i = 0
    n = len(src)
    while i + 1 < n:
        cnt, val = src[i], src[i + 1]
        i += 2
        if cnt > 0:                       # encoded run
            end = min(x + cnt, width)
            if y < height:
                out[y, x:end] = val
            x = end
            continue
        if val == 0:                      # end of line
            x, y = 0, y + 1
            if y > height:
                raise ImageFormatError("RLE8 ran past bitmap height")
            continue
        if val == 1:                      # end of bitmap
            return out
        if val == 2:                      # delta
            if i + 2 > n:
                raise ImageFormatError("truncated RLE8 delta")
            x += src[i]
            y += src[i + 1]
            i += 2
            if x > width or y > height:
                raise ImageFormatError("RLE8 delta out of range")
            continue
        run = val                          # absolute mode
        pad = run & 1
        if i + run + pad > n:
            raise ImageFormatError("truncated RLE8 absolute run")
        end = min(x + run, width)
        if y < height:
            out[y, x:end] = np.frombuffer(src[i:i + (end - x)], np.uint8)
        x = end
        i += run + pad
    raise ImageFormatError("RLE8 stream missing end-of-bitmap")


def decode_ppm(data: bytes) -> np.ndarray:
    """Netpbm P6 (maxval <= 255) -> (H, W, 3) uint8."""
    if data[:2] != b"P6":
        raise ImageFormatError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ImageFormatError("truncated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ImageFormatError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ImageFormatError("bad PPM dimensions")
    if not 0 < maxval <= 255:
        raise ImageFormatError(f"unsupported PPM maxval {maxval}")
    need = width * height * 3
    body = data[pos:pos + need]
    if len(body) < need:
        raise ImageFormatError("truncated PPM pixel data")
    return np.frombuffer(body, dtype=np.uint8).reshape(height, width, 3).copy()


# ---------------------------------------------------------------------------
# Pixel ops (resize / grayscale / features)
# ---------------------------------------------------------------------------

def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma. Passes single-channel through; alpha ignored."""
    if arr.ndim == 2:
        return arr
    if arr.shape[2] == 1:
        return arr[..., 0]
    if arr.shape[2] == 2:  # gray + alpha
        return arr[..., 0]
    rgb = arr[..., :3].astype(np.float64)
    y = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    return np.clip(np.round(y), 0, np.iinfo(arr.dtype).max).astype(arr.dtype)


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    if out_h <= 0 or out_w <= 0:
        raise ValueError("output size must be positive")
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(out_h) + 0.5) * h / out_h, h - 1).astype(int)
    xs = np.minimum((np.arange(out_w) + 0.5) * w / out_w, w - 1).astype(int)
    return arr[ys][:, xs]


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-center bilinear (the cv2/PIL convention)."""
    if out_h <= 0 or out_w <= 0:
        raise ValueError("output size must be positive")
    h, w = arr.shape[:2]
    squeeze = arr.ndim == 2
    img = arr[:, :, None].astype(np.float64) if squeeze else arr.astype(np.float64)
    sy = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    sx = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(sy).astype(int)
    x0 = np.floor(sx).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (sy - y0)[:, None, None]
    fx = (sx - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    out = np.clip(np.round(out), 0, np.iinfo(arr.dtype).max).astype(arr.dtype)
    return out[..., 0] if squeeze else out


def pixel_features(arr: np.ndarray, luma_bins: int = 16) -> list[float]:
    """Deterministic fixed-length feature vector from decoded pixels:

    [height, width, channels,
     mean/max per channel (4 slots, zero-padded),
     std/max per channel (4 slots, zero-padded),
     normalized ``luma_bins``-bin luma histogram]
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    maxv = float(np.iinfo(arr.dtype).max)
    flat = arr.reshape(-1, c).astype(np.float64)
    means = [0.0] * 4
    stds = [0.0] * 4
    for i in range(min(c, 4)):
        means[i] = float(flat[:, i].mean()) / maxv
        stds[i] = float(flat[:, i].std()) / maxv
    luma = to_grayscale(arr).astype(np.float64) / maxv
    hist, _ = np.histogram(luma, bins=luma_bins, range=(0.0, 1.0))
    hist = hist / luma.size
    return ([float(h), float(w), float(c)] + means + stds
            + [float(x) for x in hist])
