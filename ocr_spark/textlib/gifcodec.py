"""Pure-Python/numpy GIF codec — GIF87a/GIF89a from the spec.

The third pillar of crawl-image coverage next to PNG and JPEG: GIF is
still everywhere on the public web (and is the one ANIMATED format a
frame-sampling pipeline routinely meets). Implemented from the public
specification (CompuServe GIF89a, 1990; W3C mirror) in stdlib + numpy:

  decode:
    * header + logical screen descriptor, global/local color tables
    * variable-code-size LZW decompression (the GIF flavor: clear +
      end-of-information codes, code width growth at 2^n, max 12 bits)
    * image descriptors with interlacing (the 4-pass row order) and
      local-palette override
    * GIF89a graphic control extensions: transparency index and frame
      disposal (restore-to-background = clear to transparent/bg,
      restore-to-previous, and the do-not-dispose compositing chain)
    * multi-frame iteration with every-Nth sampling at the PARSE —
      skipped frames still decode (GIF frames depend on their
      predecessors) but are not composited/emitted
  encode (test mirror — an independent LZW compressor, not the
  decompressor inverted):
    * single- or multi-frame, global palette, optional transparency,
      interlacing flag, per-frame delays

decode_gif returns (H, W, 3) RGB for the first frame (transparency
composited over the background color); decode_gif_frames iterates
(index, RGB) like avcodec.decode_y4m_frames so multimodal's video
sampler can treat animated GIFs as streams.

Raises imagecodec.ImageFormatError on corrupt bytes — callers fall
back to the byte-histogram featurizer, the same contract as every
codec in this package.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageFormatError

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# interlace passes: (row_start, row_step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _read_color_table(data: bytes, pos: int, size: int):
    end = pos + 3 * size
    if end > len(data):
        raise ImageFormatError("truncated GIF color table")
    table = np.frombuffer(data[pos:end], np.uint8).reshape(size, 3)
    return table, end


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a data-sub-block chain, returning (bytes, new_pos)
    past the block terminator."""
    out = bytearray()
    n = len(data)
    while True:
        if pos >= n:
            raise ImageFormatError("truncated GIF sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ImageFormatError("truncated GIF sub-block")
        out += data[pos:pos + size]
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """GIF-flavor LZW: variable code width starting at
    min_code_size+1, CLEAR resets the dictionary, EOI ends the stream;
    output capped at ``expected`` pixels (defensive against dictionary
    bombs)."""
    if not 2 <= min_code_size <= 11:
        raise ImageFormatError("bad GIF LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    bitpos = 0
    nbits = len(data) * 8

    def fresh():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while bitpos + width <= nbits:
        byte0 = bitpos >> 3
        chunk = int.from_bytes(data[byte0:byte0 + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ImageFormatError("bad first GIF LZW code")
        else:
            entry = table.get(code)
            if entry is None:
                if code != next_code:
                    raise ImageFormatError("GIF LZW code out of range")
                entry = prev + prev[:1]
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
        out += entry
        if len(out) >= expected:
            break
        prev = entry
    if len(out) < expected:
        raise ImageFormatError("GIF LZW stream ended short")
    return out[:expected]


def decode_gif_frames(data: bytes, every_n: int = 1,
                      max_frames: int | None = None):
    """Iterate (frame_index, RGB uint8 array) over a GIF stream with
    every-Nth sampling. All frames DECODE (disposal compositing needs
    the chain); only sampled frames convert to RGB and yield."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    if data[:6] not in GIF_MAGICS:
        raise ImageFormatError("not a GIF stream")
    if len(data) < 13:
        raise ImageFormatError("truncated GIF header")
    w, h = struct.unpack("<HH", data[6:10])
    if w == 0 or h == 0:
        raise ImageFormatError("bad GIF dimensions")
    flags = data[10]
    bg_index = data[11]
    pos = 13
    global_table = None
    if flags & 0x80:
        global_table, pos = _read_color_table(
            data, pos, 2 << (flags & 0x07))

    # canvas holds palette-resolved RGB + an alpha bit (transparent
    # pixels show the background color on output)
    canvas = np.zeros((h, w, 3), np.uint8)
    alpha = np.zeros((h, w), bool)
    if global_table is not None and bg_index < len(global_table):
        canvas[:, :] = global_table[bg_index]

    transparent = None
    disposal = 0
    idx = emitted = 0
    n = len(data)
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:        # trailer
            return
        if block == 0x21:        # extension
            if pos >= n:
                raise ImageFormatError("truncated GIF extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:   # graphic control
                disposal = (body[0] >> 2) & 0x07
                transparent = body[3] if body[0] & 1 else None
            continue
        if block != 0x2C:        # image descriptor
            raise ImageFormatError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > n:
            raise ImageFormatError("truncated GIF image descriptor")
        ix, iy, iw, ih = struct.unpack("<HHHH", data[pos:pos + 8])
        iflags = data[pos + 8]
        pos += 9
        if ix + iw > w or iy + ih > h or iw == 0 or ih == 0:
            raise ImageFormatError("GIF frame exceeds logical screen")
        table = global_table
        if iflags & 0x80:
            table, pos = _read_color_table(
                data, pos, 2 << (iflags & 0x07))
        if table is None:
            raise ImageFormatError("GIF frame has no color table")
        if pos >= n:
            raise ImageFormatError("truncated GIF image data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        pixels = np.frombuffer(
            _lzw_decode(lzw, min_code, iw * ih), np.uint8)
        if int(pixels.max(initial=0)) >= len(table):
            raise ImageFormatError("GIF pixel index outside palette")
        grid = np.empty((ih, iw), np.uint8)
        rect = pixels.reshape(ih, iw)
        if iflags & 0x40:        # interlaced: 4-pass row order
            src = 0
            for start, step in _INTERLACE:
                rows = range(start, ih, step)
                grid[list(rows), :] = rect[src:src + len(rows), :]
                src += len(rows)
        else:
            grid = rect

        prev_canvas = canvas.copy() if disposal == 3 else None
        prev_alpha = alpha.copy() if disposal == 3 else None
        region_c = canvas[iy:iy + ih, ix:ix + iw]
        region_a = alpha[iy:iy + ih, ix:ix + iw]
        if transparent is not None:
            opaque = grid != transparent
        else:
            opaque = np.ones_like(grid, bool)
        region_c[opaque] = table[grid[opaque]]
        region_a[opaque] = True

        if idx % every_n == 0:
            yield idx, canvas.copy()
            emitted += 1
            if max_frames is not None and emitted >= max_frames:
                return
        idx += 1

        # disposal AFTER presentation (89a semantics)
        if disposal == 2:        # restore to background
            bg = (global_table[bg_index]
                  if global_table is not None
                  and bg_index < len(global_table)
                  else np.zeros(3, np.uint8))
            canvas[iy:iy + ih, ix:ix + iw] = bg
            alpha[iy:iy + ih, ix:ix + iw] = False
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
            alpha = prev_alpha
        transparent = None
        disposal = 0


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF as (H, W, 3) RGB uint8."""
    for _, rgb in decode_gif_frames(data, every_n=1, max_frames=1):
        return rgb
    raise ImageFormatError("GIF carries no image data")


# ---------------------------------------------------------------------------
# Encoder (test mirror): independent LZW compressor
# ---------------------------------------------------------------------------


class _LzwWriter:
    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.out = bytearray()
        self._acc = 0
        self._cnt = 0
        self._reset()

    def _reset(self):
        self.table = {bytes([i]): i for i in range(1 << self.min)}
        self.next_code = (1 << self.min) + 2
        self.width = self.min + 1

    def _put(self, code: int):
        self._acc |= code << self._cnt
        self._cnt += self.width
        while self._cnt >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._cnt -= 8

    def encode(self, pixels: bytes) -> bytes:
        clear = 1 << self.min
        eoi = clear + 1
        self._put(clear)
        run = b""
        for p in pixels:
            cand = run + bytes([p])
            if cand in self.table:
                run = cand
                continue
            self._put(self.table[run])
            if self.next_code < 4096:
                self.table[cand] = self.next_code
                # GIF writers grow the width when the NEXT code would
                # overflow the current width
                if self.next_code == (1 << self.width) and self.width < 12:
                    self.width += 1
                self.next_code += 1
            else:
                self._put(clear)
                self._reset()
            run = bytes([p])
        if run:
            self._put(self.table[run])
        self._put(eoi)
        if self._cnt:
            self.out.append(self._acc & 0xFF)
        return bytes(self.out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames, palette: np.ndarray, *,
               transparent: int | None = None,
               interlace: bool = False,
               disposals=None, bg_index: int = 0) -> bytes:
    """Assemble index-arrays into a GIF89a stream (test/builder
    helper). ``frames`` is a list of (H, W) uint8 palette-index
    arrays (full logical-screen size); ``palette`` is (N, 3) uint8
    with N a power of two >= 2; ``disposals`` optionally gives the
    per-frame disposal method."""
    palette = np.asarray(palette, np.uint8)
    npal = len(palette)
    if npal & (npal - 1) or npal < 2 or npal > 256:
        raise ValueError("palette size must be a power of two in 2..256")
    h, w = frames[0].shape
    depth = max(1, (npal - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), bg_index, 0])
    out += palette.tobytes()

    min_code = max(2, depth)
    for fi, frame in enumerate(frames):
        if frame.shape != (h, w):
            raise ValueError("frame shape mismatch")
        disposal = disposals[fi] if disposals else 0
        gce = bytes([(disposal << 2)
                     | (1 if transparent is not None else 0),
                     0, 0, transparent or 0])
        out += b"\x21\xf9\x04" + gce + b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        out += bytes([0x40 if interlace else 0x00])
        grid = np.asarray(frame, np.uint8)
        if interlace:
            rows = []
            for start, step in _INTERLACE:
                rows.extend(range(start, h, step))
            grid = grid[rows, :]
        out += bytes([min_code])
        out += _subblocks(_LzwWriter(min_code).encode(grid.tobytes()))
    out += b"\x3b"
    return bytes(out)
