"""textlib/imagecodec: real PNG/BMP/PPM decode without PIL.

The round-trip tests are meaningful because encode applies the FORWARD
filter transform while decode reverses it — a shared sign/offset bug
cannot cancel. On top of that, `_unfilter` is cross-checked against an
independent byte-at-a-time reference implementation written here from
the PNG spec's recon equations.
"""

import struct
import zlib

import numpy as np
import pytest

from ocr_spark.textlib import imagecodec as ic


def _rng(seed=0):
    return np.random.RandomState(seed)


# ---------------------------------------------------------------------------
# PNG round trips
# ---------------------------------------------------------------------------

class TestPngRoundTrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4, -1])
    def test_uint8_all_filters(self, channels, filter_type):
        arr = _rng(channels * 10 + filter_type).randint(
            0, 256, size=(13, 7, channels), dtype=np.uint8)
        out = ic.decode_png(ic.encode_png(arr, filter_type=filter_type))
        expect = arr[..., 0] if channels == 1 else arr
        np.testing.assert_array_equal(out, expect)

    @pytest.mark.parametrize("channels", [1, 3, 4])
    def test_uint16(self, channels):
        arr = _rng(7).randint(0, 65536, size=(9, 5, channels)).astype(np.uint16)
        out = ic.decode_png(ic.encode_png(arr, filter_type=-1))
        expect = arr[..., 0] if channels == 1 else arr
        assert out.dtype == np.uint16
        np.testing.assert_array_equal(out, expect)

    @pytest.mark.parametrize("shape", [(1, 1, 3), (1, 9, 1), (9, 1, 4), (8, 8, 3)])
    def test_edge_sizes(self, shape):
        arr = _rng(3).randint(0, 256, size=shape, dtype=np.uint8)
        out = ic.decode_png(ic.encode_png(arr, filter_type=4))
        expect = arr[..., 0] if shape[2] == 1 else arr
        np.testing.assert_array_equal(out, expect)

    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("size", [(16, 16), (13, 7), (3, 3), (1, 10), (10, 1)])
    def test_adam7_interlaced(self, channels, size):
        arr = _rng(size[0] * 31 + channels).randint(
            0, 256, size=size + (channels,), dtype=np.uint8)
        out = ic.decode_png(ic.encode_png(arr, filter_type=-1, interlace=True))
        expect = arr[..., 0] if channels == 1 else arr
        np.testing.assert_array_equal(out, expect)

    def test_adam7_uint16(self):
        arr = _rng(11).randint(0, 65536, size=(12, 9, 3)).astype(np.uint16)
        out = ic.decode_png(ic.encode_png(arr, interlace=True))
        np.testing.assert_array_equal(out, arr)


# ---------------------------------------------------------------------------
# Unfilter vs an independent spec-equation reference
# ---------------------------------------------------------------------------

def _unfilter_reference(raw, height, rowbytes, bpp):
    """Byte-at-a-time Recon() from the PNG spec, independent of the
    module's vectorized implementation."""
    out = bytearray(height * rowbytes)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = raw[pos + 1:pos + 1 + rowbytes]
        pos += 1 + rowbytes
        for x in range(rowbytes):
            a = out[y * rowbytes + x - bpp] if x >= bpp else 0
            b = out[(y - 1) * rowbytes + x] if y > 0 else 0
            c = out[(y - 1) * rowbytes + x - bpp] if (x >= bpp and y > 0) else 0
            if ftype == 0:
                v = row[x]
            elif ftype == 1:
                v = row[x] + a
            elif ftype == 2:
                v = row[x] + b
            elif ftype == 3:
                v = row[x] + ((a + b) >> 1)
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[x] + pr
            out[y * rowbytes + x] = v & 0xFF
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(height, rowbytes)


@pytest.mark.parametrize("bpp", [1, 2, 3, 4, 6, 8])
def test_unfilter_matches_spec_reference(bpp):
    rng = _rng(bpp)
    height, rowbytes = 11, bpp * 6
    raw = bytearray()
    for y in range(height):
        raw.append(y % 5)  # every filter type
        raw.extend(rng.randint(0, 256, size=rowbytes, dtype=np.uint8).tobytes())
    got = ic._unfilter(bytes(raw), height, rowbytes, bpp)
    want = _unfilter_reference(bytes(raw), height, rowbytes, bpp)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------------------
# Hand-built PNGs: palette, tRNS, sub-byte depths
# ---------------------------------------------------------------------------

def _chunk(ctype, body):
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _manual_png(width, height, bit_depth, color_type, rows_payload,
                extra_chunks=()):
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, 0)
    out = ic.PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    for ctype, body in extra_chunks:
        out += _chunk(ctype, body)
    return out + _chunk(b"IDAT", zlib.compress(rows_payload)) + _chunk(b"IEND", b"")


class TestManualPng:
    def test_palette_with_trns(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
        trns = bytes([10, 200])  # alpha for entries 0 and 1; entry 2 -> 255
        # 3x2, 8-bit palette indices, filter 0 per row
        payload = b"\x00" + bytes([0, 1, 2]) + b"\x00" + bytes([2, 2, 0])
        data = _manual_png(3, 2, 8, 3, payload,
                           [(b"PLTE", plte), (b"tRNS", trns)])
        out = ic.decode_png(data)
        assert out.shape == (2, 3, 4)
        np.testing.assert_array_equal(out[0, 0], [255, 0, 0, 10])
        np.testing.assert_array_equal(out[0, 1], [0, 255, 0, 200])
        np.testing.assert_array_equal(out[0, 2], [0, 0, 255, 255])
        np.testing.assert_array_equal(out[1, 0], [0, 0, 255, 255])

    def test_1bit_grayscale(self):
        # 10x2 1-bit: row0 = 1010101010, row1 = 1111100000 (packed MSB-first)
        row0 = bytes([0b10101010, 0b10000000])
        row1 = bytes([0b11111000, 0b00000000])
        payload = b"\x00" + row0 + b"\x00" + row1
        out = ic.decode_png(_manual_png(10, 2, 1, 0, payload))
        assert out.shape == (2, 10)
        np.testing.assert_array_equal(out[0], [1, 0] * 5)
        np.testing.assert_array_equal(out[1], [1] * 5 + [0] * 5)

    def test_4bit_palette(self):
        plte = bytes([0, 0, 0, 17, 34, 51, 255, 255, 255])
        # 3x1, 4-bit indices 2,1,0 -> packed 0x21, 0x00 (pad)
        payload = b"\x00" + bytes([0x21, 0x00])
        out = ic.decode_png(_manual_png(3, 1, 4, 3, payload, [(b"PLTE", plte)]))
        assert out.shape == (1, 3, 3)
        np.testing.assert_array_equal(out[0, 0], [255, 255, 255])
        np.testing.assert_array_equal(out[0, 1], [17, 34, 51])
        np.testing.assert_array_equal(out[0, 2], [0, 0, 0])

    def test_crc_corruption_raises(self):
        arr = _rng(1).randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
        data = bytearray(ic.encode_png(arr))
        data[-10] ^= 0xFF  # inside IEND/IDAT tail
        with pytest.raises(ic.ImageFormatError):
            ic.decode_png(bytes(data))

    def test_truncation_raises(self):
        arr = _rng(2).randint(0, 256, size=(4, 4, 3), dtype=np.uint8)
        data = ic.encode_png(arr)
        with pytest.raises(ic.ImageFormatError):
            ic.decode_png(data[:len(data) // 2])

    def test_wrong_idat_size_raises(self):
        # Declared 4x4 RGB but only one row of pixel data.
        payload = b"\x00" + bytes(12)
        with pytest.raises(ic.ImageFormatError):
            ic.decode_png(_manual_png(4, 4, 8, 2, payload))

    def test_palette_index_out_of_range_raises(self):
        plte = bytes([1, 2, 3])  # one entry
        payload = b"\x00" + bytes([5])
        with pytest.raises(ic.ImageFormatError):
            ic.decode_png(_manual_png(1, 1, 8, 3, payload, [(b"PLTE", plte)]))


# ---------------------------------------------------------------------------
# BMP / PPM
# ---------------------------------------------------------------------------

def _encode_bmp(arr, topdown=False):
    """Tiny independent BMP writer (BI_RGB, bottom-up unless topdown)."""
    h, w, c = arr.shape
    bits = c * 8
    stride = (w * c + 3) & ~3
    bgr = arr[..., [2, 1, 0] + ([3] if c == 4 else [])]
    rows = bgr if topdown else bgr[::-1]
    body = bytearray()
    for y in range(h):
        row = rows[y].tobytes()
        body += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
              + struct.pack("<IiiHHIIiiII", 40, w, (-h if topdown else h),
                            1, bits, 0, len(body), 2835, 2835, 0, 0))
    return bytes(header) + bytes(body)


class TestBmpPpm:
    @pytest.mark.parametrize("channels", [3, 4])
    @pytest.mark.parametrize("topdown", [False, True])
    def test_bmp_round_trip(self, channels, topdown):
        arr = _rng(channels).randint(0, 256, size=(5, 3, channels), dtype=np.uint8)
        out = ic.decode_bmp(_encode_bmp(arr, topdown=topdown))
        np.testing.assert_array_equal(out, arr)

    def test_bmp_rejects_compressed(self):
        data = bytearray(_encode_bmp(_rng(0).randint(0, 256, (2, 2, 3), dtype=np.uint8)))
        data[30] = 1  # biCompression = BI_RLE8
        with pytest.raises(ic.ImageFormatError):
            ic.decode_bmp(bytes(data))

    def test_ppm_round_trip_with_comments(self):
        arr = _rng(9).randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
        data = (b"P6\n# a comment\n6 # inline\n4\n# more\n255\n" + arr.tobytes())
        np.testing.assert_array_equal(ic.decode_ppm(data), arr)

    def test_ppm_truncated_raises(self):
        with pytest.raises(ic.ImageFormatError):
            ic.decode_ppm(b"P6\n4 4\n255\n\x00\x01")


# ---------------------------------------------------------------------------
# Pixel ops
# ---------------------------------------------------------------------------

class TestPixelOps:
    def test_grayscale_known_values(self):
        rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255],
                         [255, 255, 255]]], dtype=np.uint8)
        np.testing.assert_array_equal(ic.to_grayscale(rgb)[0], [76, 150, 29, 255])

    def test_resize_nearest_exact(self):
        arr = np.array([[1, 2], [3, 4]], dtype=np.uint8)
        out = ic.resize_nearest(arr, 4, 4)
        np.testing.assert_array_equal(
            out, [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]])

    def test_resize_bilinear_constant_and_known(self):
        const = np.full((5, 7, 3), 42, dtype=np.uint8)
        np.testing.assert_array_equal(
            ic.resize_bilinear(const, 11, 3), np.full((11, 3, 3), 42))
        # 1-D gradient doubled: interior samples land at x/2 - 0.25
        row = np.array([[0, 100]], dtype=np.uint8)
        out = ic.resize_bilinear(row, 1, 4)
        np.testing.assert_array_equal(out[0], [0, 25, 75, 100])

    def test_pixel_features_shape_and_values(self):
        arr = np.zeros((4, 4, 3), dtype=np.uint8)
        arr[..., 0] = 255  # pure red
        feats = ic.pixel_features(arr)
        assert len(feats) == 3 + 4 + 4 + 16
        assert feats[:3] == [4.0, 4.0, 3.0]
        assert feats[3] == 1.0 and feats[4] == 0.0  # mean R, mean G
        assert feats[7:11] == [0.0] * 4  # stds of constant channels
        hist = feats[11:]
        # luma of pure red = 76/255 ~ 0.298 -> bin 4 of 16
        assert hist[4] == 1.0 and sum(hist) == 1.0

    def test_pixel_features_uint16(self):
        arr = np.full((2, 2), 65535, dtype=np.uint16)
        feats = ic.pixel_features(arr)
        assert feats[:3] == [2.0, 2.0, 1.0]
        assert feats[3] == 1.0
        assert feats[-1] == 1.0  # all luma in the top bin


class TestBmpPaletted:
    """8-bit paletted BMP, uncompressed and BI_RLE8 (the classic
    scanner output) — fixtures hand-assembled per the spec since the
    repo has no BMP writer for these modes."""

    @staticmethod
    def _bmp8(width, height, palette, pixel_bytes, compression):
        import struct
        pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
        pix_off = 14 + 40 + len(pal)
        info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8,
                           compression, len(pixel_bytes), 0, 0,
                           len(palette), 0)
        head = struct.pack("<2sIHHI", b"BM",
                           pix_off + len(pixel_bytes), 0, 0, pix_off)
        return head + info + pal + pixel_bytes

    def test_uncompressed_8bit_palette(self):
        # 3x2 bottom-up, stride padded to 4
        palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
        rows = bytes([0, 1, 2, 0]) + bytes([2, 2, 1, 0])  # bottom, top
        data = self._bmp8(3, 2, palette, rows, 0)
        out = ic.decode_bmp(data)
        want = np.array([[[0, 0, 255], [0, 0, 255], [0, 255, 0]],
                         [[255, 0, 0], [0, 255, 0], [0, 0, 255]]],
                        np.uint8)
        assert np.array_equal(out, want)

    def test_rle8_runs_absolute_delta_eol(self):
        palette = [(10, 10, 10), (20, 20, 20), (30, 30, 30),
                   (40, 40, 40)]
        # 6x3 bottom-up:
        # row0 (bottom): run 3x idx1, absolute run [2,3,3] (odd ->
        #   one pad byte), EOL
        # row1: delta dx=2 dy=0 (skipped pixels stay idx0), run 4x
        #   idx2, EOL
        # row2 (top): run 6x idx3, EOB
        rle = bytes([3, 1, 0, 3, 2, 3, 3, 0, 0, 0,
                     0, 2, 2, 0, 4, 2, 0, 0,
                     6, 3, 0, 1])
        out = ic.decode_bmp(self._bmp8(6, 3, palette, rle, 1))
        assert out.shape == (3, 6, 3)
        top, mid, bot = out[0], out[1], out[2]
        assert np.all(top == 40)
        assert np.all(mid[:2] == 10) and np.all(mid[2:] == 30)
        assert np.all(bot[:3] == 20)
        assert np.all(bot[3] == 30) and np.all(bot[4:] == 40)

    def test_rle8_truncation_raises(self):
        palette = [(1, 1, 1)]
        with pytest.raises(ic.ImageFormatError):
            ic.decode_bmp(self._bmp8(4, 2, palette, bytes([4, 0, 0, 0]), 1))

    def test_index_outside_palette_raises(self):
        palette = [(1, 1, 1), (2, 2, 2)]
        rows = bytes([0, 5, 0, 0]) + bytes([0, 0, 0, 0])
        with pytest.raises(ic.ImageFormatError):
            ic.decode_bmp(self._bmp8(2, 2, palette, rows, 0))

    def test_pil_cross_check_if_available(self):
        PIL = pytest.importorskip("PIL.Image")
        import io
        palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
        rows = bytes([0, 1, 2, 0]) + bytes([2, 2, 1, 0])
        data = self._bmp8(3, 2, palette, rows, 0)
        ref = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
        assert np.array_equal(ic.decode_bmp(data), ref)
