"""TIFF 6.0 codec — round trips across compressions and the LZW
early-change machinery, photometric variants, and spec errors.

TIFF's LZW deliberately differs from GIF's (MSB-first packing, width
change at 2^n - 1 instead of 2^n); the round trips below cross the
9->10->11->12-bit boundaries and the forced dictionary clear, and the
one-step encoder/decoder lag at the early-change point is exactly
what a shared-off-by-one would corrupt.
"""

import numpy as np
import pytest

from ocr_spark.textlib import tiffcodec as tc
from ocr_spark.textlib.imagecodec import ImageFormatError


class TestRoundTrips:
    @pytest.mark.parametrize("comp,pred", [(1, 1), (32773, 1),
                                           (5, 1), (5, 2)])
    def test_compressions_exact(self, comp, pred):
        rng = np.random.default_rng(comp + pred)
        for shape in [(24, 33), (24, 33, 3), (65, 17, 3)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            for rps in (None, 7):
                for order in ("<", ">"):
                    data = tc.encode_tiff(img, compression=comp,
                                          predictor=pred,
                                          rows_per_strip=rps,
                                          byte_order=order)
                    got = tc.decode_tiff(data)
                    assert np.array_equal(got, img), \
                        (comp, pred, shape, rps, order)

    def test_lzw_width_boundaries_and_clear(self):
        # 100x80 RGB noise assigns >4096 LZW codes: crosses every
        # width boundary and the forced clear
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (100, 80, 3), dtype=np.uint8)
        data = tc.encode_tiff(img, compression=5)
        assert np.array_equal(tc.decode_tiff(data), img)

    def test_rle_compresses_runs(self):
        flat = np.zeros((40, 50), np.uint8)
        flat[10:20, :] = 200
        d0 = tc.encode_tiff(flat)
        d1 = tc.encode_tiff(flat, compression=32773)
        d5 = tc.encode_tiff(flat, compression=5)
        assert len(d1) < len(d0) and len(d5) < len(d0)
        assert np.array_equal(tc.decode_tiff(d1), flat)
        assert np.array_equal(tc.decode_tiff(d5), flat)

    def test_pil_cross_check_if_available(self):
        PIL = pytest.importorskip("PIL.Image")
        import io
        rng = np.random.default_rng(10)
        img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
        for comp in (1, 5, 32773):
            data = tc.encode_tiff(img, compression=comp)
            ref = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
            assert np.array_equal(tc.decode_tiff(data), ref), comp


class TestPhotometrics:
    def test_white_is_zero_inverts(self):
        g = np.arange(64, dtype=np.uint8).reshape(8, 8)
        data = tc.encode_tiff(g, photometric=0)
        assert np.array_equal(tc.decode_tiff(data), 255 - g)

    def test_palette_resolves_colormap(self):
        rng = np.random.default_rng(11)
        cmap16 = rng.integers(0, 65536, (256, 3)).astype(np.uint16)
        idx = rng.integers(0, 256, (12, 17), dtype=np.uint8)
        data = tc.encode_tiff(idx, photometric=3, colormap=cmap16)
        got = tc.decode_tiff(data)
        want = (cmap16 // 257).astype(np.uint8)[idx]
        assert np.array_equal(got, want)

    def test_extra_sample_dropped(self):
        # spp=4 (RGB + alpha-ish extra sample): first three survive
        rng = np.random.default_rng(12)
        rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
        data = tc.encode_tiff(rgba, photometric=2)
        assert np.array_equal(tc.decode_tiff(data), rgba[:, :, :3])


class TestErrors:
    def test_corrupt_and_out_of_profile_raise(self):
        g = np.zeros((8, 8), np.uint8)
        good = tc.encode_tiff(g)
        for bad in (b"II*", b"II*\x00\x10\x00\x00\x00", good[:30],
                    b"\x89PNG\r\n\x1a\n"):
            with pytest.raises(ImageFormatError):
                tc.decode_tiff(bad)

    def test_unsupported_compression_raises(self):
        g = np.zeros((8, 8), np.uint8)
        data = bytearray(tc.encode_tiff(g))
        # patch the Compression tag value (id 259, sorted IFD)
        import struct
        n = struct.unpack("<H", data[8:10])[0]
        for i in range(n):
            pos = 10 + 12 * i
            if struct.unpack("<H", data[pos:pos + 2])[0] == 259:
                data[pos + 8:pos + 10] = struct.pack("<H", 7)  # JPEG
        with pytest.raises(ImageFormatError, match="compression"):
            tc.decode_tiff(bytes(data))


class TestOperatorIntegration:
    def test_decode_image_dispatches_tiff(self):
        from ocr_spark.operators.multimodal import decode_image
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        for order in ("<", ">"):
            data = tc.encode_tiff(img, compression=5, predictor=2,
                                  byte_order=order)
            assert np.array_equal(decode_image(data), img)
