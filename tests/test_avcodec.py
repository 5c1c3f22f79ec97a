"""textlib/avcodec: real WAV + Y4M decode without media libraries.

WAV decode is cross-checked against the stdlib `wave` module — an
independent RIFF writer — and the Y4M color math is verified on the
BT.601 anchor points (limited-range black/white, pure chroma)."""

import io
import struct
import wave

import numpy as np
import pytest

from ocr_spark.textlib import avcodec as av


def _stdlib_wav(samples, rate, channels):
    """Encode int16 samples with the stdlib wave module."""
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(samples.astype("<i2").tobytes())
    w.close()
    return buf.getvalue()


class TestWav:
    @pytest.mark.parametrize("channels", [1, 2, 4])
    def test_decode_matches_stdlib_writer(self, channels):
        rng = np.random.RandomState(channels)
        samples = rng.randint(-32768, 32768, size=(100, channels))
        data = _stdlib_wav(samples, 8000, channels)
        got, rate = av.decode_wav(data)
        assert rate == 8000
        np.testing.assert_array_equal(got, samples)

    def test_own_encoder_round_trip(self):
        rng = np.random.RandomState(7)
        samples = rng.randint(-32768, 32768, size=(64, 2))
        got, rate = av.decode_wav(av.encode_wav(samples, 44100))
        assert rate == 44100
        np.testing.assert_array_equal(got, samples)

    def test_8_24_32_bit_and_float(self):
        # 8-bit unsigned: 128 is zero
        hdr = lambda fmt, ch, rate, bits, body: (
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", fmt, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
            + b"data" + struct.pack("<I", len(body)) + body)
        got, _ = av.decode_wav(hdr(1, 1, 8000, 8, bytes([0, 128, 255])))
        np.testing.assert_array_equal(got[:, 0], [-128, 0, 127])
        # 24-bit: sign extension
        body = (b"\x01\x00\x00"          # 1
                b"\xff\xff\xff"          # -1
                b"\x00\x00\x80")         # -2^23
        got, _ = av.decode_wav(hdr(1, 1, 8000, 24, body))
        np.testing.assert_array_equal(got[:, 0], [1, -1, -(1 << 23)])
        # 32-bit int
        body = struct.pack("<3i", 7, -7, 2 ** 31 - 1)
        got, _ = av.decode_wav(hdr(1, 1, 8000, 32, body))
        np.testing.assert_array_equal(got[:, 0], [7, -7, 2 ** 31 - 1])
        # IEEE float 32
        body = struct.pack("<3f", 0.5, -0.25, 1.0)
        got, _ = av.decode_wav(hdr(3, 1, 8000, 32, body))
        np.testing.assert_allclose(got[:, 0], [0.5, -0.25, 1.0])

    def test_skips_metadata_chunks(self):
        # LIST chunk (odd length -> word-aligned) before data
        body = struct.pack("<4h", 1, 2, 3, 4)
        data = (b"RIFF" + struct.pack("<I", 100) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16)
                + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
                + b"data" + struct.pack("<I", len(body)) + body)
        got, _ = av.decode_wav(data)
        np.testing.assert_array_equal(got[:, 0], [1, 2, 3, 4])

    def test_rejects_compressed_and_corrupt(self):
        with pytest.raises(av.MediaFormatError, match="not a RIFF"):
            av.decode_wav(b"OggS123456789")
        data = bytearray(_stdlib_wav(np.zeros((4, 1)), 8000, 1))
        struct.pack_into("<H", data, 20, 85)  # format 85 = MP3-in-WAV
        with pytest.raises(av.MediaFormatError, match="unsupported WAV format"):
            av.decode_wav(bytes(data))

    def test_audio_features(self):
        # Full-scale square wave at Nyquist/2: rms = peak = 1,
        # zero-cross on every other sample boundary.
        sq = np.tile([32768 // 2, -32768 // 2], 50).astype(np.int64)
        feats = av.audio_features(sq[:, None].astype(np.int32), 8000)
        n, c, rate, dur, rms, peak, zc = feats[:7]
        assert (n, c, rate) == (100.0, 1.0, 8000.0)
        assert dur == pytest.approx(0.0125)
        assert rms == pytest.approx(0.5)
        assert peak == pytest.approx(0.5)
        assert zc == pytest.approx(1.0)
        spec = feats[7:]
        assert len(spec) == 8 and sum(spec) == pytest.approx(1.0)
        # alternating signal = energy at Nyquist -> last spectrum bin
        assert spec[-1] == pytest.approx(max(spec))


class TestY4m:
    def _stream(self, frames, w=4, h=4, chroma="420"):
        sx, sy = av._Y4M_SUBSAMPLE[chroma]
        cw, ch = (w + sx - 1) // sx, (h + sy - 1) // sy
        planes = [(np.full((h, w), y, np.uint8),
                   np.full((ch, cw), u, np.uint8),
                   np.full((ch, cw), v, np.uint8)) for y, u, v in frames]
        return av.encode_y4m(planes, w, h, chroma=chroma)

    def test_bt601_anchor_points(self):
        # limited-range black (16,128,128) and white (235,128,128)
        data = self._stream([(16, 128, 128), (235, 128, 128)])
        frames = dict(av.decode_y4m_frames(data))
        np.testing.assert_array_equal(frames[0], np.zeros((4, 4, 3)))
        np.testing.assert_array_equal(frames[1], np.full((4, 4, 3), 255))

    @pytest.mark.parametrize("chroma", ["420", "422", "444"])
    def test_chroma_modes_round_trip_shape(self, chroma):
        data = self._stream([(100, 90, 160)], w=6, h=4, chroma=chroma)
        frames = list(av.decode_y4m_frames(data))
        assert len(frames) == 1
        idx, rgb = frames[0]
        assert idx == 0 and rgb.shape == (4, 6, 3)
        # constant planes -> constant output regardless of subsampling
        assert len(np.unique(rgb.reshape(-1, 3), axis=0)) == 1

    def test_frame_sampling_and_cap(self):
        data = self._stream([(16 + 10 * i, 128, 128) for i in range(10)])
        got = [i for i, _ in av.decode_y4m_frames(data, every_n=3)]
        assert got == [0, 3, 6, 9]
        got = [i for i, _ in av.decode_y4m_frames(data, every_n=3,
                                                  max_frames=2)]
        assert got == [0, 3]

    def test_sampling_skips_without_converting(self, monkeypatch):
        calls = []
        orig = av.yuv_to_rgb
        monkeypatch.setattr(av, "yuv_to_rgb",
                            lambda *a: calls.append(1) or orig(*a))
        data = self._stream([(50, 128, 128)] * 30)
        assert len(list(av.decode_y4m_frames(data, every_n=10))) == 3
        assert len(calls) == 3  # 27 skipped frames never converted

    def test_truncated_and_bad_marker(self):
        data = self._stream([(50, 128, 128)])
        with pytest.raises(av.MediaFormatError, match="truncated"):
            list(av.decode_y4m_frames(data[:-5]))
        with pytest.raises(av.MediaFormatError, match="FRAME marker"):
            list(av.decode_y4m_frames(data[:-25] + b"JUNK" + data[-21:]))
        with pytest.raises(av.MediaFormatError, match="not a YUV4MPEG2"):
            list(av.decode_y4m_frames(b"AVI LIST"))

    def test_odd_dimensions_420(self):
        # 5x3 C420: chroma planes are ceil-sized; replication must crop
        data = self._stream([(80, 128, 128)], w=5, h=3)
        (idx, rgb), = av.decode_y4m_frames(data)
        assert rgb.shape == (3, 5, 3)
