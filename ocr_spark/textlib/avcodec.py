"""Pure-Python/numpy audio + video codecs: WAV (RIFF PCM) and
YUV4MPEG2 — no ffmpeg/soundfile.

Same stance as imagecodec.py: the formats a container with no media
libraries can still decode COMPLETELY are implemented for real —

  * WAV  — RIFF/WAVE chunk walk, PCM (format 1) and IEEE float
           (format 3), 8/16/24/32-bit integer and 32/64-bit float
           samples, any channel count. Returns (samples, rate):
           samples shaped (n_frames, channels), int32 for integer
           PCM (24-bit widened), float64 for float PCM.
  * Y4M  — YUV4MPEG2 stream header + per-frame FRAME markers, C420
           (chroma 2x2 subsampled, the default), C422 and C444,
           BT.601 limited-range YUV -> RGB via numpy.

Compressed audio/video (MP3/AAC/H.264/VP9...) needs entropy decoders
out of scope here — `multimodal.decode_audio` / `decode_video_frames`
gate those behind the same import-try NotImplementedError convention
as JPEG, naming the swap-in point.

The WAV tests cross-check against the stdlib `wave` writer (an
independent RIFF implementation), and the Y4M tests hand-build frames
and verify the matrix math on known YUV anchor points.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import ImageFormatError


class MediaFormatError(ImageFormatError):
    """Raised on corrupt or unsupported audio/video bytes."""


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> ((n_frames, channels) samples, sample_rate).

    Integer PCM comes back as int32 (8-bit unsigned is re-centered to
    signed, 24-bit is sign-extended); float PCM comes back float64.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if len(body) < length:
            raise MediaFormatError(f"truncated {ctype!r} chunk")
        if ctype == b"fmt ":
            if length < 16:
                raise MediaFormatError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            frames = body
            break  # data is the payload; trailing chunks are metadata
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise MediaFormatError("missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _align, bits = fmt
    if channels < 1:
        raise MediaFormatError("zero channels")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            raw = np.frombuffer(frames, dtype=np.uint8).astype(np.int32) - 128
        elif bits == 16:
            raw = np.frombuffer(frames, dtype="<i2").astype(np.int32)
        elif bits == 24:
            b = np.frombuffer(frames, dtype=np.uint8)
            b = b[:len(b) - len(b) % 3].reshape(-1, 3).astype(np.int32)
            raw = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            raw = np.where(raw >= (1 << 23), raw - (1 << 24), raw)
        elif bits == 32:
            raw = np.frombuffer(frames, dtype="<i4").astype(np.int32)
        else:
            raise MediaFormatError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            raw = np.frombuffer(frames, dtype="<f4").astype(np.float64)
        elif bits == 64:
            raw = np.frombuffer(frames, dtype="<f8")
        else:
            raise MediaFormatError(f"unsupported float bit depth {bits}")
    else:
        raise MediaFormatError(
            f"unsupported WAV format {audio_format} (compressed WAV needs "
            f"a codec library)")
    n = (len(raw) // channels) * channels
    return raw[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Minimal 16-bit PCM writer for round trips (the tests prefer the
    stdlib `wave` module as the independent twin; this exists for
    callers without one)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    body = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)


def audio_features(samples: np.ndarray, rate: int,
                   spectrum_bins: int = 8) -> list[float]:
    """Deterministic fixed-length features from decoded audio:

    [n_frames, channels, rate, duration_s, rms, peak, zero_cross_rate,
     normalized ``spectrum_bins``-bin magnitude spectrum of the first
     channel (rfft, linear bins)]
    """
    n, c = samples.shape
    x = samples.astype(np.float64)
    if samples.dtype.kind == "i":
        x = x / 32768.0  # 16-bit full-scale convention
    rms = float(np.sqrt((x ** 2).mean())) if n else 0.0
    peak = float(np.abs(x).max()) if n else 0.0
    mono = x[:, 0] if n else np.zeros(1)
    zc = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(mono))
    if mag.sum() > 0:
        edges = np.linspace(0, len(mag), spectrum_bins + 1).astype(int)
        spec = [float(mag[a:b].sum()) for a, b in zip(edges, edges[1:])]
        tot = sum(spec)
        spec = [s / tot for s in spec]
    else:
        spec = [0.0] * spectrum_bins
    return ([float(n), float(c), float(rate), (n / rate if rate else 0.0),
             rms, peak, zc] + spec)


# ---------------------------------------------------------------------------
# YUV4MPEG2
# ---------------------------------------------------------------------------

_Y4M_SUBSAMPLE = {"420": (2, 2), "422": (2, 1), "444": (1, 1)}


def _parse_y4m_header(data: bytes) -> tuple[dict, int]:
    nl = data.find(b"\n")
    if not data.startswith(b"YUV4MPEG2") or nl < 0:
        raise MediaFormatError("not a YUV4MPEG2 stream")
    params: dict = {"C": "420"}
    for tok in data[10:nl].split(b" "):
        if not tok:
            continue
        key, val = chr(tok[0]), tok[1:].decode("ascii", "replace")
        params[key] = val
    try:
        width, height = int(params["W"]), int(params["H"])
    except (KeyError, ValueError):
        raise MediaFormatError("Y4M header missing W/H") from None
    if width <= 0 or height <= 0:
        raise MediaFormatError("bad Y4M dimensions")
    chroma = params["C"][:3]
    if chroma not in _Y4M_SUBSAMPLE:
        raise MediaFormatError(f"unsupported Y4M chroma mode C{params['C']}")
    fps = params.get("F", "25:1")
    try:
        num, den = (int(p) for p in fps.split(":"))
    except ValueError:
        raise MediaFormatError(f"bad Y4M frame rate {fps!r}") from None
    params.update({"width": width, "height": height, "chroma": chroma,
                   "fps": (num / den if den else 0.0)})
    return params, nl + 1


def yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BT.601 limited-range (studio-swing) YUV -> RGB uint8."""
    yf = (y.astype(np.float64) - 16.0) * (255.0 / 219.0)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    r = yf + 1.402 * (255.0 / 224.0) * vf
    g = yf - 0.344136 * (255.0 / 224.0) * uf - 0.714136 * (255.0 / 224.0) * vf
    b = yf + 1.772 * (255.0 / 224.0) * uf
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


def decode_y4m_frames(data: bytes, every_n: int = 1,
                      max_frames: int | None = None):
    """Iterate (frame_index, RGB array) over a YUV4MPEG2 stream,
    keeping every ``every_n``-th frame — frame SAMPLING happens at the
    parse, so skipped frames cost a pointer bump, not a conversion."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    params, pos = _parse_y4m_header(data)
    w, h = params["width"], params["height"]
    sx, sy = _Y4M_SUBSAMPLE[params["chroma"]]
    cw, ch = (w + sx - 1) // sx, (h + sy - 1) // sy
    frame_bytes = w * h + 2 * cw * ch
    idx = emitted = 0
    while pos < len(data):
        nl = data.find(b"\n", pos)
        if nl < 0 or not data[pos:nl].startswith(b"FRAME"):
            raise MediaFormatError(f"bad FRAME marker at offset {pos}")
        body = data[nl + 1:nl + 1 + frame_bytes]
        if len(body) < frame_bytes:
            raise MediaFormatError("truncated Y4M frame")
        if idx % every_n == 0:
            yp = np.frombuffer(body, np.uint8, w * h).reshape(h, w)
            up = np.frombuffer(body, np.uint8, cw * ch,
                               w * h).reshape(ch, cw)
            vp = np.frombuffer(body, np.uint8, cw * ch,
                               w * h + cw * ch).reshape(ch, cw)
            # replicate subsampled chroma up to luma resolution
            uf = np.repeat(np.repeat(up, sy, axis=0), sx, axis=1)[:h, :w]
            vf = np.repeat(np.repeat(vp, sy, axis=0), sx, axis=1)[:h, :w]
            yield idx, yuv_to_rgb(yp, uf, vf)
            emitted += 1
            if max_frames is not None and emitted >= max_frames:
                return
        pos = nl + 1 + frame_bytes
        idx += 1


def encode_y4m(frames_yuv, width: int, height: int,
               chroma: str = "420", fps: str = "25:1") -> bytes:
    """Assemble raw YUV planes into a Y4M stream (test/builder helper).
    ``frames_yuv`` is an iterable of (y, u, v) uint8 plane arrays."""
    sx, sy = _Y4M_SUBSAMPLE[chroma]
    cw, ch = (width + sx - 1) // sx, (height + sy - 1) // sy
    out = [f"YUV4MPEG2 W{width} H{height} F{fps} Ip A1:1 C{chroma}\n"
           .encode("ascii")]
    for y, u, v in frames_yuv:
        if y.shape != (height, width) or u.shape != (ch, cw) or v.shape != (ch, cw):
            raise ValueError("plane shape mismatch")
        out.append(b"FRAME\n")
        out.append(y.astype(np.uint8).tobytes())
        out.append(u.astype(np.uint8).tobytes())
        out.append(v.astype(np.uint8).tobytes())
    return b"".join(out)
