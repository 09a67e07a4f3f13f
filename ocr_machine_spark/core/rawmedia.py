"""Pure-stdlib+numpy codecs for uncompressed public media formats.

Round-4 replacement of the multimodal fake-feature stub (VERDICT r3 #2): the
container ships no PIL/libav, but three REAL public formats need neither —
BMP (24-bit BI_RGB, the Windows bitmap spec), WAV (RIFF PCM16, via the
stdlib ``wave`` module) and Y4M (YUV4MPEG2 4:2:0, mjpegtools' uncompressed
video interchange format). Everything here is byte-level encode/decode plus
deterministic feature math — the semantic twin of the reference's
decode→resize→normalize tensor path
(``training_strikethrough/training_inference_scripts/model_training_pipeline.py:18-45``).

Determinism rules (the engine-wide contract):
* asset content is CLOSED-FORM in the asset id — integer arithmetic patterns,
  no RNG, so any row regenerates identically on any executor;
* feature math reduces uint8/int16 arrays through exact integer sums before
  the single float division — identical IEEE doubles on every platform, so
  the fixed-point (e4) gate is byte-stable.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

FEATURE_DIM = 32

# ---------------------------------------------------------------------------
# BMP — 24-bit uncompressed BI_RGB, bottom-up rows, 4-byte row padding
# ---------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → BMP bytes (BITMAPINFOHEADER, BI_RGB, 24 bpp)."""
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # bottom-up rows, BGR channel order, padded to 4 bytes
    bgr = arr[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row + pad), dtype=np.uint8)
        rows[:, :row] = bgr.reshape(h, row)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    return header + dib + body


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB. Supports the profile ``encode_bmp``
    writes (24 bpp BI_RGB, positive height); anything else raises ValueError
    — callers map that to the per-row error channel, never a job kill."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0 or h <= 0 or w <= 0:
        raise ValueError(f"unsupported BMP profile (bpp={bpp}, comp={comp})")
    row = w * 3
    stride = row + ((-row) % 4)
    body = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    bgr = body.reshape(h, stride)[:, :row].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()


# ---------------------------------------------------------------------------
# WAV — RIFF PCM16 mono via the stdlib wave module
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples → WAV (PCM16 mono) bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 mono samples).

    Failure contract: ANY malformed payload raises ValueError (the stdlib
    wave/chunk modules raise wave.Error, EOFError, struct.error or even bare
    RuntimeError depending on where a corrupt RIFF structure trips them —
    all converted here so callers' per-row ValueError handler keeps the
    ok=false-per-row totality promise instead of killing the job)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
                raise ValueError("unsupported WAV profile (need PCM16 mono)")
            rate = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except ValueError:
        raise
    except Exception as exc:  # noqa: BLE001 — stdlib wave's error surface is wide
        raise ValueError(f"malformed WAV payload: {type(exc).__name__}: {exc}") from exc
    return rate, np.frombuffer(raw, dtype="<i2")


# ---------------------------------------------------------------------------
# Y4M — YUV4MPEG2, 4:2:0 planar, the standard uncompressed video container
# ---------------------------------------------------------------------------


def encode_y4m(y_frames: np.ndarray, fps: int = 24) -> bytes:
    """(n, h, w) uint8 luma frames → Y4M bytes (constant gray chroma)."""
    n, h, w = y_frames.shape
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even dimensions")
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode("ascii")
    uv = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    parts = [header]
    for f in range(n):
        parts.append(b"FRAME\n")
        parts.append(y_frames[f].tobytes())
        parts.append(uv)  # U plane
        parts.append(uv)  # V plane
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[int, np.ndarray]:
    """Y4M bytes → (fps, (n, h, w) uint8 luma frames). C420 only."""
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace")
    if not header.startswith("YUV4MPEG2"):
        raise ValueError("not a Y4M payload")
    w = h = fps = None
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
        elif tok[0] == "C" and tok != "C420":
            raise ValueError(f"unsupported Y4M chroma {tok}")
    if not (w and h and fps):
        raise ValueError("Y4M header missing W/H/F")
    y_size = w * h
    frame_size = y_size + 2 * (w // 2) * (h // 2)
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        start = fnl + 1
        frames.append(np.frombuffer(data, dtype=np.uint8, count=y_size, offset=start).reshape(h, w))
        pos = start + frame_size
    return fps, np.stack(frames) if frames else np.zeros((0, h, w), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Closed-form asset factory (no RNG — content is arithmetic in the id)
# ---------------------------------------------------------------------------

VIDEO_W, VIDEO_H, VIDEO_FPS = 16, 12, 24
AUDIO_RATE = 16000


def kind_of(i: int) -> str:
    return ["image", "audio", "video"][i % 3]


def image_array(i: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pattern: channel-distinct gradients."""
    w = 64 + (i % 8) * 16
    h = 64 + (i % 4) * 16
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    return np.stack(
        [
            (r * 3 + c * 7 + i) % 256,
            (r * 5 + c * 11 + 2 * i) % 256,
            (r * 7 + c * 13 + 3 * i) % 256,
        ],
        axis=2,
    ).astype(np.uint8)


def audio_samples(i: int) -> np.ndarray:
    """Deterministic int16 sawtooth-family waveform, 0.1–0.5 s at 16 kHz."""
    n = 1600 * (1 + i % 5)
    t = np.arange(n, dtype=np.int64)
    return (((t * (37 + i % 17)) % 4096 - 2048) * 8).astype(np.int16)


def video_frames(i: int) -> np.ndarray:
    """Deterministic (n, h, w) uint8 luma frames (drifting gradient)."""
    n = 24 * (1 + i % 10)
    f = np.arange(n, dtype=np.int64)[:, None, None]
    r = np.arange(VIDEO_H, dtype=np.int64)[None, :, None]
    c = np.arange(VIDEO_W, dtype=np.int64)[None, None, :]
    return ((r * 3 + c * 5 + f * 11 + i) % 256).astype(np.uint8)


def make_payload(i: int) -> bytes:
    k = kind_of(i)
    if k == "image":
        return encode_bmp(image_array(i))
    if k == "audio":
        return encode_wav(audio_samples(i), AUDIO_RATE)
    return encode_y4m(video_frames(i), VIDEO_FPS)


# ---------------------------------------------------------------------------
# Feature extraction — 32 doubles in [0, 1], exact-int reductions
# ---------------------------------------------------------------------------


def _hist16(vals: np.ndarray, lo: int, span: int) -> list[float]:
    """16-bin occupancy fractions over [lo, lo+span) — exact int counts."""
    idx = ((vals.astype(np.int64).reshape(-1) - lo) * 16) // span
    counts = np.bincount(np.clip(idx, 0, 15), minlength=16)
    n = max(int(vals.size), 1)
    return [int(c) / n for c in counts]


def _mean_std(vals: np.ndarray, scale: float) -> tuple[float, float]:
    """Mean and population std via exact integer sums, normalized by scale."""
    v = vals.astype(np.int64)
    n = max(int(v.size), 1)
    s = int(v.sum())
    ss = int((v * v).sum())
    mean = s / n
    var = max(ss / n - mean * mean, 0.0)
    return mean / scale, float(np.sqrt(var)) / scale


def image_features(arr: np.ndarray) -> list[float]:
    h, w, _ = arr.shape
    ch = arr.astype(np.int64)
    lum = (ch[:, :, 0] + ch[:, :, 1] + ch[:, :, 2]) // 3
    f0, f1 = _mean_std(lum, 255.0)
    feats = [f0, f1, w / 4096.0, h / 4096.0]
    feats += _hist16(lum, 0, 256)  # 4..19
    for c in range(3):  # 20..25: channel means + stds
        m, s = _mean_std(ch[:, :, c], 255.0)
        feats.append(m)
        feats.append(s)
    hdiff = np.abs(np.diff(lum, axis=1))
    vdiff = np.abs(np.diff(lum, axis=0))
    feats.append(_mean_std(hdiff, 255.0)[0])  # 26
    feats.append(_mean_std(vdiff, 255.0)[0])  # 27
    feats.append(w / (w + h))  # 28
    feats.append(int(lum.min()) / 255.0)  # 29
    feats.append(int(lum.max()) / 255.0)  # 30
    feats.append(int(np.sort(lum, axis=None)[lum.size // 2]) / 255.0)  # 31
    assert len(feats) == FEATURE_DIM
    return feats


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    a = samples.astype(np.int64)
    n = max(int(a.size), 1)
    rms = float(np.sqrt(int((a * a).sum()) / n)) / 32768.0
    zc = int((np.signbit(a[1:]) != np.signbit(a[:-1])).sum()) / max(n - 1, 1)
    feats = [
        rms,
        int(np.abs(a).sum()) / n / 32768.0,
        int(np.abs(a).max()) / 32768.0,
        zc,
    ]
    feats += _hist16(a, -32768, 65536)  # 4..19
    feats.append(rate / 48000.0)  # 20
    feats.append(n / 2**20)  # 21
    feats.append(int(np.abs(np.diff(a)).sum()) / max(n - 1, 1) / 65536.0)  # 22
    qs = np.sort(a)[[(n - 1) * q // 10 for q in range(1, 10)]]  # 23..31: deciles
    feats += [(int(q) + 32768) / 65536.0 for q in qs]
    assert len(feats) == FEATURE_DIM
    return feats


def video_features(frames: np.ndarray, fps: int) -> list[float]:
    n, h, w = frames.shape
    f0, f1 = _mean_std(frames, 255.0)
    feats = [f0, f1, n / 4096.0, fps / 60.0]
    feats += _hist16(frames.reshape(-1), 0, 256)  # 4..19
    if n > 1:
        motion = np.abs(np.diff(frames.astype(np.int64), axis=0))
        feats.append(_mean_std(motion, 255.0)[0])  # 20
    else:
        feats.append(0.0)
    feats.append(w / 4096.0)  # 21
    feats.append(h / 4096.0)  # 22
    # 23..31: first 9 per-frame means (n >= 24 for every generated asset)
    per_frame = frames.reshape(n, -1).astype(np.int64).sum(axis=1)
    for f in range(9):
        feats.append((int(per_frame[f]) / (h * w) / 255.0) if f < n else 0.0)
    assert len(feats) == FEATURE_DIM
    return feats


def decode_features(payload: bytes) -> tuple[str, list[float]]:
    """Sniff the container by magic bytes, decode, extract features.

    → (kind, features). Raises ValueError on anything that is not one of the
    three supported uncompressed formats — the caller decides whether that is
    an ok=false row (non-strict) or a NotImplementedError (strict: a
    compressed codec would be required)."""
    if payload[:2] == b"BM":
        return "image", image_features(decode_bmp(payload))
    if payload[:4] == b"RIFF":
        rate, samples = decode_wav(payload)
        return "audio", audio_features(samples, rate)
    if payload[:9] == b"YUV4MPEG2":
        fps, frames = decode_y4m(payload)
        return "video", video_features(frames, fps)
    raise ValueError("unrecognized media container (not BMP/WAV/Y4M)")


def resize_nearest(arr: np.ndarray, nw: int, nh: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index maps — deterministic (no
    float filter kernels), the resample rule both the operator and the golden
    twin share."""
    h, w, _ = arr.shape
    rows = (np.arange(nh, dtype=np.int64) * h) // nh
    cols = (np.arange(nw, dtype=np.int64) * w) // nw
    return arr[rows][:, cols]
