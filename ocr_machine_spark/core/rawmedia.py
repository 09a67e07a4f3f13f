"""Pure-stdlib+numpy codecs for public media formats.

Round-4 replacement of the multimodal fake-feature stub (VERDICT r3 #2), and
round 5 adds the first COMPRESSED codec: the container ships no PIL/libav,
but four REAL public formats need neither — BMP (24-bit BI_RGB, the Windows
bitmap spec), PNG (ISO/IEC 15948: stdlib zlib inflate + the five scanline
filters; grayscale/truecolor at bit depths 8/16), WAV (RIFF PCM16, via the
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


class UnrecognizedContainerError(ValueError):
    """Magic-byte sniff matched NO supported container — the payload would
    need a codec this environment doesn't ship (JPEG/MP3/H.264 …). Distinct
    from a plain ValueError, which after a successful sniff means the payload
    IS a supported container but corrupt or an unsupported profile — callers
    in strict mode report the former as a missing-dependency boundary
    (NotImplementedError) and the latter as the data corruption it is."""

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
    if data[:2] != b"BM":
        raise UnrecognizedContainerError("not a BMP payload")
    if len(data) < 54:
        raise ValueError("truncated BMP payload")
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
# PNG — ISO/IEC 15948: zlib-compressed filtered scanlines. The round-5 first
# COMPRESSED codec (VERDICT r4 #3): needs only stdlib zlib + the five filter
# types. Supported profile: non-interlaced grayscale (color type 0) and
# truecolor (color type 2), bit depths 8 and 16 — the dominant lossless
# profiles of a webtext image column. Reference raster twin:
# training_strikethrough/training_inference_scripts/model_training_pipeline.py:18-45.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, 3) uint8/uint16 → PNG bytes.

    Color type and bit depth are inferred from shape/dtype. Scanline filters
    cycle deterministically 0..4 by row index, so a decoder roundtrip
    exercises every unfilter path (None/Sub/Up/Average/Paeth) — the goldens
    then certify all five against by-construction pixels."""
    import zlib

    if arr.dtype == np.uint8:
        depth, bps = 8, 1
    elif arr.dtype == np.uint16:
        depth, bps = 16, 2
    else:
        raise ValueError(f"encode_png: unsupported dtype {arr.dtype}")
    if arr.ndim == 2:
        color, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
    else:
        raise ValueError(f"encode_png: unsupported shape {arr.shape}")
    h, w = arr.shape[:2]
    bpp = ch * bps  # filter distance in BYTES (spec: per-byte, not per-sample)
    # raw scanlines, big-endian samples; force C-contiguity BEFORE the
    # byte-level view — fancy-indexed inputs (resize_nearest output) can
    # carry strides under which .view(uint8) is illegal for 16-bit samples
    raw = (
        np.ascontiguousarray(arr.astype(">u2" if depth == 16 else "u1"))
        .reshape(h, w * ch)
        .view(np.uint8)
    )
    stride = w * bpp
    # ENCODE-side filters have no sequential dependence (they read only RAW
    # neighbor bytes — left, up, upper-left — never filtered output), so all
    # five are plain vectorized numpy over the whole image; only DECODE's
    # Sub/Average/Paeth need per-byte recurrences. Shift helpers use int16
    # so the subtractions wrap correctly after the final uint8 cast.
    rw = raw.astype(np.int16)  # (h, stride)
    left = np.zeros_like(rw)
    left[:, bpp:] = rw[:, :-bpp]
    up = np.zeros_like(rw)
    up[1:] = rw[:-1]
    ul = np.zeros_like(rw)
    ul[1:, bpp:] = rw[:-1, :-bpp]
    # vectorized Paeth predictor
    p = left + up - ul
    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
    paeth = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
    filtered = {
        0: rw,
        1: rw - left,
        2: rw - up,
        3: rw - ((left + up) >> 1),
        4: rw - paeth,
    }
    out = bytearray()
    for r in range(h):
        ft = r % 5
        out.append(ft)
        out += (filtered[ft][r] & 0xFF).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w) or (h, w, 3) array, uint8 or uint16 (native depth).

    Supports non-interlaced color types 0/2 at bit depths 8/16 — the profile
    ``encode_png`` writes plus anything else in that envelope. Unrecognized
    magic raises UnrecognizedContainerError; a recognized-but-corrupt or
    out-of-profile payload (palette/alpha/interlaced, bad CRC framing, short
    IDAT) raises plain ValueError."""
    import zlib

    if data[:8] != PNG_SIG:
        raise UnrecognizedContainerError("not a PNG payload")
    pos = 8
    w = h = depth = color = interlace = None
    idat = bytearray()
    try:
        while pos < len(data):
            (length,) = struct.unpack_from(">I", data, pos)
            ctype = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            if len(body) != length:
                raise ValueError("truncated PNG chunk")
            if ctype == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
                if comp != 0 or filt != 0:
                    raise ValueError("invalid PNG compression/filter method")
            elif ctype == b"IDAT":
                idat += body
            elif ctype == b"IEND":
                break
            pos += 12 + length
    except struct.error as exc:
        raise ValueError(f"malformed PNG chunk framing: {exc}") from exc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    if color not in (0, 2) or depth not in (8, 16):
        raise ValueError(f"unsupported PNG profile (color={color}, depth={depth})")
    ch = 3 if color == 2 else 1
    bps = depth // 8
    bpp = ch * bps
    stride = w * bpp
    expected = h * (stride + 1)
    try:
        # bounded inflate: the exact output size is known from IHDR, so a
        # decompression bomb (tiny IDAT inflating to gigabytes) is rejected
        # as the per-row data error it is instead of OOM-killing the
        # executor BEFORE the length check could run
        d = zlib.decompressobj()
        flat = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    if len(flat) != expected or d.unconsumed_tail:
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    buf = np.frombuffer(flat, dtype=np.uint8).reshape(h, stride + 1)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = int(buf[r, 0])
        line = buf[r, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub: per-byte-lane cumsum, uint8 wraps mod 256
            for lane in range(bpp):
                np.add.accumulate(line[lane::bpp], out=line[lane::bpp])
        elif ft == 2:  # Up
            line += prev
        elif ft == 3:  # Average — sequential left-dependence, per-byte
            lb = bytearray(line.tobytes())
            pb = prev.tobytes()
            for i in range(stride):
                left = lb[i - bpp] if i >= bpp else 0
                lb[i] = (lb[i] + ((left + pb[i]) >> 1)) & 0xFF
            line = np.frombuffer(bytes(lb), dtype=np.uint8).copy()
        elif ft == 4:  # Paeth — sequential, per-byte
            lb = bytearray(line.tobytes())
            pb = prev.tobytes()
            for i in range(stride):
                left = lb[i - bpp] if i >= bpp else 0
                ul = pb[i - bpp] if i >= bpp else 0
                lb[i] = (lb[i] + _paeth(left, pb[i], ul)) & 0xFF
            line = np.frombuffer(bytes(lb), dtype=np.uint8).copy()
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[r] = line
        prev = line
    if bps == 1:
        samples = out.reshape(h, w, ch).astype(np.uint8)
    else:
        samples = out.view(">u2").astype(np.uint16).reshape(h, w, ch)
    return samples[:, :, 0] if ch == 1 else samples


def to_rgb8(arr: np.ndarray) -> np.ndarray:
    """Native decoded image (gray/rgb, 8/16-bit) → (h, w, 3) uint8 RGB — the
    canonical feature-space view (16-bit high byte; gray broadcast to 3
    channels). Generated 16-bit content is v*257, so the high byte recovers
    the 8-bit source exactly."""
    a = arr
    if a.dtype == np.uint16:
        a = (a >> 8).astype(np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=2)
    return a


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Sniff BMP vs PNG, decode → (native array, container tag). Containers
    outside {BMP, PNG} raise UnrecognizedContainerError (a compressed codec
    beyond zlib would be required: JPEG/WebP/…)."""
    if data[:2] == b"BM":
        return decode_bmp(data), "bmp"
    if data[:8] == PNG_SIG:
        return decode_png(data), "png"
    raise UnrecognizedContainerError("unrecognized image container (not BMP/PNG)")


def encode_image(arr: np.ndarray, container: str) -> bytes:
    """Inverse of ``decode_image``: re-encode a native array in the SAME
    container (and, for PNG, the same color type/bit depth the array carries)."""
    if container == "bmp":
        return encode_bmp(arr)
    if container == "png":
        return encode_png(arr)
    raise ValueError(f"unknown image container {container!r}")


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
    if data[:9] != b"YUV4MPEG2":
        raise UnrecognizedContainerError("not a Y4M payload")
    try:
        nl = data.index(b"\n")
    except ValueError as exc:
        raise ValueError("truncated Y4M header (no newline)") from exc
    header = data[:nl].decode("ascii", "replace")
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


# image assets alternate container: BMP (i % 6 == 0) / PNG (i % 6 == 3); PNG
# assets cycle the four supported profiles so every (color type, bit depth)
# combination is golden-gated
PNG_VARIANTS = ("gray8", "rgb8", "gray16", "rgb16")


def image_container(i: int) -> str:
    return "png" if i % 6 == 3 else "bmp"


def image_native(i: int) -> np.ndarray:
    """The image asset's NATIVE array (what its container encodes): BMP is
    always (h, w, 3) uint8; PNG cycles gray/rgb × 8/16-bit. 16-bit content is
    the 8-bit pattern × 257 (full-range expansion), so ``to_rgb8`` recovers
    the 8-bit source exactly and feature goldens stay closed-form."""
    base = image_array(i)
    if image_container(i) == "bmp":
        return base
    v = PNG_VARIANTS[(i // 6) % 4]
    if v == "rgb8":
        return base
    if v == "gray8":
        return base[:, :, 0].copy()
    if v == "rgb16":
        return base.astype(np.uint16) * 257
    return base[:, :, 0].astype(np.uint16) * 257


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
        return encode_image(image_native(i), image_container(i))
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
    if a.size == 0:
        # a zero-frame WAV is well-formed but has no signal to featurize —
        # explicit guard (np.abs(a).max() and the decile indexing below both
        # blow up on empty input, with exception types that depend on
        # evaluation order; ADVICE r4 #1)
        raise ValueError("empty audio payload (zero samples)")
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

    → (kind, features). Error contract (ADVICE r4 #1/#2): a payload whose
    magic bytes match NO supported container raises
    ``UnrecognizedContainerError`` (a compressed codec would be required); a
    recognized-but-corrupt/degenerate payload raises plain ``ValueError`` —
    and ALL feature-math failures on degenerate well-formed content are
    normalized to ValueError here, so callers' per-row ok=false handler is a
    total contract, not a lucky exception-type coincidence."""
    if payload[:2] == b"BM" or payload[:8] == PNG_SIG:
        arr, _ = decode_image(payload)
        kind, args, fn = "image", (to_rgb8(arr),), image_features
    elif payload[:4] == b"RIFF":
        rate, samples = decode_wav(payload)
        kind, args, fn = "audio", (samples, rate), audio_features
    elif payload[:9] == b"YUV4MPEG2":
        fps, frames = decode_y4m(payload)
        kind, args, fn = "video", (frames, fps), video_features
    else:
        raise UnrecognizedContainerError("unrecognized media container (not BMP/PNG/WAV/Y4M)")
    try:
        return kind, fn(*args)
    except ValueError:
        raise
    except Exception as exc:  # noqa: BLE001 — normalize feature-math surface
        raise ValueError(f"degenerate {kind} payload: {type(exc).__name__}: {exc}") from exc


def resize_nearest(arr: np.ndarray, nw: int, nh: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index maps — deterministic (no
    float filter kernels), the resample rule both the operator and the golden
    twin share. Works on (h, w, 3) and single-plane (h, w) arrays."""
    h, w = arr.shape[:2]
    rows = (np.arange(nh, dtype=np.int64) * h) // nh
    cols = (np.arange(nw, dtype=np.int64) * w) // nw
    return arr[rows][:, cols]
