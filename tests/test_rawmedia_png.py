"""PNG codec unit tests (round 5, VERDICT r4 #3): stdlib-zlib decoder with
all five scanline filters, grayscale/truecolor at bit depths 8/16 — the first
compressed format inside the real-decode boundary. Pure numpy, no Spark.

Reference raster twin: the image→tensor decode path at
``training_strikethrough/training_inference_scripts/model_training_pipeline.py:18-45``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ocr_machine_spark.core import rawmedia as RM


def _arr(shape, dtype):
    mod = 256 if dtype == np.uint8 else 65536
    return (np.arange(int(np.prod(shape)), dtype=np.int64).reshape(shape) * 7919 % mod).astype(dtype)


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((1, 1), np.uint8),  # single pixel, gray8
        ((8, 5), np.uint8),
        ((8, 5, 3), np.uint8),
        ((8, 5), np.uint16),
        ((8, 5, 3), np.uint16),
        ((100, 37, 3), np.uint8),  # odd width, >5 rows → every filter type
        ((64, 64), np.uint16),
    ],
)
def test_png_roundtrip_exact(shape, dtype):
    arr = _arr(shape, dtype)
    back = RM.decode_png(RM.encode_png(arr))
    assert back.dtype == arr.dtype and back.shape == arr.shape
    assert np.array_equal(back, arr)


def test_png_each_filter_type_alone():
    """The encoder cycles filters by row; a 1-row image isolates filter 0,
    and shifting the content exercises Sub/Up/Average/Paeth in the cycle.
    Decode every 5-row block where row r uses filter r — already covered by
    the roundtrip — plus a hand-built stream per filter type."""
    w, ch = 6, 3
    rows = [bytes((r * 31 + c * 7) % 256 for c in range(w * ch)) for r in range(5)]
    for ft in range(5):
        # build filtered scanlines by inverting decode's math with encode's
        # helper: reuse encode_png on a content where row index forces ft?
        # Simpler: craft a minimal PNG whose every row uses filter `ft` and
        # check against a straight per-byte reference implementation.
        out = bytearray()
        prev = bytes(w * ch)
        bpp = ch
        for line in rows:
            out.append(ft)
            if ft == 0:
                out += line
            elif ft == 1:
                out += bytes((line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF for i in range(len(line)))
            elif ft == 2:
                out += bytes((line[i] - prev[i]) & 0xFF for i in range(len(line)))
            elif ft == 3:
                out += bytes(
                    (line[i] - (((line[i - bpp] if i >= bpp else 0) + prev[i]) >> 1)) & 0xFF
                    for i in range(len(line))
                )
            else:
                out += bytes(
                    (line[i] - RM._paeth(line[i - bpp] if i >= bpp else 0, prev[i], prev[i - bpp] if i >= bpp else 0)) & 0xFF
                    for i in range(len(line))
                )
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, len(rows), 8, 2, 0, 0, 0)
        data = (
            RM.PNG_SIG
            + RM._png_chunk(b"IHDR", ihdr)
            + RM._png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + RM._png_chunk(b"IEND", b"")
        )
        got = RM.decode_png(data)
        want = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(len(rows), w, ch)
        assert np.array_equal(got, want), f"filter {ft}"


def test_png_16bit_big_endian_samples():
    """16-bit samples are big-endian per spec — a value with distinct hi/lo
    bytes must survive exactly (catches byte-order bugs the *257 generator
    content cannot, since its hi == lo byte)."""
    arr = np.array([[0x1234, 0xFF01], [0x00FF, 0xABCD]], dtype=np.uint16)
    assert np.array_equal(RM.decode_png(RM.encode_png(arr)), arr)


def test_png_error_taxonomy():
    # unrecognized magic → UnrecognizedContainerError (missing-codec boundary)
    with pytest.raises(RM.UnrecognizedContainerError):
        RM.decode_png(b"\xff\xd8\xff\xe0 jpeg")
    # recognized container, corrupt body → plain ValueError (data corruption)
    good = RM.encode_png(_arr((4, 4), np.uint8))
    with pytest.raises(ValueError, match="truncated|corrupt|malformed|mismatch"):
        RM.decode_png(good[:40])
    # corrupt the IDAT zlib stream
    bad = bytearray(good)
    bad[-20] ^= 0xFF
    with pytest.raises(ValueError):
        RM.decode_png(bytes(bad))
    # out-of-profile: palette color type
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    pal = RM.PNG_SIG + RM._png_chunk(b"IHDR", ihdr) + RM._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG profile"):
        RM.decode_png(pal)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    inter = RM.PNG_SIG + RM._png_chunk(b"IHDR", ihdr) + RM._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        RM.decode_png(inter)


def test_png_chunk_crc_is_verified():
    """A corrupted-but-length-consistent chunk body must fail the stored
    CRC check (ValueError), never decode garbage silently. Flipping a byte
    inside the IHDR body keeps framing valid but invalidates its CRC."""
    good = RM.encode_png(_arr((4, 4), np.uint8))
    bad = bytearray(good)
    ihdr_body = good.find(b"IHDR") + 4
    bad[ihdr_body + 8] ^= 0x01  # bit-depth byte: framing intact, CRC stale
    with pytest.raises(ValueError, match="CRC mismatch"):
        RM.decode_png(bytes(bad))


def test_image_native_variants_and_rgb8_recovery():
    """PNG assets cycle gray8/rgb8/gray16/rgb16; the canonical rgb8 view of
    every 16-bit variant recovers the 8-bit source exactly (content is
    v*257), keeping feature goldens closed-form across depths."""
    seen = set()
    for i in range(3, 3 + 4 * 6, 6):
        assert RM.image_container(i) == "png"
        v = RM.PNG_VARIANTS[(i // 6) % 4]
        seen.add(v)
        nat = RM.image_native(i)
        rgb = RM.to_rgb8(nat)
        assert rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] == 3
        if v.startswith("gray"):
            base = RM.image_array(i)[:, :, 0]
            assert np.array_equal(rgb[:, :, 0], base)
            assert np.array_equal(rgb[:, :, 1], base)
        else:
            assert np.array_equal(rgb, RM.image_array(i))
    assert seen == set(RM.PNG_VARIANTS)
    assert RM.image_container(0) == "bmp"
    assert np.array_equal(RM.image_native(0), RM.image_array(0))


def test_decode_image_dispatch():
    bmp = RM.encode_image(RM.image_native(0), "bmp")
    png = RM.encode_image(RM.image_native(3), "png")
    a, c = RM.decode_image(bmp)
    assert c == "bmp" and a.shape == RM.image_native(0).shape
    a, c = RM.decode_image(png)
    assert c == "png" and np.array_equal(a, RM.image_native(3))
    with pytest.raises(RM.UnrecognizedContainerError):
        RM.decode_image(b"RIFFnot-an-image")


def test_audio_empty_guard():
    """Zero-sample WAV is well-formed; the feature math must reject it with
    ValueError (deterministic per-row degradation), not an order-dependent
    IndexError (ADVICE r4 #1)."""
    data = RM.encode_wav(np.zeros(0, dtype=np.int16), RM.AUDIO_RATE)
    rate, samples = RM.decode_wav(data)
    assert samples.size == 0
    with pytest.raises(ValueError, match="empty audio"):
        RM.audio_features(samples, rate)
    with pytest.raises(ValueError):
        RM.decode_features(data)


def test_png_decompression_bomb_bounded():
    """A tiny IDAT inflating far beyond the IHDR-declared pixel size must be
    rejected as a per-row ValueError, not balloon to its full inflated size
    (review fix r5: unbounded zlib.decompress could OOM an executor before
    the length check ran)."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2 gray8
    bomb = (
        RM.PNG_SIG
        + RM._png_chunk(b"IHDR", ihdr)
        + RM._png_chunk(b"IDAT", zlib.compress(b"\x00" * 100_000_000))
        + RM._png_chunk(b"IEND", b"")
    )
    assert len(bomb) < 200_000  # the attack: small wire size
    with pytest.raises(ValueError, match="length mismatch"):
        RM.decode_png(bomb)


def test_png_roundtrip_property_random_arrays():
    """Property sweep: 40 random-shaped/typed arrays (gray/rgb × 8/16-bit,
    dims 1..40, including non-contiguous views) roundtrip exactly."""
    rng = np.random.RandomState(11)
    for trial in range(40):
        h, w = int(rng.randint(1, 41)), int(rng.randint(1, 41))
        ch = rng.choice([1, 3])
        dt = rng.choice([np.uint8, np.uint16])
        hi = 256 if dt == np.uint8 else 65536
        shape = (h, w) if ch == 1 else (h, w, 3)
        arr = rng.randint(0, hi, size=shape).astype(dt)
        if trial % 3 == 0 and h > 1:
            arr = arr[::2].copy() if trial % 6 == 0 else arr[::2]  # strided view too
        back = RM.decode_png(RM.encode_png(arr))
        assert back.dtype == arr.dtype and back.shape == arr.shape, (trial, shape, dt)
        assert np.array_equal(back, np.ascontiguousarray(arr)), (trial, shape, dt)
