"""JPEG baseline codec unit tests (round 5): T.81 baseline sequential —
Huffman entropy coding, DCT, 4:4:4 grayscale/color — in pure stdlib+numpy.
The second compressed format inside the real-decode boundary. No Spark.

Reference raster twin: the image→tensor decode path at
``training_strikethrough/training_inference_scripts/model_training_pipeline.py:18-45``.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_machine_spark.core import rawmedia as RM


def _flat_block_img(bh: int, bw: int, seed: int) -> np.ndarray:
    bi = np.arange(bh, dtype=np.int64)[:, None]
    bj = np.arange(bw, dtype=np.int64)[None, :]
    vals = (bi * 5 + bj * 11 + seed) % 256
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)


def test_zigzag_is_the_t81_order():
    assert RM.ZIGZAG[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert sorted(RM.ZIGZAG.tolist()) == list(range(64))


def test_huffman_tables_well_formed():
    # Kraft-complete-or-under canonical tables; AC has the full 162 symbols
    assert sum(RM.JPEG_DC_BITS) == len(RM.JPEG_DC_VALS) == 12
    assert sum(RM.JPEG_AC_BITS) == len(RM.JPEG_AC_VALS) == 162
    for bits, vals in ((RM.JPEG_DC_BITS, RM.JPEG_DC_VALS), (RM.JPEG_AC_BITS, RM.JPEG_AC_VALS)):
        codes = RM._huff_spec_to_codes(bits, vals)
        assert len(codes) == len(vals)  # no duplicate symbols
        assert all(code < (1 << ln) for code, ln in codes.values())


@pytest.mark.parametrize("seed", [0, 7, 42])
def test_flat_block_gray_roundtrip_exact(seed):
    """The asset-family contract: flat 8×8 blocks roundtrip byte-exactly
    (lone DC coefficient, DC quant step 8 — zero loss)."""
    img = _flat_block_img(8, 12, seed)
    back = RM.decode_jpeg(RM.encode_jpeg(img))
    assert back.dtype == np.uint8 and back.shape == img.shape
    assert np.array_equal(back, img)


def test_flat_block_color_roundtrip_exact():
    """Gray-valued 3-component: Y carries the signal, Cb/Cr are constant 128
    (all-zero coefficients), and the YCbCr↔RGB pair is exact on gray."""
    g = _flat_block_img(10, 9, 3)
    rgb = np.stack([g, g, g], axis=2)
    back = RM.decode_jpeg(RM.encode_jpeg(rgb))
    assert back.shape == rgb.shape
    assert np.array_equal(back, rgb)


@pytest.mark.parametrize(
    "shape",
    [(50, 70), (64, 64), (8, 8), (1, 1), (50, 70, 3), (17, 23, 3)],
)
def test_general_content_bounded_error(shape):
    """Arbitrary content (including non-×8 dims → edge-padded partial
    blocks): lossy, but error bounded by the AC quant step."""
    n = int(np.prod(shape))
    arr = (np.arange(n, dtype=np.int64).reshape(shape) * 7919 % 256).astype(np.uint8)
    back = RM.decode_jpeg(RM.encode_jpeg(arr))
    assert back.shape == arr.shape and back.dtype == np.uint8
    err = np.abs(back.astype(np.int64) - arr.astype(np.int64))
    assert err.max() <= 48, err.max()
    assert err.mean() <= 8.0, err.mean()


def test_zrl_long_zero_run_path():
    """A lone highest-frequency component: zigzag position 63 nonzero with
    62 zeros before it forces ZRL (16-zero-run) codes through encode AND
    decode. Verified by re-running the quant step out-of-band."""
    m = RM._dct_matrix()
    coefs = np.zeros((8, 8))
    coefs[7, 7] = 9 * RM.JPEG_QUANT[7, 7]  # survives quantization as ±9
    block = np.clip(np.round(np.einsum("ui,uv,vj->ij", m, coefs, m) + 128), 0, 255).astype(np.uint8)
    img = np.tile(block, (2, 2))
    # out-of-band: confirm the quantized zigzag really has a >=32-zero run
    zz = RM._plane_to_zigzag_blocks(img)[0]
    nz = np.nonzero(zz[1:])[0]
    assert nz.size and nz[-1] == 62  # position 63 in zz → forces 3 ZRLs
    back = RM.decode_jpeg(RM.encode_jpeg(img))
    err = np.abs(back.astype(np.int64) - img.astype(np.int64))
    assert err.max() <= 48


def test_sixteen_bit_dqt_parse():
    """Decoder handles Pq=1 (16-bit) quant tables: splice the encoder's
    8-bit DQT into a 16-bit variant of the same values — decode must agree
    byte-for-byte with the original stream's decode."""
    img = _flat_block_img(8, 8, 1)
    data = RM.encode_jpeg(img)
    i = data.index(b"\xff\xdb")
    (seglen,) = struct.unpack_from(">H", data, i + 2)
    vals = data[i + 5 : i + 5 + 64]
    wide = b"".join(struct.pack(">H", v) for v in vals)
    newseg = b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 128, 0x10) + wide
    spliced = data[:i] + newseg + data[i + 2 + seglen :]
    assert np.array_equal(RM.decode_jpeg(spliced), img)


def test_error_taxonomy():
    img = _flat_block_img(8, 8, 2)
    data = RM.encode_jpeg(img)
    # not a JPEG → UnrecognizedContainerError (missing-codec boundary)
    with pytest.raises(RM.UnrecognizedContainerError):
        RM.decode_jpeg(b"RIFF" + data[2:])
    # recognized but truncated → plain ValueError (data corruption)
    with pytest.raises(ValueError, match="truncated|sync|scan"):
        RM.decode_jpeg(data[: len(data) // 3])
    # progressive (SOF2) → unsupported-profile ValueError naming the feature
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        RM.decode_jpeg(prog)
    # restart intervals → unsupported-profile ValueError
    dri = data[:2] + b"\xff\xdd" + struct.pack(">HH", 4, 8) + data[2:]
    with pytest.raises(ValueError, match="restart"):
        RM.decode_jpeg(dri)
    # corrupt entropy data → ValueError, not a crash (flip bytes mid-scan)
    corrupt = bytearray(data)
    corrupt[-12:-4] = b"\x55" * 8
    try:
        RM.decode_jpeg(bytes(corrupt))
    except ValueError:
        pass  # either outcome acceptable: decode noise or detect corruption


def test_asset_factory_jpeg_slots():
    """Container cycle: i%6==0 alternates BMP/JPEG by (i//6) parity, PNG
    stays at i%6==3; JPEG assets alternate gray / 3-component and their
    payloads decode back to exactly the native array (flat-block family)."""
    assert RM.image_container(0) == "bmp"
    assert RM.image_container(6) == "jpeg"
    assert RM.image_container(12) == "bmp"
    assert RM.image_container(18) == "jpeg"
    assert RM.image_container(3) == "png"
    assert RM.image_container(9) == "png"
    for i, want_ndim in ((6, 2), (18, 3), (30, 2), (42, 3)):
        native = RM.image_native(i)
        assert native.ndim == want_ndim
        payload = RM.make_payload(i)
        assert payload[:2] == RM.JPEG_SOI
        arr, container = RM.decode_image(payload)
        assert container == "jpeg"
        assert np.array_equal(arr, native), f"asset {i} not byte-exact"
        # decode_features agrees with the by-construction golden path
        kind, feats = RM.decode_features(payload)
        assert kind == "image"
        assert feats == RM.image_features(RM.to_rgb8(native))


def test_encode_jpeg_rejects_bad_input():
    with pytest.raises(ValueError):
        RM.encode_jpeg(np.zeros((4, 4), dtype=np.uint16))
    with pytest.raises(ValueError):
        RM.encode_jpeg(np.zeros((4, 4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        RM.encode_jpeg(np.zeros((0, 8), dtype=np.uint8))


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a marker.
    Other encoders emit them; a padding 0xFF must not be consumed as the
    marker byte (which misreads the real marker as a segment length)."""
    img = np.full((16, 16), 128, dtype=np.uint8)
    data = RM.encode_jpeg(img)
    # splice fill bytes before the first post-SOI marker and before EOI
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    padded = data[:2] + b"\xff\xff\xff" + data[2:-2] + b"\xff\xff" + data[-2:]
    back = RM.decode_jpeg(padded)
    np.testing.assert_array_equal(back, RM.decode_jpeg(data))
