"""Baseline JPEG codec tests: exact decode of DC-flat blocks, PSNR
bounds on lossy round-trips for gray / 4:4:4 / 4:2:0, restart-interval
streams, Huffman/zigzag internals, reject paths, and the dispatch."""

import numpy as np
import pytest

from terrier_spark.datapipe.imagecodec import decode_image
from terrier_spark.datapipe.jpegcodec import (
    _ZIG_COLS,
    _ZIG_ROWS,
    _ZIGZAG,
    _build_huff,
    _DCT,
    decode_jpeg,
    encode_jpeg,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _pattern(h, w, c=None, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    if c is None:
        base = 128 + 40 * np.sin(x / 3.0) + 30 * np.cos(y / 4.0 + seed)
        return np.clip(base, 0, 255).astype(np.uint8)
    chans = [128 + 40 * np.sin(x / (3.0 + k)) + 30 * np.cos(y / 4.0 + seed + k)
             for k in range(c)]
    return np.clip(np.stack(chans, axis=2), 0, 255).astype(np.uint8)


def test_zigzag_is_the_spec_order():
    assert _ZIGZAG[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                            (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert _ZIGZAG[-3:] == [(6, 7), (7, 6), (7, 7)]
    assert sorted(zip(_ZIG_ROWS.tolist(), _ZIG_COLS.tolist())) == sorted(
        (r, c) for r in range(8) for c in range(8))


def test_dct_matrix_orthonormal():
    np.testing.assert_allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


def test_build_huff_canonical():
    # 2 codes of len 2, 1 of len 3: codes 00, 01, 100
    t = _build_huff([0, 2, 1] + [0] * 13, [5, 6, 7])
    assert t == {(2, 0b00): 5, (2, 0b01): 6, (3, 0b100): 7}


def test_solid_gray_exact():
    # one DCT coefficient (DC) -> quantization-exact at any quality
    for v in (0, 7, 128, 200, 255):
        img = np.full((16, 24), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=75))
        assert out.shape == (16, 24)
        assert int(np.abs(out.astype(int) - int(v)).max()) <= 1


def test_solid_rgb_exact():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :] = (200, 30, 90)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


@pytest.mark.parametrize("quality,min_psnr", [(95, 40), (75, 33)])
def test_gray_psnr(quality, min_psnr):
    img = _pattern(40, 56)
    out = decode_jpeg(encode_jpeg(img, quality=quality))
    assert out.shape == img.shape
    assert _psnr(img, out) > min_psnr


def test_rgb_444_psnr():
    img = _pattern(33, 47, 3)   # non-multiple-of-8 dims exercise padding
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample="444"))
    assert out.shape == img.shape
    assert _psnr(img, out) > 33


def test_rgb_420_psnr():
    img = _pattern(34, 46, 3)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample="420"))
    assert out.shape == img.shape
    assert _psnr(img, out) > 30


def test_restart_interval_stream():
    img = _pattern(48, 64)
    enc = encode_jpeg(img, quality=90, restart_interval=3)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
    out = decode_jpeg(enc)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    np.testing.assert_array_equal(out, base)   # restarts change framing only


def test_decode_rejects():
    img = _pattern(16, 16)
    good = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01" + good)
    # progressive SOF2 flag
    from terrier_spark.datapipe.imagemeta import make_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(make_jpeg(8, 8, progressive=True))


def test_dispatch_decodes_jpeg():
    img = _pattern(24, 24, 3)
    dec = decode_image(encode_jpeg(img, quality=95))
    assert dec is not None and dec[1] == "jpeg"
    assert dec[0].shape == img.shape
    # truncated / header-only JPEGs -> None, never an exception
    assert decode_image(encode_jpeg(img)[:60]) is None
    from terrier_spark.datapipe.imagemeta import make_jpeg

    assert decode_image(make_jpeg(8, 8)) is None


def test_real_features_on_jpeg(spark):
    from terrier_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        decode_features,
    )

    rows = []
    for i in range(6):
        img = _pattern(16 + i, 20, 3, seed=i)
        rows.append((i, "image", "image/jpeg", 20, 16 + i, None,
                     bytearray(encode_jpeg(img, quality=85))))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_features(media, decoder="real").collect()
    assert len(out) == 6
    assert all(r["feature"] is not None for r in out)
