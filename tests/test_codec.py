"""Codec semantics: lossless roundtrip, lossy PSNR, corruption, phash.

These mirror the reference's binary-lexical validator tests
(hex/base64 decode checks, builtins.py:139-155) at pixel level.
"""

import numpy as np
import pytest

from xmlschema_spark.functions import codec


def _img(seed=0, w=16, h=12):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)


def _smooth_img(seed=0, w=32, h=32):
    """Gradient + mild noise — representative photo-like content where a
    lossy codec should retain high PSNR (pure noise is the worst case)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((xx + yy) * 255 // (w + h - 2))[..., None].repeat(3, axis=2)
    img = img + rng.integers(-4, 5, size=(h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("fmt", ["bmp", "png"])
def test_lossless_roundtrip(fmt):
    img = _img(1)
    out, f = codec.decode_image(codec.encode_image(img, fmt))
    assert f == fmt
    assert np.array_equal(out, img)


@pytest.mark.parametrize("fmt", ["jpeg", "webp"])
def test_lossy_roundtrip_high_psnr(fmt):
    img = _smooth_img(2, 32, 32)
    out, f = codec.decode_image(codec.encode_image(img, fmt))
    assert f == fmt
    assert out.shape == img.shape
    # lossy but bounded error on smooth content
    assert codec.psnr(img, out) > 25.0
    assert not np.array_equal(out, img)


def test_jpeg_quality_monotonic():
    img = _img(3, 24, 24)
    p_hi = codec.psnr(img, codec.decode_image(codec.encode_image(img, "jpeg", quality=4))[0])
    p_lo = codec.psnr(img, codec.decode_image(codec.encode_image(img, "jpeg", quality=64))[0])
    assert p_hi > p_lo


def test_corrupt_raises():
    img = _img(4)
    data = codec.encode_image(img, "png")
    with pytest.raises(ValueError):
        codec.decode_image(data[: len(data) // 2])
    with pytest.raises(ValueError):
        codec.decode_image(b"NOPE" + data[4:])
    with pytest.raises(ValueError):
        codec.decode_image(b"\x01\x02")


def test_odd_dims_webp():
    img = _img(5, w=9, h=7)
    out, _ = codec.decode_image(codec.encode_image(img, "webp"))
    assert out.shape == (7, 9, 3)


def test_phash_deterministic_and_discriminative():
    a, b = _img(6), _img(7)
    assert codec.phash64(a) == codec.phash64(a)
    assert codec.phash64(a) != codec.phash64(b)
    assert -(2**63) <= codec.phash64(a) < 2**63
    # lossy re-encode keeps phash close (perceptual)
    dec, _ = codec.decode_image(codec.encode_image(a, "jpeg", quality=4))
    assert codec.hamming64(codec.phash64(a), codec.phash64(dec)) <= 10


def test_psnr_identity_is_inf():
    img = _img(8)
    assert codec.psnr(img, img) == float("inf")


def test_reencode_values_bit_identical_to_roundtrip():
    """reencode_values must equal decode(encode(...)) EXACTLY for every
    lossy format and odd/even dims — it is the same math minus the
    bijective zlib stage, so the PSNR path may substitute it freely."""
    import numpy as np

    from xmlschema_spark.functions import codec

    rng = np.random.default_rng(99)
    for h, w in [(16, 16), (17, 23), (9, 8), (1, 1)]:
        pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for fmt in ("jpeg", "webp"):
            roundtrip, _ = codec.decode_image(codec.encode_image(pixels, fmt, level=1))
            fast = codec.reencode_values(pixels, fmt)
            assert np.array_equal(roundtrip, fast), (fmt, h, w)
