"""Property-based tests (hypothesis) for the pure-function layer: codec
round-trips, phash stability, XSD-regex translation. No Spark session —
these run fast and explore the input space the fixture corpus can't."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from xmlschema_spark.functions import codec
from xmlschema_spark.functions.xsd_regex import xsd_to_java_regex

dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


def _image(w, h, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


@given(dims=dims, seed=st.integers(0, 2**16), fmt=st.sampled_from(["bmp", "png"]))
@settings(max_examples=40, deadline=None)
def test_lossless_roundtrip_exact(dims, seed, fmt):
    w, h = dims
    img = _image(w, h, seed)
    decoded, got_fmt = codec.decode_image(codec.encode_image(img, fmt))
    assert got_fmt == fmt
    assert np.array_equal(decoded, img)


@given(dims=st.tuples(st.integers(4, 40), st.integers(4, 40)),
       seed=st.integers(0, 2**16), fmt=st.sampled_from(["jpeg", "webp"]))
@settings(max_examples=40, deadline=None)
def test_lossy_roundtrip_dims_and_quality(dims, seed, fmt):
    w, h = dims
    img = _image(w, h, seed)
    decoded, got_fmt = codec.decode_image(codec.encode_image(img, fmt))
    assert got_fmt == fmt and decoded.shape == img.shape
    # lossy error is bounded: quant step 8 / 2x downsample keep PSNR sane
    # for random noise (>= ~12 dB); real thresholds are tested on the
    # structured fixture images where PSNR >= 40 dB holds
    assert codec.psnr(img, decoded) > 10.0


@given(dims=dims, seed=st.integers(0, 2**16),
       fmt=st.sampled_from(["bmp", "png", "jpeg", "webp"]),
       cut=st.integers(1, 11))
@settings(max_examples=40, deadline=None)
def test_truncation_always_detected(dims, seed, fmt, cut):
    """Any truncation into/through the header or payload must raise, never
    return wrong pixels silently (strict-decode semantics,
    base64_binary_validator analog)."""
    w, h = dims
    data = codec.encode_image(_image(w, h, seed), fmt)
    truncated = data[: max(0, len(data) - cut * max(1, len(data) // 12))]
    try:
        decoded, _ = codec.decode_image(truncated)
    except ValueError:
        return
    # bmp truncation of exact multiples is structurally undetectable only
    # if nothing was actually removed
    assert len(truncated) == len(data)
    assert decoded.shape == (h, w, 3)


@given(dims=dims, seed=st.integers(0, 2**16))
@settings(max_examples=25, deadline=None)
def test_phash_deterministic_and_in_range(dims, seed):
    w, h = dims
    img = _image(w, h, seed)
    p1, p2 = codec.phash64(img), codec.phash64(img)
    assert p1 == p2
    assert -(2**63) <= p1 < 2**63
    assert codec.hamming64(p1, p1) == 0


@given(s=st.text(alphabet=st.characters(codec="ascii", exclude_characters="\\^$[](){}|?*+."), max_size=12))
@settings(max_examples=50, deadline=None)
def test_regex_literal_patterns_anchor_exactly(s):
    """An XSD pattern of pure literals matches exactly that string and
    nothing with affixes (implicit anchoring, regex.py:352-355 analog)."""
    jre = xsd_to_java_regex(s)
    assert re.fullmatch(jre, s)
    assert not re.fullmatch(jre, s + "x")
    assert not re.fullmatch(jre, "x" + s)


@given(n=st.integers(1, 30))
@settings(max_examples=30, deadline=None)
def test_regex_quantified_class(n):
    jre = xsd_to_java_regex("[a-f]{1,10}")
    s = "a" * n
    m = re.fullmatch(jre, s)
    assert (m is not None) == (n <= 10)
