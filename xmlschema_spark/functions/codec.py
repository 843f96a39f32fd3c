"""Deterministic in-process image codec, PSNR, and perceptual hash.

The container has no PIL/OpenCV, so the engine ships its own tiny codec
family with *real* lossless and lossy semantics (stdlib zlib + numpy).
This is the scaled analog of the reference's binary-lexical validators
(`base64_binary_validator`, /root/reference/xmlschema/validators/builtins.py:144-155):
"the bytes decode cleanly and are consistent with their declared metadata".

Formats (all little-endian, 12-byte header ``magic(4s) w(u32) h(u32)`` then
a format-specific payload):

- ``bmp``  — raw RGB888, uncompressed. Lossless.
- ``png``  — zlib-compressed raw RGB888. Lossless.
- ``jpeg`` — uniform quantization with step ``q`` (1 byte after header),
             zlib-compressed. Lossy; PSNR falls as q grows.
- ``webp`` — 2× box-downsampled then nearest-upsampled, zlib-compressed.
             Lossy with spatially-correlated error.

Every function here is numpy-only so the pandas-UDF bodies in
``operators/multimodal.py`` stay vectorized per Arrow batch (no pickled
closures beyond this module).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = {
    "bmp": b"XBMP",
    "png": b"XPNG",
    "jpeg": b"XJPG",
    "webp": b"XWBP",
}
_MAGIC_REV = {v: k for k, v in MAGIC.items()}
FORMATS = tuple(MAGIC)
LOSSLESS = frozenset({"bmp", "png"})
HEADER = struct.Struct("<4sII")


def encode_image(pixels: np.ndarray, fmt: str, quality: int = 8, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array. ``quality`` = quant step for jpeg.

    ``level`` is the zlib effort (1-9) — it changes payload SIZE only,
    never decoded values, so consistency checks that re-encode internally
    may use ``level=1`` for throughput."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {pixels.shape} {pixels.dtype}")
    h, w = pixels.shape[:2]
    header = HEADER.pack(MAGIC[fmt], w, h)
    if fmt == "bmp":
        return header + pixels.tobytes()
    if fmt == "png":
        return header + zlib.compress(pixels.tobytes(), level)
    if fmt == "jpeg":
        q = max(1, min(255, int(quality)))
        quantized = (pixels // q) * q + q // 2
        return header + bytes([q]) + zlib.compress(quantized.astype(np.uint8).tobytes(), level)
    if fmt == "webp":
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        # box-downsample 2x (pad odd edges by replication)
        padded = np.pad(pixels, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        small = (
            padded.reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3)).round().astype(np.uint8)
        )
        return header + zlib.compress(small.tobytes(), level)
    raise ValueError(f"unknown fmt: {fmt}")


def decode_image(data) -> tuple[np.ndarray, str]:
    """Decode to ((h, w, 3) uint8, fmt). Raises ValueError on corruption.

    Accepts any buffer (bytes / bytearray / memoryview / Arrow buffer) and
    never copies the payload before inflating — at 10^12 MB-scale rows the
    extra full-payload copies are pure DRAM traffic, the one resource a
    bigger cluster node does NOT scale."""
    if data is None or len(data) < HEADER.size:
        raise ValueError("truncated header")
    magic, w, h = HEADER.unpack_from(data, 0)
    fmt = _MAGIC_REV.get(magic)
    if fmt is None:
        raise ValueError(f"bad magic {bytes(magic)!r}")
    body = memoryview(data)[HEADER.size:]

    def _inflate(b) -> bytes:
        try:
            return zlib.decompress(b)
        except zlib.error as e:
            raise ValueError(f"corrupt payload: {e}") from e

    if fmt == "bmp":
        raw = body
    elif fmt == "png":
        raw = _inflate(body)
    elif fmt == "jpeg":
        if len(body) == 0:
            raise ValueError("missing quant byte")
        raw = _inflate(body[1:])
    elif fmt == "webp":
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        raw = _inflate(body)
        if len(raw) != h2 * w2 * 3:
            raise ValueError("webp payload size mismatch")
        small = np.frombuffer(raw, np.uint8).reshape(h2, w2, 3)
        big = small.repeat(2, axis=0).repeat(2, axis=1)[:h, :w]
        return np.ascontiguousarray(big), fmt
    if len(raw) != h * w * 3:
        raise ValueError(f"payload size mismatch: {len(raw)} != {h * w * 3}")
    # .copy() detaches the pixels from the caller's buffer (safe to keep);
    # for png/jpeg `raw` is freshly inflated so a view is already private
    arr = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
    return (arr.copy() if fmt == "bmp" else arr), fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    if a.shape != b.shape:
        return 0.0
    # integer diff/square (exact, identical mse to the float64 formula)
    # touches 4 bytes/px of temporaries instead of ~32 — this kernel is
    # memory-bandwidth-bound when every core runs it at once
    d = a.astype(np.int32) - b
    mse = np.mean(np.square(d))
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def _block_mean_gray(pixels: np.ndarray, n: int = 8) -> np.ndarray:
    """Downsample luma to an n×n grid of block means (any input size)."""
    # elementwise float32 luma (not a BLAS matvec: BLAS would spin up a
    # per-worker thread pool, oversubscribing cores when many executors run
    # at once; float32 halves the memory traffic of this bandwidth-bound
    # kernel). Block sums via two add.reduceat C passes — no Python loop.
    p = pixels.astype(np.float32)
    gray = (
        p[..., 0] * np.float32(0.299)
        + p[..., 1] * np.float32(0.587)
        + p[..., 2] * np.float32(0.114)
    )
    h, w = gray.shape
    ys = (np.arange(n + 1) * h) // n
    xs = (np.arange(n + 1) * w) // n
    # reduceat on repeated indices (h or w < n) returns the single element
    # a[i] — the same ≥1-element block the old slice fallback used
    row_sums = np.add.reduceat(gray, ys[:-1], axis=0)
    sums = np.add.reduceat(row_sums, xs[:-1], axis=1)
    areas = np.maximum(np.diff(ys), 1)[:, None] * np.maximum(np.diff(xs), 1)[None, :]
    return (sums / areas).astype(np.float64)


def reencode_values(pixels: np.ndarray, fmt: str, quality: int = 8) -> np.ndarray:
    """Value-space image of ``decode_image(encode_image(pixels, fmt))``
    for the lossy formats, SKIPPING the zlib stage: compression is
    bijective — it changes the payload bytes, never the decoded values —
    so the internal-consistency PSNR computed against this array is
    bit-identical to the encode→decode roundtrip while not paying
    deflate+inflate per image (deflate is the single most expensive step
    of the roundtrip). The arithmetic below mirrors ``encode_image``
    exactly, including its uint8 wraparound behavior."""
    if fmt == "jpeg":
        q = max(1, min(255, int(quality)))
        return ((pixels // q) * q + q // 2).astype(np.uint8)
    if fmt == "webp":
        h, w = pixels.shape[:2]
        h2, w2 = (h + 1) // 2, (w + 1) // 2
        padded = np.pad(pixels, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
        small = (
            padded.reshape(h2, 2, w2, 2, 3).mean(axis=(1, 3)).round().astype(np.uint8)
        )
        return np.ascontiguousarray(small.repeat(2, axis=0).repeat(2, axis=1)[:h, :w])
    raise ValueError(f"not a lossy fmt: {fmt}")


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 block-mean luma thresholded at its median.

    Returned as a signed int64 (Spark LongType has no unsigned type).
    """
    grid = _block_mean_gray(pixels, 8)
    bits = (grid > np.median(grid)).flatten()
    # packbits is MSB-first, so bits[0] lands in the top bit — identical to
    # the shift-left fold this replaces
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return val - (1 << 64) if val >= (1 << 63) else val


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
