"""Deterministic codec + regex-translation helpers (no external libs)."""

from xmlschema_spark.functions.codec import (
    FORMATS,
    decode_image,
    encode_image,
    phash64,
    psnr,
)
from xmlschema_spark.functions.xsd_regex import xsd_to_java_regex

__all__ = [
    "FORMATS",
    "decode_image",
    "encode_image",
    "phash64",
    "psnr",
    "xsd_to_java_regex",
]
