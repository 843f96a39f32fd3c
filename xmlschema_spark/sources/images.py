"""Deterministic synthetic image+caption table (BASELINE.json ``input_hint``).

Schema: ``image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:bigint`` (+ a ``part`` partition column used as the
Iceberg-partition analog for verdict scope / drift / checkpointing).

This is the engine-owned fixture generator (FIXTURES.md §0): real encoded
images from our deterministic codec so decode/PSNR rules are exercised,
with seeded violation injection per fixture family. No external data.

Two equivalent paths produce byte-identical rows for the same (n, seed,
fracs):

- ``generate_images_pdf`` — driver-side pandas, for small pytest tables.
- ``generate_images_df(distributed=True)`` — ``spark.range(n)`` +
  ``mapInPandas`` rendering on executors, for large benchmark/scaling
  tables (generation parallelizes like any other scan).

Row i is derived from ``default_rng(seed * 1_000_003 + i)`` alone, so
determinism is independent of partitioning.
"""

from __future__ import annotations

import base64
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from xmlschema_spark.functions.codec import FORMATS, encode_image, phash64

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        # typed metadata columns (input_hint core schema + metadata — the
        # lax-wildcard analog): each exercises one of the lexical rule
        # kinds (explicit_timezone, xsd_boolean, qname, hex/base64,
        # list_items, duration)
        T.StructField("created_at", T.StringType(), True),
        T.StructField("tag", T.StringType(), True),
        T.StructField("animated", T.StringType(), True),
        T.StructField("icc_hex", T.StringType(), True),
        T.StructField("exif_b64", T.StringType(), True),
        T.StructField("flags", T.StringType(), True),
        T.StructField("retention", T.StringType(), True),
        T.StructField("part", T.StringType(), True),
    ]
)

_COLUMNS = [f.name for f in IMAGE_SCHEMA.fields]

_WORDS = (
    "red green blue solid gradient photo of a small large tiny bright dark "
    "checker stripe noise cat dog tree car sky sea sun moon star leaf rock"
).split()

_FAMILIES = (
    "null", "bad_dims", "bad_fmt", "corrupt",
    "dup_id", "hot_phash", "long_caption", "bad_id",
    # metadata-column families (appended — earlier index ranges stay stable)
    "bad_tz", "bad_bool", "bad_qname", "bad_hex", "bad_b64", "bad_list",
    "bad_duration",
)

_TAGS = ("img:photo", "img:chart", "media:scan", "photo")
_BOOLS = ("true", "false", "0", "1")
_FLAG_WORDS = ("hdr", "raw", "geo", "srgb")


def _render(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic toy image: per-image coarse random structure (so
    phashes are distinct across images) + smooth upsample + light noise."""
    coarse = rng.integers(0, 256, size=(6, 6, 3)).astype(np.float64)
    yi = (np.arange(h) * 6) // h
    xi = (np.arange(w) * 6) // w
    img = coarse[yi][:, xi]
    img += rng.integers(-10, 11, size=(h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _family_bounds(n: int, fracs: dict[str, float]) -> list[tuple[str, int, int]]:
    """Disjoint [start, end) index ranges per violation family (applied in
    fixed order over row index), so expected counts are exact."""
    bounds = []
    cursor = 0
    for fam in _FAMILIES:
        cnt = int(n * fracs.get(fam, 0.0))
        bounds.append((fam, cursor, min(cursor + cnt, n)))
        cursor += cnt
    return bounds


def _family_of(i: int, bounds: list[tuple[str, int, int]]) -> str | None:
    for fam, lo, hi in bounds:
        if lo <= i < hi:
            return fam
    return None


def _make_row(
    i: int,
    seed: int,
    fam: str | None,
    n_parts: int,
    drift_part: str | None,
    min_side: int,
    max_side: int,
) -> tuple:
    r = np.random.default_rng(seed * 1_000_003 + i)
    part = f"p{i % n_parts:02d}"
    w = int(r.integers(min_side, max_side + 1))
    h = int(r.integers(min_side, max_side + 1))
    if drift_part is not None and part == drift_part:
        # shifted width distribution for the drift fixture
        w = int(r.integers(max_side + 8, max_side + 24))
    fmt = FORMATS[int(r.integers(0, len(FORMATS)))]
    pixels = _render(r, w, h)
    data = encode_image(pixels, fmt)
    ph = phash64(pixels)
    caption = " ".join(
        _WORDS[int(j)] for j in r.integers(0, len(_WORDS), size=int(r.integers(3, 9)))
    )
    image_id = f"img_{r.integers(0, 2**63):016x}"[:20]

    # metadata columns draw from a SEPARATE rng stream: inserting draws
    # into the original stream would shift image_id/pixels/phash and break
    # every pre-existing golden expectation that depends on them
    r2 = np.random.default_rng(seed * 2_000_003 + i)
    created_at = (
        f"2024-{int(r2.integers(1, 13)):02d}-{int(r2.integers(1, 29)):02d}"
        f"T{int(r2.integers(0, 24)):02d}:{int(r2.integers(0, 60)):02d}"
        f":{int(r2.integers(0, 60)):02d}Z"
    )
    tag = _TAGS[int(r2.integers(0, len(_TAGS)))]
    animated = _BOOLS[int(r2.integers(0, len(_BOOLS)))]
    icc_hex = bytes(r2.integers(0, 256, size=4).tolist()).hex()
    exif_b64 = base64.b64encode(bytes(r2.integers(0, 256, size=6).tolist())).decode()
    flags = " ".join(
        _FLAG_WORDS[int(j)] for j in r2.integers(0, len(_FLAG_WORDS), size=int(r2.integers(1, 4)))
    )
    retention = f"P{int(r2.integers(1, 366))}D"

    if fam == "null":
        caption = None
        fmt = None
    elif fam == "bad_dims":
        w, h = w + 5, h + 3  # declared dims disagree with encoded dims
    elif fam == "bad_fmt":
        fmt = "tiff"
    elif fam == "corrupt":
        data = data[: max(6, len(data) // 2)]
    elif fam == "dup_id":
        image_id = "img_d0d0d0d0d0d0d0d0"  # pattern-valid, shared by the family
    elif fam == "hot_phash":
        ph = 4242424242
    elif fam == "long_caption":
        caption = "x" * 600
    elif fam == "bad_id":
        image_id = f"BAD ID {i}"
    elif fam == "bad_tz":
        created_at = created_at[:-1]  # timezone missing (explicitTimezone required)
    elif fam == "bad_bool":
        animated = "yes"  # outside the strict XSD boolean lexical space
    elif fam == "bad_qname":
        tag = "1bad:x"  # NCName may not start with a digit
    elif fam == "bad_hex":
        icc_hex = icc_hex[:-1]  # odd length — not pair-aligned hex
    elif fam == "bad_b64":
        exif_b64 = exif_b64[:-1] + "%"  # outside the base64 alphabet
    elif fam == "bad_list":
        flags = "hdr BAD! geo"  # item fails the [a-z]+ item pattern
    elif fam == "bad_duration":
        retention = retention[1:]  # '30D' — missing the leading P

    return (
        image_id, data, w, h, fmt, caption, ph,
        created_at, tag, animated, icc_hex, exif_b64, flags, retention, part,
    )


def _collect_fracs(
    null_frac=0.0, bad_dims_frac=0.0, bad_fmt_frac=0.0, corrupt_frac=0.0,
    dup_id_frac=0.0, hot_phash_frac=0.0, long_caption_frac=0.0, bad_id_frac=0.0,
    bad_tz_frac=0.0, bad_bool_frac=0.0, bad_qname_frac=0.0, bad_hex_frac=0.0,
    bad_b64_frac=0.0, bad_list_frac=0.0, bad_duration_frac=0.0,
) -> dict[str, float]:
    return {
        "null": null_frac, "bad_dims": bad_dims_frac, "bad_fmt": bad_fmt_frac,
        "corrupt": corrupt_frac, "dup_id": dup_id_frac, "hot_phash": hot_phash_frac,
        "long_caption": long_caption_frac, "bad_id": bad_id_frac,
        "bad_tz": bad_tz_frac, "bad_bool": bad_bool_frac,
        "bad_qname": bad_qname_frac, "bad_hex": bad_hex_frac,
        "bad_b64": bad_b64_frac, "bad_list": bad_list_frac,
        "bad_duration": bad_duration_frac,
    }


def generate_images_pdf(
    n: int,
    seed: int = 42,
    n_parts: int = 8,
    drift_part: str | None = None,
    min_side: int = 8,
    max_side: int = 24,
    **fracs,
) -> pd.DataFrame:
    """Driver-side pandas generation (small pytest tables)."""
    bounds = _family_bounds(n, _collect_fracs(**fracs))
    rows = [
        _make_row(i, seed, _family_of(i, bounds), n_parts, drift_part, min_side, max_side)
        for i in range(n)
    ]
    return pd.DataFrame(
        rows, columns=_COLUMNS
    )


def generate_images_df(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    distributed: bool | None = None,
    **kw,
) -> DataFrame:
    """Spark DataFrame over the synthetic table, repartitioned by ``part``
    so the partition column is the physical partitioning (Iceberg analog).

    ``distributed=None`` auto-selects: executor-side rendering via
    ``mapInPandas`` for n >= 2000 (generation scales with the cluster),
    driver-side pandas below that (lower fixed cost)."""
    if distributed is None:
        distributed = n >= 2000
    if not distributed:
        pdf = generate_images_pdf(n, seed=seed, **kw)
        df = spark.createDataFrame(pdf, schema=IMAGE_SCHEMA)
        n_parts = int(kw.get("n_parts", 8))
        # range-partition on (part, image_id): keeps part-locality (the
        # Iceberg identity-partition analog) with EVEN partition sizes —
        # hash repartition("part") over few distinct keys leaves empty
        # partitions and 2-3x hot ones (measured), capping parallelism.
        return df.repartitionByRange(max(8, n_parts), "part", "image_id")

    n_parts = int(kw.get("n_parts", 8))
    drift_part = kw.get("drift_part")
    min_side = int(kw.get("min_side", 8))
    max_side = int(kw.get("max_side", 24))
    fracs = _collect_fracs(
        **{k: v for k, v in kw.items()
           if k not in ("n_parts", "drift_part", "min_side", "max_side")}
    )
    bounds = _family_bounds(n, fracs)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _make_row(
                    int(i), seed, _family_of(int(i), bounds),
                    n_parts, drift_part, min_side, max_side,
                )
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=_COLUMNS)

    slices = max(n_parts * 4, 32)
    rng_ids = spark.range(0, n, 1, slices)
    # same balanced range partitioning as the driver-side path (see above)
    return rng_ids.mapInPandas(render, schema=IMAGE_SCHEMA).repartitionByRange(
        max(8, n_parts), "part", "image_id"
    )
