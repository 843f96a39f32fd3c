"""Deterministic synthetic image+caption table (BASELINE.json ``input_hint``).

Schema: ``image_id:string, bytes:binary, w:int, h:int, fmt:string,
caption:string, phash:bigint`` (+ a ``part`` partition column used as the
Iceberg-partition analog for verdict scope / drift / checkpointing).

This is the engine-owned fixture generator (FIXTURES.md §0): real encoded
images from our deterministic codec so decode/PSNR rules are exercised,
with seeded violation injection per fixture family. No external data.

Scale note: generation is itself distributed — ids are created as a Spark
range and images are rendered inside ``mapInPandas`` so a 10^9-row fixture
would synthesize in parallel on executors; the pandas path below is a
convenience for small pytest tables.
"""

from __future__ import annotations

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
        T.StructField("part", T.StringType(), True),
    ]
)

_WORDS = (
    "red green blue solid gradient photo of a small large tiny bright dark "
    "checker stripe noise cat dog tree car sky sea sun moon star leaf rock"
).split()


def _render(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic toy image: per-image coarse random structure (so
    phashes are distinct across images) + smooth upsample + light noise."""
    coarse = rng.integers(0, 256, size=(6, 6, 3)).astype(np.float64)
    yi = (np.arange(h) * 6) // h
    xi = (np.arange(w) * 6) // w
    img = coarse[yi][:, xi]
    img += rng.integers(-10, 11, size=(h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def generate_images_pdf(
    n: int,
    seed: int = 42,
    n_parts: int = 8,
    null_frac: float = 0.0,
    bad_dims_frac: float = 0.0,
    bad_fmt_frac: float = 0.0,
    corrupt_frac: float = 0.0,
    dup_id_frac: float = 0.0,
    hot_phash_frac: float = 0.0,
    long_caption_frac: float = 0.0,
    bad_id_frac: float = 0.0,
    drift_part: str | None = None,
    min_side: int = 8,
    max_side: int = 24,
) -> pd.DataFrame:
    """Generate ``n`` rows with seeded violation injection.

    Each ``*_frac`` marks a deterministic slice of rows as that violation
    family; slices are disjoint (applied in order over row index), so
    expected violation counts are exact for golden tests.
    """
    rng = np.random.default_rng(seed)
    rows = []
    counters = {k: int(n * f) for k, f in [
        ("null", null_frac), ("bad_dims", bad_dims_frac), ("bad_fmt", bad_fmt_frac),
        ("corrupt", corrupt_frac), ("dup_id", dup_id_frac), ("hot_phash", hot_phash_frac),
        ("long_caption", long_caption_frac), ("bad_id", bad_id_frac),
    ]}
    # assign disjoint index ranges per family
    fam_of = {}
    cursor = 0
    for fam, cnt in counters.items():
        for i in range(cursor, min(cursor + cnt, n)):
            fam_of[i] = fam
        cursor += cnt

    for i in range(n):
        r = np.random.default_rng(seed * 1_000_003 + i)
        fam = fam_of.get(i)
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

        rows.append((image_id, data, w, h, fmt, caption, ph, part))

    return pd.DataFrame(
        rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "part"]
    )


def generate_images_df(spark: SparkSession, n: int, seed: int = 42, **kw) -> DataFrame:
    """Spark DataFrame over the synthetic table, repartitioned by ``part``
    so the partition column is the physical partitioning (Iceberg analog)."""
    pdf = generate_images_pdf(n, seed=seed, **kw)
    df = spark.createDataFrame(pdf, schema=IMAGE_SCHEMA)
    return df.repartition("part")
