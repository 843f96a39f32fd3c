"""Generate the committed row-rules image fixture (fixtures/
images_rowrules.parquet) — the deterministic synthetic image+caption
table over which `image_suite_rowrules` is oracle-certified.

Committing the parquet (instead of generating it inside the query)
removes any Spark-vs-DuckDB ordering dependency: BOTH engines read the
SAME file, so the certified content is exactly the rule evaluation.
tests/test_round4.py::test_rowrules_fixture_matches_generator pins the
file to the generator — regenerating with these parameters must
reproduce it value-for-value.

Usage: python scripts/make_image_fixture.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from xmlschema_spark.sources.images import generate_images_pdf  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "fixtures" / "images_rowrules.parquet"

# every ROW-rule violation family is injected (decode-only families
# bad_dims / corrupt ride along as realistic noise the row rules must
# NOT flag); 400 rows x 12 fixture-violation rows per family
PARAMS = dict(
    n=400,
    seed=19,
    n_parts=8,
    null_frac=0.03,
    bad_dims_frac=0.03,
    bad_fmt_frac=0.03,
    corrupt_frac=0.03,
    dup_id_frac=0.03,
    hot_phash_frac=0.03,
    long_caption_frac=0.03,
    bad_id_frac=0.03,
    bad_tz_frac=0.03,
    bad_bool_frac=0.03,
    bad_qname_frac=0.03,
    bad_hex_frac=0.03,
    bad_b64_frac=0.03,
    bad_list_frac=0.03,
    bad_duration_frac=0.03,
)

ARROW_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
        ("created_at", pa.string()),
        ("tag", pa.string()),
        ("animated", pa.string()),
        ("icc_hex", pa.string()),
        ("exif_b64", pa.string()),
        ("flags", pa.string()),
        ("retention", pa.string()),
        ("part", pa.string()),
    ]
)


def build_table() -> pa.Table:
    pdf = generate_images_pdf(**PARAMS)
    return pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA, preserve_index=False)


if __name__ == "__main__":
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(build_table(), OUT)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")
