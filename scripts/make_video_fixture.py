"""Generate the committed GIF row-rules fixture (fixtures/
video_rowrules.parquet) — the deterministic synthetic video-clip table
over which `gif_header_check_videos` is oracle-certified and
`video_frames_stats` exercises the default GIF decode hook.

Same contract as make_image_fixture.py / make_audio_fixture.py;
tests/test_containers.py::test_video_fixture_matches_generator pins the
file to the generator.

Usage: python scripts/make_video_fixture.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from xmlschema_spark.sources.video import generate_video_pdf  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "fixtures" / "video_rowrules.parquet"

# every GIF rule/decode violation family injected: 300 rows x 9 fixture
# rows per family (frac 0.03)
PARAMS = dict(
    n=300,
    seed=31,
    n_parts=8,
    null_frac=0.03,
    short_frac=0.03,
    bad_magic_frac=0.03,
    truncated_frac=0.03,
    dims_mismatch_frac=0.03,
    corrupt_lzw_frac=0.03,
    frames_mismatch_frac=0.03,
)

ARROW_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("n_frames", pa.int32()),
        ("part", pa.string()),
    ]
)


def build_table() -> pa.Table:
    pdf = generate_video_pdf(**PARAMS)
    return pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA, preserve_index=False)


if __name__ == "__main__":
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(build_table(), OUT)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")
