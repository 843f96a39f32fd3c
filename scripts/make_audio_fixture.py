"""Generate the committed WAV row-rules fixture (fixtures/
audio_rowrules.parquet) — the deterministic synthetic audio-clip table
over which `wav_header_check_audio` is oracle-certified.

Same contract as scripts/make_image_fixture.py: committing the parquet
removes any Spark-vs-DuckDB ordering dependency (both engines read the
SAME file), and tests/test_containers.py::
test_audio_fixture_matches_generator pins the file to the generator.

Usage: python scripts/make_audio_fixture.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from xmlschema_spark.sources.audio import generate_audio_pdf  # noqa: E402

OUT = Path(__file__).resolve().parents[1] / "fixtures" / "audio_rowrules.parquet"

# every WAV header-rule violation family injected: 300 rows x 9 fixture
# rows per family (frac 0.03)
PARAMS = dict(
    n=300,
    seed=23,
    n_parts=8,
    null_frac=0.03,
    short_frac=0.03,
    truncated_frac=0.03,
    bad_magic_frac=0.03,
    nonpcm_frac=0.03,
    layout_frac=0.03,
    rate_mismatch_frac=0.03,
    channels_mismatch_frac=0.03,
    bits_mismatch_frac=0.03,
    nsamples_mismatch_frac=0.03,
)

ARROW_SCHEMA = pa.schema(
    [
        ("audio_id", pa.string()),
        ("bytes", pa.binary()),
        ("sample_rate", pa.int32()),
        ("channels", pa.int32()),
        ("bits", pa.int32()),
        ("n_samples", pa.int64()),
        ("part", pa.string()),
    ]
)


def build_table() -> pa.Table:
    pdf = generate_audio_pdf(**PARAMS)
    return pa.Table.from_pandas(pdf, schema=ARROW_SCHEMA, preserve_index=False)


if __name__ == "__main__":
    OUT.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(build_table(), OUT)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")
