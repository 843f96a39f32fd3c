"""The literal ``spark-submit --py-files xmlschema_spark.zip`` deployment
path (north rule: "ships as a spark-submit --py-files job").

One real spark-submit process, launched from an EMPTY scratch cwd so the
package can only be imported from the shipped zip, runs the CLI job over
a synthetic input and must write the violations/verdicts sinks. This is
the packaging proof the scaling harness (scripts/submit_scaling.py)
scales up to two parallelism levels.
"""

import json
import subprocess
import sys

import pytest

from xmlschema_spark.session import package_zip

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1] / "scripts"))
from submit_scaling import find_spark_submit  # noqa: E402

DRIVER = '''"""Driver file shipped to spark-submit; the engine arrives via --py-files."""
import sys
from xmlschema_spark.cli import main
sys.exit(main(sys.argv[1:]))
'''


def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    try:
        submit = find_spark_submit()
    except RuntimeError:
        pytest.skip("spark-submit not on this box")
    zip_path = package_zip()
    assert zip_path is not None and zip_path.exists()
    # the scratch cwd holds only the 4-line driver file — no package tree
    scratch = tmp_path / "scratch"
    scratch.mkdir()
    (scratch / "job.py").write_text(DRIVER)
    out = scratch / "sink"
    proc = subprocess.run(
        [submit, "--master", "local[4]", "--py-files", str(zip_path),
         "job.py", "--synthetic", "300", "--output", str(out),
         "--run-id", "pkg"],
        cwd=str(scratch), text=True, capture_output=True, timeout=300,
    )
    # rc 1 = job ran and found violations (the synthetic input plants
    # corrupt rows on purpose); anything else is a launch/packaging error
    assert proc.returncode in (0, 1), proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["run_id"] == "pkg" and summary["partitions"] > 0
    assert summary["failed"] > 0  # the planted corrupt rows were caught
    # the sinks are real parquet readable by the host session
    v = spark.read.parquet(str(out / "pkg" / "violations"))
    assert {"rule_id", "row_id", "reason"} <= set(v.columns)
    verd = spark.read.parquet(str(out / "pkg" / "verdicts"))
    assert verd.count() == summary["partitions"]
