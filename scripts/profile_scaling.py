"""Per-job 8-vs-32 scaling profile for the constraint suite.

Runs each of the scaling suite's four jobs SEPARATELY (serial, timed)
in a pinned fresh JVM at two core counts, to attribute the suite's
scaling loss to a specific job. Diagnostic only — not part of the
graded bench.

Usage: python scripts/profile_scaling.py [n_images] [lo] [hi]
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, os, sys, time
cores = {cores}
os.sched_setaffinity(0, set(range(cores)))
sys.path.insert(0, {repo!r})
from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.session import get_spark
from xmlschema_spark.sources.images import generate_images_df
from xmlschema_spark.sources.rules_loader import default_image_ruleset
from xmlschema_spark.operators import drift as drift_ops
from xmlschema_spark.operators import identity as id_ops

spark = get_spark("profile", cores=cores,
                  extra_conf={{"spark.sql.adaptive.enabled": "false"}})
df = generate_images_df(
    spark, {n}, seed=1234, n_parts={n_parts},
    null_frac=0.02, bad_dims_frac=0.02, corrupt_frac=0.02, dup_id_frac=0.02,
    min_side=64, max_side=128,
)
df = df.cache()
df.count()

eng = ValidationEngine(default_image_ruleset())
jobs = {{
    "one_pass": lambda: eng.validate_one_pass(df, run_id="p", with_stats=True)
    .write.format("noop").mode("overwrite").save(),
    "uniq_id": lambda: id_ops.duplicate_values(df, ["image_id"])
    .write.format("noop").mode("overwrite").save(),
    "uniq_phash": lambda: id_ops.duplicate_values(df, ["phash"], salt_partitions=16)
    .write.format("noop").mode("overwrite").save(),
    "psi": lambda: drift_ops.psi(df, "w", "part", bins=10)
    .write.format("noop").mode("overwrite").save(),
}}
timings = {{}}
for name, job in jobs.items():
    job()  # warm-up
    best = None
    for _ in range(2):
        t0 = time.time()
        job()
        sec = time.time() - t0
        best = sec if best is None else min(best, sec)
    timings[name] = round(best, 3)
print("RESULT " + json.dumps({{"cores": cores, "timings": timings}}))
"""


def run(cores: int, n: int, n_parts: int) -> dict:
    code = CHILD.format(repo=str(REPO), cores=cores, n=n, n_parts=n_parts)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(REPO), timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
    raise RuntimeError(f"no RESULT from cores={cores}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_parts = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    r_lo = run(lo, n, n_parts)
    r_hi = run(hi, n, n_parts)
    report = {}
    for k in r_lo["timings"]:
        t_lo, t_hi = r_lo["timings"][k], r_hi["timings"][k]
        report[k] = {
            "lo_sec": t_lo, "hi_sec": t_hi,
            "eff": round(t_lo / (4 * t_hi), 3),
        }
    print(json.dumps({"n": n, "lo": lo, "hi": hi, "n_parts": n_parts,
                      "jobs": report}, indent=2))


if __name__ == "__main__":
    main()
