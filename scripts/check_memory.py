"""Memory-profile harness — the analog of the reference's
``tests/check_memory.py`` (:30-141: 8 scenarios, lazy vs eager
validate/decode memory behavior).

Scenarios (driver-process peak RSS, MB):

1. eager    — one ``validate()`` over the whole table
2. one_pass — ``validate_one_pass()`` (bounded output: verdict rows only)
3. batched  — checkpointed partition-batched run (the lazy-iterparse
              analog: bounded working set per batch)

Usage: python scripts/check_memory.py [n_images]
"""

from __future__ import annotations

import resource
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CHILD = r"""
import resource, sys, tempfile
sys.path.insert(0, {repo!r})
from xmlschema_spark.checkpoint import CheckpointedRun
from xmlschema_spark.engine import ValidationEngine
from xmlschema_spark.session import get_spark
from xmlschema_spark.sources.images import generate_images_df
from xmlschema_spark.sources.rules_loader import default_image_ruleset

scenario = {scenario!r}
n = {n}
spark = get_spark("mem", cores=8, shuffle_partitions=16)
df = generate_images_df(spark, n, seed=5, n_parts=16, corrupt_frac=0.02)
eng = ValidationEngine(default_image_ruleset())
if scenario == "eager":
    res = eng.validate(df, run_id="m", with_stats=True)
    res.violations.write.format("noop").mode("overwrite").save()
    res.verdicts.write.format("noop").mode("overwrite").save()
    res.stats.write.format("noop").mode("overwrite").save()
elif scenario == "one_pass":
    eng.validate_one_pass(df, run_id="m").write.format("noop").mode("overwrite").save()
elif scenario == "batched":
    with tempfile.TemporaryDirectory() as d:
        run = CheckpointedRun(eng, d, "m")
        run.run(df, batch_size=4)
        run.finish(df)
peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

# the working set lives in the JVM child, not this Python process: find
# the java child and read its peak resident set (VmHWM)
import os, glob
jvm_hwm_mb = 0.0
me = str(os.getpid())
for status in glob.glob("/proc/[0-9]*/status"):
    try:
        txt = open(status).read()
    except OSError:
        continue
    fields = dict(
        line.split(":", 1) for line in txt.splitlines() if ":" in line
    )
    if fields.get("Name", "").strip() == "java" and fields.get("PPid", "").strip() == me:
        jvm_hwm_mb = max(jvm_hwm_mb, float(fields["VmHWM"].strip().split()[0]) / 1024)
print(f"RESULT {{scenario}} jvm_peak_rss_mb={{jvm_hwm_mb:.0f}} pydriver_peak_rss_mb={{peak_mb:.0f}}")
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    for scenario in ("eager", "one_pass", "batched"):
        code = CHILD.format(repo=str(REPO), scenario=scenario, n=n)
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            cwd=str(REPO), timeout=1200,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                print(line[len("RESULT "):])
                break
        else:
            sys.stderr.write(out.stderr[-1500:] + "\n")
            print(f"{scenario}: FAILED")


if __name__ == "__main__":
    main()
