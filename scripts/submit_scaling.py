"""Packaged two-parallelism scaling proof via ``spark-submit --py-files``.

The north rule's deployment clause says the engine "ships as a
spark-submit --py-files job proven on clusters of N and 4N executors".
``scripts/scaling_bench.py`` proves the SCALING with persistent
in-process JVMs (dense alternating samples — see its docstring for the
shared-VM drift rationale); this harness proves the PACKAGING carries the
same scaling: it zips the package, launches one real ``spark-submit
--master local[N] --py-files xmlschema_spark.zip`` job per level from an
empty scratch directory (imports resolve ONLY from the zip), and runs the
byte-identical suite (``xmlschema_spark.benchsuite``) under the same
alternating-sample protocol.

Differences from the in-process harness, both forced by spark-submit:
- pinning is ``taskset -c`` on the launcher (the JVM starts before any
  user Python could call ``sched_setaffinity``); the mask is inherited
  identically.
- ``--driver-memory`` is a CLI flag (the JVM exists before
  ``SparkSession.builder`` confs are read).

Usage: python scripts/submit_scaling.py [--quick]
Writes BENCH_SUBMIT.json and re-renders BENCH.md (the submit section is
picked up by scaling_bench.render_md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from datetime import date
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def find_spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    home = os.environ.get("SPARK_HOME")
    if home and (Path(home) / "bin" / "spark-submit").exists():
        return str(Path(home) / "bin" / "spark-submit")
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    raise RuntimeError("spark-submit not found")


class SubmitLevel:
    """One parallelism level = one live spark-submit job, sampled over
    stdin/stdout exactly like scaling_bench.Level."""

    def __init__(self, cores: int, n: int, zip_path: Path, scratch: Path,
                 min_side: int, max_side: int, decode_half: bool,
                 task_cpus: int = 1):
        self.cores, self.n = cores, n
        self.errlog = open(scratch / f"submit_{cores}.log", "w")
        # commands travel via an appended file the child polls:
        # spark-submit's PythonRunner pipes the Python driver's stdout up
        # to the JVM's stdout but does NOT forward JVM stdin down to the
        # driver, so a stdin protocol deadlocks under spark-submit.
        self.cmd_path = scratch / f"cmd_{cores}.txt"
        self.cmd_path.write_text("")
        env = dict(os.environ)
        # one BLAS thread per worker (same rule get_spark applies): the
        # orchestrator sets it in the env so driver-side numpy obeys too.
        for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
            env.setdefault(var, "1")
        cmd = [
            "taskset", "-c", f"0-{cores - 1}",
            find_spark_submit(),
            "--master", f"local[{cores}]",
            "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "48g"),
            "--py-files", str(zip_path),
            str(REPO / "scripts" / "submit_child.py"),
            "--cores", str(cores), "--n", str(n),
            "--min-side", str(min_side), "--max-side", str(max_side),
            "--cmd-file", str(self.cmd_path),
        ]
        if decode_half:
            cmd.append("--decode-half")
        if task_cpus > 1:
            cmd += ["--task-cpus", str(task_cpus)]
        self.proc = subprocess.Popen(
            cmd, cwd=str(scratch), env=env, text=True, bufsize=1,
            stdin=subprocess.DEVNULL, stdout=subprocess.PIPE, stderr=self.errlog,
        )

    def _send(self, cmd: str) -> None:
        with self.cmd_path.open("a") as f:
            f.write(cmd + "\n")

    def _read_until(self, prefix: str, timeout_s: float) -> str:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            line = self.proc.stdout.readline()
            if not line:
                raise RuntimeError(f"cores={self.cores}: spark-submit died "
                                   f"(see {self.errlog.name})")
            if line.startswith(prefix):
                return line.strip()
        raise RuntimeError(f"cores={self.cores}: timeout waiting for {prefix}")

    def wait_ready(self, timeout_s: float = 1800) -> None:
        self._read_until("READY", timeout_s)

    def sample(self, timeout_s: float = 1800) -> float:
        self._send("RUN")
        sec = float(self._read_until("SAMPLE", timeout_s).split()[1])
        return round(self.n / sec, 1)

    def close(self) -> None:
        try:
            self._send("EXIT")
            self.proc.wait(timeout=60)
        except Exception:
            self.proc.kill()
        self.errlog.close()


def main() -> None:
    quick = "--quick" in sys.argv
    n = 3000 if quick else int(os.environ.get("SPARK_GRAFT_SCALE_IMAGES", "250000"))
    samples = 2 if quick else int(os.environ.get("SPARK_GRAFT_SUBMIT_SAMPLES", "4"))
    n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
    n_hi = 4 * n_lo
    min_side, max_side = 64, 128
    # footprint-matched production sizing (global task.cpus=2: slot = JVM
    # task thread + Arrow Python worker) — the config that clears >=0.8
    # raw in the in-process harness; override to the stage-scoped variant
    # with SPARK_GRAFT_SUBMIT_SIZING=stage
    sizing = os.environ.get("SPARK_GRAFT_SUBMIT_SIZING", "task_cpus2")
    task_cpus, decode_half = (1, True) if sizing == "stage" else (2, False)

    from xmlschema_spark.session import package_zip

    zip_path = package_zip()
    scratch = Path(tempfile.mkdtemp(prefix="submit_scaling_"))
    # the scratch cwd holds NOTHING importable: the only route to the
    # package is the --py-files zip, which is the point of the proof.
    lo = SubmitLevel(n_lo, n, zip_path, scratch, min_side, max_side,
                     decode_half, task_cpus)
    hi = SubmitLevel(n_hi, n, zip_path, scratch, min_side, max_side,
                     decode_half, task_cpus)
    try:
        lo.wait_ready()
        hi.wait_ready()
        lo_runs, hi_runs = [], []
        for _ in range(samples):
            lo_runs.append(lo.sample())
            hi_runs.append(hi.sample())
    finally:
        lo.close()
        hi.close()

    best_lo, best_hi = max(lo_runs), max(hi_runs)
    pair_effs = sorted(round(h / (4 * l), 3) for l, h in zip(lo_runs, hi_runs))
    res = {
        "n": n, "samples": samples, "n_lo": n_lo, "n_hi": n_hi,
        "min_side": min_side, "max_side": max_side,
        "sizing": ("stage-scoped decode coalesce(cores/2)" if sizing == "stage"
                   else "footprint-matched global spark.task.cpus=2"),
        "zip": zip_path.name, "scratch": str(scratch),
        "r_lo": {"cores": n_lo, "sec": round(n / best_lo, 3),
                 "images_per_sec": best_lo},
        "r_hi": {"cores": n_hi, "sec": round(n / best_hi, 3),
                 "images_per_sec": best_hi},
        "eff": round(best_hi / (4 * best_lo), 3),
        "pair_effs": pair_effs,
        "median_pair_eff": pair_effs[len(pair_effs) // 2],
        "lo_rounds": lo_runs,
        "hi_rounds": hi_runs,
        "measured": date.today().isoformat(),
    }
    (REPO / "BENCH_SUBMIT.json").write_text(json.dumps(res, indent=1))

    # fold the section into BENCH.md via the shared renderer
    from scaling_bench import render_md

    scaling = REPO / "BENCH_SCALING.json"
    if scaling.exists():
        (REPO / "BENCH.md").write_text(
            render_md(json.loads(scaling.read_text())))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
