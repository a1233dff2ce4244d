"""Run the numerics-critical test subset on the REAL TPU and record the
result artifact (VERDICT r3 item 4).

The full suite runs on an 8-virtual-device CPU mesh in CI
(tests/conftest.py); TPU-only numerics regressions (e.g. in a bf16
weighted-Gram path or a Pallas kernel) would not be caught there.  This
driver re-runs the ``tpu_ok``-marked subset with the ambient accelerator
backend (RCPPML_TPU_TESTS=1) and writes machine-readable counts to
``TPU_SUITE_r{N}.json`` next to the parity-gate artifacts.

Model: the reference gates GPU tests per-test (test_gpu_accuracy.R:24)
and runs them on real nodes via tools/run_gpu_tests.sbatch; here one
command does both.

Usage:  python tools/run_tpu_suite.py [--round N] [--out FILE]
        (must be the ONLY process holding the TPU tunnel)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="round number for the artifact name")
    ap.add_argument("--out", default=None, help="explicit output path")
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args()

    env = dict(os.environ)
    env["RCPPML_TPU_TESTS"] = "1"
    env.pop("JAX_PLATFORMS", None)   # keep the ambient accelerator

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests", "-m", "tpu_ok",
         "-q", "--no-header", "-p", "no:cacheprovider"],
        cwd=REPO, env=env, capture_output=True, text=True,
        timeout=args.timeout)
    wall = time.time() - t0
    tail = proc.stdout.strip().split("\n")[-1] if proc.stdout else ""

    counts = {}
    for n, what in re.findall(r"(\d+) (passed|failed|skipped|error|errors)",
                              tail):
        counts[what.rstrip("s") if what.startswith("error") else what] = \
            int(n)

    import jax  # noqa: deferred so pytest child owns the tunnel first
    record = {
        "suite": "tpu_ok numerics-critical subset",
        "backend": jax.devices()[0].device_kind,
        "counts": counts,
        "wall_seconds": round(wall, 1),
        "exit_code": proc.returncode,
        "summary_line": tail,
    }

    out = args.out or os.path.join(
        REPO, f"TPU_SUITE_r{args.round:02d}.json" if args.round
        else "TPU_SUITE.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))
    if proc.returncode != 0:
        print(proc.stdout[-4000:], file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
