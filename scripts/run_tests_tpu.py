"""Run the compiled-TPU test tier and record it as a round artifact.

The tests_tpu/ tier auto-skips off-TPU, so "it passed" was previously
unauditable after the fact (round-3 verdict weak #4).  This runner executes
the tier on the attached chip and writes TESTS_TPU_<tag>.json (pass/fail/
skip counts, duration, per-test outcomes) next to the BENCH artifacts.

    python scripts/run_tests_tpu.py           # writes TESTS_TPU_r04.json
    TESTS_TPU_TAG=r05 python scripts/run_tests_tpu.py
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def main():
    tag = os.environ.get("TESTS_TPU_TAG", "r04")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests_tpu/", "-q", "-rA",
         "--tb=short"],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    dur = time.time() - t0
    out = proc.stdout
    sys.stdout.write(out[-4000:])

    counts = {}
    for key in ("passed", "failed", "error", "skipped"):
        m = re.search(rf"(\d+) {key}", out)
        counts[key] = int(m.group(1)) if m else 0
    per_test = re.findall(r"^(PASSED|FAILED|SKIPPED|ERROR) ([^\s]+)", out, re.M)

    record = {
        "tier": "tests_tpu (compiled Pallas kernels on hardware)",
        "backend_cmdline_default": "axon TPU v5e via tunnel",
        "returncode": proc.returncode,
        "duration_s": round(dur, 1),
        **counts,
        "tests": [{"outcome": o.lower(), "test": t} for o, t in per_test],
    }
    path = os.path.join(REPO, f"TESTS_TPU_{tag}.json")
    with open(path, "w") as fh:
        json.dump(record, fh, indent=2)
    print(f"\nwrote {path}: {counts}")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
