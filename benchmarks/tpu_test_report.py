"""Run the TPU-only suites on the attached chip and write
benchmarks/tpu_test_report.json — the committed on-chip evidence that the
production (Pallas) render backend passed its parity + golden tests this
round (the counterpart of running with Vulkan validation layers on,
engine/include/engine/graphics/vulkan/Vulkan.h:18-27).

Usage: python benchmarks/tpu_test_report.py [--regen]
  --regen  first regenerate tests/goldens/tpu256 on the chip
"""

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def run(cmd, env=None, timeout=7200):
    t0 = time.time()
    r = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, env=env, timeout=timeout
    )
    return r, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()

    report = {"generated_unix": int(time.time())}

    probe, _ = run([sys.executable, "-c",
                    "import jax; print([str(d) for d in jax.devices()])"])
    report["devices"] = probe.stdout.strip().splitlines()[-1] if probe.stdout else "?"

    if args.regen:
        r, dt = run([sys.executable, "benchmarks/render_goldens.py", "tpu"])
        report["golden_regen"] = {"rc": r.returncode, "seconds": round(dt, 1),
                                  "tail": r.stdout[-600:]}

    env = dict(os.environ, CGE_TPU_TESTS="1")
    # test_tpu_parity: Pallas-vs-XLA parity + the CPU-vs-TPU trajectory
    # test; test_goldens: tpu256 determinism + the cpu256 CROSS-BACKEND
    # content check (the non-circular evidence — VERDICT r4 next #2);
    # test_solver_oracle: the analytic Coulomb/restitution yardstick run
    # on the DEVICE (backend-independent physics truth — r4 next #5).
    r, dt = run([sys.executable, "-m", "pytest", "tests/test_tpu_parity.py",
                 "tests/test_goldens.py", "tests/test_solver_oracle.py",
                 "-q", "--tb=line"], env=env)
    m = re.findall(r"(\d+) (passed|failed|skipped|error)", r.stdout)
    report["pytest"] = {
        "rc": r.returncode,
        "seconds": round(dt, 1),
        "summary": {k: int(n) for n, k in m},
        "tail": r.stdout[-1500:] if r.returncode else r.stdout[-300:],
    }

    stats = REPO / "tests/goldens/tpu256/stats.json"
    if stats.exists():
        report["tpu256_golden_stats"] = json.loads(stats.read_text())

    out = REPO / "benchmarks/tpu_test_report.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({"rc": report["pytest"]["rc"],
                      "summary": report["pytest"]["summary"]}))


if __name__ == "__main__":
    main()
