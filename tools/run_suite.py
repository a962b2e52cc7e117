"""Crash-isolating test runner: one pytest process per test file, with
retry on abnormal termination.

Why: this host's XLA:CPU compiler segfaults sporadically (~once per
50-150 test compilations, observed inside backend_compile_and_load and
the compilation cache read/write paths across different sessions/hosts —
a fleet/VM-migration issue, not a repo bug; the persistent CPU cache is
already disabled in goicp_tpu/__init__.py for the same reason).  A
single `pytest tests/` process dies with it; per-file processes confine
the blast radius and a retry almost always passes.

  python tools/run_suite.py [-m slow] [extra pytest args...]
"""

import glob
import os
import subprocess
import sys
import time


def main() -> int:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(here, "tests", "test_*.py")))
    extra = sys.argv[1:]
    t0 = time.time()
    failed: list[str] = []
    passed = 0
    for f in files:
        rel = os.path.relpath(f, here)
        for attempt in range(3):
            r = subprocess.run(
                [sys.executable, "-m", "pytest", rel, "-q", *extra],
                cwd=here)
            if r.returncode in (0, 5):        # 5 = no tests collected
                passed += 1
                break
            if r.returncode < 0 or r.returncode in (134, 139):
                print(f"[run_suite] {rel} died with {r.returncode} "
                      f"(host XLA:CPU segfault?) — retry "
                      f"{attempt + 1}/2", flush=True)
                continue
            failed.append(rel)                # real test failure
            break
        else:
            failed.append(rel + " (crashed 3x)")
    wall = time.time() - t0
    print(f"[run_suite] {passed}/{len(files)} files passed in {wall:.0f}s"
          + (f"; FAILED: {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
