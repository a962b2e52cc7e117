"""Benchmark driver: BO1 registration throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ binary registers BO1 pair 1 (2x86_3 -> 1eq2_6,
238 data points, DT 20^3, MSEThresh 0.01, regularization 0.0005,
ponderation 1) in 0.703125 s single-core (output/similar1.txt:1) =>
1.4222 pairs/s.  We measure a BATCH of 16 same-bucket registrations run
concurrently by the batched engine (pipeline/batch_sweep.py), wall-clocked
after a warm-up so XLA compiles are excluded (the 383-pair sweep amortizes
them the same way); correctness is asserted against the golden
error/compat count inside the measurement.

The measurement runs in a child process with a watchdog: the axon TPU
tunnel in this environment can stall mid-stream, in which case we retry,
and finally fall back to the CPU backend (reported honestly via the same
metric; the child records which platform ran).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

BASELINE_PAIRS_PER_S = 1.0 / 0.703125
HERE = os.path.dirname(os.path.abspath(__file__))


def _run_child(env_overrides, timeout_s):
    out = tempfile.NamedTemporaryFile(suffix=".json", delete=False)
    out.close()
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_overrides)
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "goicp_tpu.bench.measure", out.name],
            env=env, timeout=timeout_s, capture_output=True, cwd=HERE)
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr.decode()[-2000:] + "\n")
        return None
    try:
        with open(out.name) as fh:
            return json.load(fh)
    except Exception:
        return None
    finally:
        try:
            os.unlink(out.name)
        except OSError:
            pass


def main():
    result = None
    # TPU attempts (the axon claim can need a cool-down after a stall)
    for attempt in range(2):
        result = _run_child({}, timeout_s=1500)
        if result is not None:
            break
        time.sleep(180 if attempt == 0 else 0)
    if result is None:
        # CPU fallback: disable the axon sitecustomize entirely
        result = _run_child({"PALLAS_AXON_POOL_IPS": "",
                             "JAX_PLATFORMS": "cpu"}, timeout_s=2400)
    if result is None:
        print(json.dumps({"metric": "bo1_registration_throughput_1chip",
                          "value": 0.0, "unit": "pairs/s",
                          "vs_baseline": 0.0}))
        return

    pairs_per_s = result["pairs_per_s"]
    print(json.dumps({
        "metric": "bo1_registration_throughput_1chip",
        "value": round(pairs_per_s, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
