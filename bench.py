"""Benchmark driver: BO1 registration throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ binary registers BO1 pair 1 (2x86_3 -> 1eq2_6,
238 data points, DT 20^3, MSEThresh 0.01, regularization 0.0005,
ponderation 1) in 0.703125 s single-core (output/similar1.txt:1) =>
1.4222 pairs/s.  The measurement (goicp_tpu/bench/measure.py) runs the
fully device-side engine on a warmed DISTINCT-pair batch of 64 (the two
real golden pairs + synthetic pairs spanning the BO1 165-306-point size
range, dynamic-count batched), with golden error/compat parity asserted
inside; both BASELINE.json metrics (pairs/s and bound-evals/s/chip) are
reported in the one JSON line.

Robustness: the axon TPU tunnel in this environment can stall for tens of
minutes on the first device interaction.  So we run a guaranteed CPU
measurement CONCURRENTLY in an axon-free child (it never touches the chip)
while the TPU child runs under a watchdog, prefer the TPU number, and print
the best available result — also on SIGTERM, so a driver-imposed timeout
still yields a valid line.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile

BASELINE_PAIRS_PER_S = 1.0 / 0.703125
HERE = os.path.dirname(os.path.abspath(__file__))

_best = None
_printed = False
_cpu_out_path = None


def _emit_and_exit(*_args):
    global _printed, _best
    if _printed:
        os._exit(0)
    _printed = True
    if _best is None and _cpu_out_path:
        # a SIGTERM may arrive while the TPU child is still running; the
        # concurrent CPU child may already have written its result
        try:
            with open(_cpu_out_path) as fh:
                _best = json.load(fh)
        except Exception:
            pass
    if _best is None:
        print(json.dumps({"metric": "bo1_registration_throughput_1chip",
                          "value": 0.0, "unit": "pairs/s",
                          "vs_baseline": 0.0}), flush=True)
    else:
        v = _best["pairs_per_s"]
        # Primary comparator: the reference C++ binary (-O3, single core,
        # THIS machine) measured on the IDENTICAL distinct-pair workload
        # (REF_BASELINE_WORKLOAD.json, produced by
        # tools/ref_workload_baseline.py; capped pairs under-state the
        # reference's wall, so the ratio is conservative).  Falls back to
        # the checked-in pair-1 artifact rate when the file is absent or
        # the measurement is the single-pair CPU fallback.
        base = BASELINE_PAIRS_PER_S
        base_kind = "pair1_artifact_0.703s"
        # the same-workload baseline only applies to the real distinct-pair
        # TPU measurement; the CPU fallback is pair-1-only (ADVICE r2)
        if _best.get("distinct_pairs", 1) > 1 \
                and _best.get("platform") != "cpu":
            try:
                with open(os.path.join(HERE,
                                       "REF_BASELINE_WORKLOAD.json")) as fh:
                    ref = json.load(fh)
                if not ref.get("partial") and ref.get("total_wall_s"):
                    base = ref["n_pairs"] / ref["total_wall_s"]
                    base_kind = "ref_O3_same_workload_same_machine"
            except Exception:
                pass
        line = {
            "metric": "bo1_registration_throughput_1chip",
            "value": round(v, 4),
            "unit": "pairs/s",
            "vs_baseline": round(v / base, 3),
            "baseline": base_kind,
            "vs_pair1_artifact": round(v / BASELINE_PAIRS_PER_S, 3),
            # second BASELINE.json metric: translation-node bound
            # evaluations per second on one chip (distinct-pair batch)
            "bound_evals_per_s": round(_best.get("bound_evals_per_s", 0.0)),
            "distinct_pairs": _best.get("distinct_pairs", 1),
            "platform": _best.get("platform", "unknown"),
        }
        # trimmed dissimilar-style workload (BASELINE.json config 4) with
        # its own same-machine reference comparator when available
        if _best.get("trimmed_pairs_per_s"):
            tv = _best["trimmed_pairs_per_s"]
            line["trimmed_pairs_per_s"] = round(tv, 4)
            try:
                with open(os.path.join(HERE,
                                       "REF_BASELINE_TRIMMED.json")) as fh:
                    tref = json.load(fh)
                if not tref.get("partial") and tref.get("total_wall_s"):
                    tbase = tref["n_pairs"] / tref["total_wall_s"]
                    line["trimmed_vs_baseline"] = round(tv / tbase, 3)
            except Exception:
                pass
        print(json.dumps(line), flush=True)
    os._exit(0)


def _spawn_child(env_overrides, nice=0):
    out = tempfile.NamedTemporaryFile(suffix=".json", delete=False)
    out.close()
    env = dict(os.environ)
    env["PYTHONPATH"] = HERE + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_overrides)
    cmd = [sys.executable, "-m", "goicp_tpu.bench.measure", out.name]
    if nice:
        cmd = ["nice", "-n", str(nice)] + cmd
    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        cwd=HERE)
    return proc, out.name


def _collect(proc, out_path, timeout_s, kill_on_timeout=True):
    try:
        _, err = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        if kill_on_timeout:
            proc.kill()
        return None
    if proc.returncode != 0:
        sys.stderr.write((err or b"").decode()[-2000:] + "\n")
        return None
    try:
        with open(out_path) as fh:
            return json.load(fh)
    except Exception:
        return None
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def main():
    global _best
    signal.signal(signal.SIGTERM, _emit_and_exit)
    signal.signal(signal.SIGINT, _emit_and_exit)

    # TPU measurement first and ALONE: this host has only 2 CPU cores, and
    # a concurrently running CPU fallback starves the TPU child's
    # host-side dispatch loop (measured: ~1.8x wall inflation).  The CPU
    # fallback (axon sitecustomize disabled, never touches the chip) only
    # starts if the TPU child produces nothing within its grace window —
    # the tunnel-stall failure mode this bench guards against.
    global _cpu_out_path
    tpu_proc, tpu_out = _spawn_child({})
    tpu = _collect(tpu_proc, tpu_out, timeout_s=900,
                   kill_on_timeout=False)

    if tpu is not None and tpu.get("platform") != "cpu":
        _best = tpu
        _emit_and_exit()

    cpu_proc, cpu_out = _spawn_child({"PALLAS_AXON_POOL_IPS": "",
                                      "JAX_PLATFORMS": "cpu"}, nice=19)
    _cpu_out_path = cpu_out
    if tpu is None and tpu_proc.poll() is None:
        # TPU child still alive past the grace window: give it the rest of
        # the budget while the CPU fallback runs alongside
        tpu = _collect(tpu_proc, tpu_out, timeout_s=1200)
        if tpu is not None and tpu.get("platform") != "cpu":
            _best = tpu
            cpu_proc.kill()
            _emit_and_exit()

    cpu = _collect(cpu_proc, cpu_out, timeout_s=2400)
    if cpu is not None:
        _best = cpu
    _emit_and_exit()


if __name__ == "__main__":
    main()
