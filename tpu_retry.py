"""Helper: initialize the axon TPU backend with retries.

The axon relay occasionally refuses a new claim for a minute or two after a
previous process exits (stale grant).  Import this before jax-heavy work on
the real chip; it polls jax.devices() until the backend registers.
"""
import time


def wait_for_tpu(max_wait_s: float = 300.0, poll_s: float = 15.0):
    import jax
    deadline = time.time() + max_wait_s
    last = None
    while time.time() < deadline:
        try:
            devs = jax.devices()
            return devs
        except RuntimeError as e:  # backend not registered (stale claim)
            last = e
            # the axon PJRT plugin registers at interpreter start; if it
            # failed, only a fresh interpreter can retry -> re-exec
            import os
            import sys
            time.sleep(poll_s)
            os.execv(sys.executable, [sys.executable] + sys.argv)
    raise RuntimeError(f"TPU not available after {max_wait_s}s: {last}")
