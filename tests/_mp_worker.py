"""Worker for the 2-process jax.distributed CPU test (test_multiprocess.py).

Each process owns 4 virtual CPU devices; the 8-device global mesh's `data`
axis spans both processes, so register_device_batch's pair DP exercises the
real cross-process (DCN-analogue) code path: global arrays built from
host-local values, SPMD execution, replicated scalar reductions.

Usage: python _mp_worker.py <coordinator_port> <process_id> <num_processes>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=4"])

import numpy as np  # noqa: E402


def main(port: int, pid: int, nproc: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer spellings; the default usually works

    from goicp_tpu.dist.mesh import init_distributed
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.dist.mesh import make_mesh
    from goicp_tpu.pipeline.prepare import prepare_pair
    from goicp_tpu.search.device_engine import register_device_batch

    cfg = GoICPConfig(MSEThresh=0.001, regularization=0.0, ponderation=0,
                      distTransSize=10, rot_batch=1, trans_capacity=32,
                      trans_pop=4, inner_max_iters=8, max_outer_steps=200,
                      device_rot_capacity=256)

    def tiny_pair(seed, n=24):
        rng = np.random.default_rng(seed)
        model = rng.uniform(-0.6, 0.6, size=(n, 3))
        data = rng.uniform(-0.6, 0.6, size=(n, 3))
        props = rng.integers(0, 9, size=n).astype(np.int32)
        return prepare_pair(data, model, props, props, cfg,
                            pad_cells=n, pad_points=8)

    # identical pair list on every process (host-replicated input)
    pairs = [tiny_pair(s) for s in range(8)]
    mesh = make_mesh(n_data=4 * nproc, n_search=1)
    out = register_device_batch(pairs, cfg, mesh=mesh)

    # cross-process result: reduce to replicated scalars via jit
    n_fin = int(jax.jit(lambda e: jnp.sum(jnp.isfinite(e)))(out.error))
    max_err = float(jax.jit(jnp.max)(out.error))
    assert n_fin == 8, n_fin
    assert np.isfinite(max_err)
    print(f"MP_OK pid={pid} finite={n_fin} max_err={max_err:.5f}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
