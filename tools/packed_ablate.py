"""Ablate the packed iteration: time one 512-iteration chunk with pieces
disabled to find where the per-iteration milliseconds go.

  timeout 560 env PYTHONPATH=/root/repo:/root/.axon_site \
      python tools/packed_ablate.py
"""

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

REF = "/root/reference"


def main():
    from goicp_tpu.bench.measure import build_batch
    from goicp_tpu.config import GoICPConfig
    from goicp_tpu.dist.mesh import stack_pairs
    from goicp_tpu.search import packed_stream as ps

    base = GoICPConfig.from_file(f"{REF}/config.txt")
    cfg = dataclasses.replace(base, rot_batch=1, trans_capacity=128,
                              trans_pop=8, icp_seeds=4, margin_frac=0.9,
                              packed_slots=8, packed_trans_every=8)
    pairs = build_batch(cfg, 8)
    pb = stack_pairs(pairs)
    W = 8
    L = cfg.rot_batch * 8
    S = cfg.packed_slots
    size = pairs[0].grid.geom.size

    state0 = jax.jit(lambda p: ps.packed_init(p, cfg))(pb)

    def chunk(mode):
        @jax.jit
        def run(state, steps):
            tabs = ps._pair_tables(pb, cfg)
            TE = cfg.packed_trans_every

            def body(carry):
                s, g = carry
                live_pair = ~s["converged"] & (s["it"] < cfg.max_outer_steps)
                ss0 = s["ss"]
                lane_live0 = (ss0[:, ps._DONE] == 0) \
                    & (ss0[:, ps._IT] < cfg.inner_max_iters) \
                    & jnp.repeat(live_pair, L)
                check = (g % TE == 0) | (jnp.sum(lane_live0) < S)
                need_trans = ps._pair_inner_done(s, cfg, W, L) \
                    & live_pair & check
                if mode in ("full", "trans_only"):
                    s = jax.lax.cond(
                        jnp.any(need_trans),
                        lambda st: ps._transition(pb, cfg, st, need_trans,
                                                  W, L),
                        lambda st: st, s)
                if mode in ("full", "iter_only", "iter_nokernel",
                            "gather_only"):
                    ss = s["ss"]
                    live_pair2 = ~s["converged"] \
                        & (s["it"] < cfg.max_outer_steps)
                    lane_live = (ss[:, ps._DONE] == 0) \
                        & (ss[:, ps._IT] < cfg.inner_max_iters) \
                        & jnp.repeat(live_pair2, L)
                    key = jnp.where(lane_live, ss[:, ps._IT],
                                    jnp.float32(2 ** 30))
                    slots = jnp.argsort(key)[:S]
                    spair = slots // L
                    live = lane_live[slots]
                    sn_s = s["sn"][slots]
                    ss_s = ss[slots]
                    pm_s = s["pm"][slots]
                    if mode in ("full", "iter_only"):
                        sn_n, ss_n = ps._packed_iter(
                            cfg, size, sn_s, ss_s, pm_s, tabs["tab"][spair],
                            tabs["pside"][spair], tabs["cons"][spair],
                            tabs["sse"][spair], live)
                    elif mode == "iter_nokernel":
                        # same gathers/scatters + a fake per-slot update
                        sn_n = sn_s * 1.0000001
                        ss_n = ss_s.at[:, ps._IT].add(
                            jnp.where(live, 1.0, 0.0))
                    else:
                        sn_n, ss_n = sn_s, ss_s
                    s = dict(s, sn=s["sn"].at[slots].set(sn_n),
                             ss=ss.at[slots].set(ss_n))
                return (s, g + 1)

            def cond(carry):
                s, g = carry
                return g < steps

            s, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
            return s

        return run

    for mode in ("full", "iter_only", "trans_only", "iter_nokernel",
                 "gather_only"):
        run = chunk(mode)
        s = jax.device_get(run(state0, jnp.int32(512)))   # warm
        t0 = time.time()
        s = jax.device_get(run(state0, jnp.int32(512)))
        wall = time.time() - t0
        print(f"{mode:14s} 512 iters: {wall:7.3f} s  "
              f"({wall/512*1e6:8.1f} us/iter)", flush=True)


if __name__ == "__main__":
    main()
