"""Outer rotation BnB: host-coordinated batched search.

Reference: GoICP::OuterBnB (jly_goicp.cpp:582-876) — best-first priority
queue over rotation subcubes; per popped cube: Rodrigues, rotate the cloud,
InnerBnB twice (ub with zero rotation uncertainty, lb with maxRotDis), ICP
on improvement, prune the queue.

TPU-first re-design: the host keeps the rotation frontier (a cheap heap) and
pops `rot_batch` cubes at once; their 8-fold expansions become L =
8*rot_batch lanes evaluated in ONE device program per pass (rotate-all +
lane-batched inner BnB, see search/inner.py).  Improvements are then adopted
in ascending-ub order with ICP refinement between adoptions — the batched
equivalent of the reference's sequential adopt-then-ICP (jly_goicp.cpp:
771-854) with identical epsilon-optimality semantics.
"""

from __future__ import annotations

import dataclasses
import functools
import heapq
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from goicp_tpu.bounds.error import (Score, bnb_incompatibility_count,
                                    icp_chem_terms, initial_error,
                                    score_transform)
from goicp_tpu.config import GoICPConfig
from goicp_tpu.geom.rotation import rodrigues
from goicp_tpu.icp.icp import icp_run
from goicp_tpu.pipeline.prepare import PairData
from goicp_tpu.search.inner import inner_bnb

SQRT3 = math.sqrt(3.0)


@dataclasses.dataclass
class RegistrationResult:
    error: float
    R: np.ndarray           # (3,3) f64
    t: np.ndarray           # (3,) f64
    optComp: int            # incompatibility count of the optimum
    compatibilities: int    # Nd - optComp (the reference's output line)
    geom_error: float
    incomp_error: float
    fpfh_error: float
    last_icp: bool
    time_s: float
    outer_steps: int
    bound_evals: int
    icp_runs: int
    gap: float              # optError - min remaining lb (<= SSEThresh)
    converged: bool


@functools.partial(jax.jit, static_argnames=())
def _rotate_lanes(data: jnp.ndarray, centers: jnp.ndarray):
    R = rodrigues(centers)                              # (L,3,3)
    pts = jnp.einsum("lij,nj->lni", R, data,
                     precision=jax.lax.Precision.HIGHEST)
    return R, pts


def register(pair: PairData, cfg: GoICPConfig, verbose: bool = False
             ) -> RegistrationResult:
    """Full Go-ICP global registration of pair.data onto pair.model."""
    t0 = time.time()
    log = print if verbose else (lambda *a, **k: None)
    sse_thresh = cfg.MSEThresh * pair.inlier_num
    nd = pair.n_data

    # ---- initial incumbent at identity + worst-case chem seeds ----
    opt_error = float(initial_error(pair, cfg))
    opt_R = np.eye(3)
    opt_t = np.zeros(3)
    opt_comp = 0
    geom_err = opt_error
    incomp_err = 0.0
    fpfh_err = 0.0
    last_icp = False
    icp_runs = 0
    log(f"Error*: {opt_error:.6g} (Init)")

    def run_icp(R0, t0_):
        nonlocal icp_runs
        icp_runs += 1
        res = icp_run(pair.data, pair.model,
                      jnp.asarray(R0, jnp.float32),
                      jnp.asarray(t0_, jnp.float32),
                      inlier_num=pair.inlier_num,
                      max_iter=cfg.icp_max_iter, err_diff=cfg.err_diff)
        sc = score_transform(pair, cfg, res.R, res.t, res.nn_idx)
        return res, sc

    # ---- initial ICP from identity (jly_goicp.cpp:629-661) ----
    res, sc = run_icp(opt_R, opt_t)
    if float(sc.error) < opt_error:
        opt_error = float(sc.error)
        opt_R = np.asarray(res.R, np.float64)
        opt_t = np.asarray(res.t, np.float64)
        *_, icp_incomp = (icp_chem_terms(pair, cfg, res.nn_idx))
        opt_comp = int(icp_incomp)
        geom_err = float(sc.geom)
        incomp_err = float(sc.incomp_term + sc.nbr_term)
        fpfh_err = float(sc.fpfh_term)
        last_icp = True
        log(f"Error*: {opt_error:.6g} (ICP init), comp {nd - opt_comp}")

    # ---- rotation frontier (host heap of (lb, counter, node)) ----
    heap: list = []
    counter = 0

    def push(lb, ub, a, b, c, w, level):
        nonlocal counter
        heapq.heappush(heap, (lb, counter, (a, b, c, w, level, ub)))
        counter += 1

    push(0.0, np.inf, cfg.rotMinX, cfg.rotMinY, cfg.rotMinZ, cfg.rotWidth, 0)

    L = cfg.rot_batch * 8
    outer_steps = 0
    bound_evals = 0
    converged = False
    min_lb_seen = 0.0

    while heap and outer_steps < cfg.max_outer_steps:
        # ---- pop a batch of rotation cubes ----
        parents = []
        while heap and len(parents) < cfg.rot_batch:
            lb, _, node = heapq.heappop(heap)
            if lb >= opt_error:
                continue  # stale (pruned)
            if opt_error - lb <= sse_thresh:
                # min-lb node within threshold -> all remaining are too
                heap.clear()
                converged = True
                min_lb_seen = lb
                break
            parents.append((lb, node))
        if converged or not parents:
            if not converged and not heap and not parents:
                converged = True  # frontier exhausted
            break
        outer_steps += 1
        min_lb_seen = parents[0][0]

        # ---- expand 8 children per parent, pi-ball filter ----
        centers = np.zeros((L, 3), np.float32)
        widths = np.zeros((L,), np.float32)
        active = np.zeros((L,), bool)
        child_nodes = np.zeros((L, 5), np.float64)  # a,b,c,w,level
        for p, (_, (a, b, c, w, level, _ub)) in enumerate(parents):
            cw = w / 2.0
            for j in range(8):
                lane = p * 8 + j
                ca = a + (j & 1) * cw
                cb = b + ((j >> 1) & 1) * cw
                cc = c + ((j >> 2) & 1) * cw
                v = np.array([ca + cw / 2, cb + cw / 2, cc + cw / 2])
                child_nodes[lane] = (ca, cb, cc, cw, level + 1)
                if np.linalg.norm(v) - SQRT3 * cw / 2 > math.pi:
                    continue  # outside the pi-ball (jly_goicp.cpp:723-726)
                centers[lane] = v
                widths[lane] = cw
                active[lane] = True

        R_lanes, pts_rot = _rotate_lanes(pair.data, jnp.asarray(centers))

        # ---- rotation upper bounds (zero rotation uncertainty) ----
        res_ub = inner_bnb(pair, cfg, pts_rot, jnp.asarray(widths),
                           jnp.asarray(active), jnp.float32(opt_error),
                           with_rot_uncertainty=False)
        bound_evals += int(res_ub.evals)
        ubs = np.asarray(res_ub.best_err, np.float64)
        ubs[~active] = np.inf
        best_nodes = np.asarray(res_ub.best_node, np.float64)
        ub_terms = np.asarray(res_ub.ub_terms, np.float64)
        R_lanes_np = np.asarray(R_lanes, np.float64)

        # ---- adopt improvements in ascending-ub order, ICP after each ----
        for lane in np.argsort(ubs):
            if ubs[lane] >= opt_error:
                break
            opt_error = float(ubs[lane])
            opt_R = R_lanes_np[lane]
            tn = best_nodes[lane]
            opt_t = tn[:3] + tn[3] / 2.0
            geom_err, ic, fp = ub_terms[lane]
            incomp_err, fpfh_err = float(ic), float(fp)
            opt_comp = int(bnb_incompatibility_count(
                pair, cfg, jnp.asarray(opt_R, jnp.float32),
                jnp.asarray(opt_t, jnp.float32)))
            last_icp = False
            log(f"Error*: {opt_error:.6g} (BNB), comp {nd - opt_comp}")

            res, sc = run_icp(opt_R, opt_t)
            if float(sc.error) < opt_error:
                opt_error = float(sc.error)
                opt_R = np.asarray(res.R, np.float64)
                opt_t = np.asarray(res.t, np.float64)
                *_, icp_incomp = icp_chem_terms(pair, cfg, res.nn_idx)
                opt_comp = int(icp_incomp)
                geom_err = float(sc.geom)
                incomp_err = float(sc.incomp_term + sc.nbr_term)
                fpfh_err = float(sc.fpfh_term)
                last_icp = True
                log(f"Error*: {opt_error:.6g} (ICP), comp {nd - opt_comp}")

        # ---- rotation lower bounds (with rotation uncertainty) ----
        res_lb = inner_bnb(pair, cfg, pts_rot, jnp.asarray(widths),
                           jnp.asarray(active), jnp.float32(opt_error),
                           with_rot_uncertainty=True)
        bound_evals += int(res_lb.evals)
        lbs = np.asarray(res_lb.lb_safe, np.float64)

        # ---- push surviving children ----
        for lane in range(L):
            if not active[lane]:
                continue
            if lbs[lane] >= opt_error:
                continue
            a, b, c, w, level = child_nodes[lane]
            push(float(lbs[lane]), float(ubs[lane]), a, b, c, w, int(level))

        # soft capacity control: drop the worst-lb nodes (they are the least
        # likely to matter; epsilon-optimality is tracked via the final gap)
        if len(heap) > cfg.rot_frontier_capacity:
            heap_sorted = sorted(heap)[: cfg.rot_frontier_capacity]
            heap.clear()
            heap.extend(heap_sorted)
            heapq.heapify(heap)

    if not heap and not converged:
        converged = True  # frontier exhausted ("Rotation Queue Empty")
    remaining_lb = min((lb for lb, _, _ in heap), default=opt_error)
    gap = max(0.0, opt_error - min(remaining_lb, opt_error)) if heap \
        else max(0.0, min(opt_error - min_lb_seen, sse_thresh))
    return RegistrationResult(
        error=opt_error, R=opt_R, t=opt_t, optComp=opt_comp,
        compatibilities=nd - opt_comp, geom_error=geom_err,
        incomp_error=incomp_err, fpfh_error=fpfh_err, last_icp=last_icp,
        time_s=time.time() - t0, outer_steps=outer_steps,
        bound_evals=bound_evals, icp_runs=icp_runs, gap=gap,
        converged=converged)
