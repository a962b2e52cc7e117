"""Batched multi-pair registration: N pairs' BnB searches share the chip.

The reference processes one pair per process invocation (bo1_GoICP.py); even
our single-pair engine leaves most of a TPU idle on 300-point cavities.
Here up to `slots` pairs run SIMULTANEOUSLY: each outer step stacks the
active pairs' rotation-lane batches into (Pb, L, ...) tensors and runs ONE
vmapped inner-BnB program for all of them (both ub and lb passes).  When a
pair converges, its slot is refilled from the pending queue — shape-bucket
padding (pipeline/prepare.py) guarantees every pair in a group compiles to
the same program.

This is the single-chip form of pair-level data parallelism; dist/mesh.py
shards the same stacked computation over a multi-chip `data` axis.
"""

from __future__ import annotations

import functools
import math
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from goicp_tpu.bounds.error import initial_error, refine_transform
from goicp_tpu.config import GoICPConfig
from goicp_tpu.dist.mesh import stack_pairs
from goicp_tpu.pipeline.prepare import PairData
from goicp_tpu.search.outer import (RegistrationResult, SQRT3,
                                    make_frontier, step_bounds)


@functools.lru_cache(maxsize=16)
def _batched_step(cfg: GoICPConfig):
    """vmap over the pair-slot axis of the fused one-dispatch outer-step
    bound computation (search/outer.step_bounds)."""
    return jax.jit(jax.vmap(
        lambda pair, c, w, act, opt: step_bounds(pair, cfg, c, w, act, opt)))


class _SlotState:
    def __init__(self, index: int, pair: PairData, cfg: GoICPConfig):
        self.index = index
        self.pair = pair
        self.cfg = cfg
        self.t0 = time.time()
        self.frontier = make_frontier(cfg.rot_frontier_capacity)
        self.frontier.push(np.zeros(1, np.float32),
                           np.asarray([cfg.rotMinX], np.float32),
                           np.asarray([cfg.rotMinY], np.float32),
                           np.asarray([cfg.rotMinZ], np.float32),
                           np.asarray([cfg.rotWidth], np.float32),
                           np.zeros(1, np.int32),
                           np.full(1, np.inf, np.float32))
        self.opt_error = float(initial_error(pair, cfg))
        self.opt_R = np.eye(3)
        self.opt_t = np.zeros(3)
        self.opt_comp = 0
        self.geom = self.opt_error
        self.incomp = 0.0
        self.fpfh = 0.0
        self.last_icp = False
        self.outer_steps = 0
        self.bound_evals = 0
        self.icp_runs = 0
        self.min_lb_seen = 0.0
        self.converged = False
        self.done = False
        # initial ICP from identity (jly_goicp.cpp:629-661)
        self._icp_improve(np.eye(3), np.zeros(3))

    def _icp_improve(self, R0, t0_, with_bnb_count=False):
        """Fused adopt-then-ICP device call; returns the BnB-side incompat
        count when requested."""
        cfg, pair = self.cfg, self.pair
        self.icp_runs += 1
        bnb_comp, res, sc, icp_incomp = jax.device_get(refine_transform(
            pair, cfg, jnp.asarray(R0, jnp.float32),
            jnp.asarray(t0_, jnp.float32), max_iter=cfg.icp_max_iter,
            with_bnb_count=with_bnb_count))
        if float(sc.error) < self.opt_error:
            self.opt_error = float(sc.error)
            self.opt_R = np.asarray(res.R, np.float64)
            self.opt_t = np.asarray(res.t, np.float64)
            self.opt_comp = int(icp_incomp)
            self.geom = float(sc.geom)
            self.incomp = float(sc.incomp_term + sc.nbr_term)
            self.fpfh = float(sc.fpfh_term)
            self.last_icp = True
        return int(bnb_comp)

    def sse_thresh(self):
        return self.cfg.MSEThresh * self.pair.inlier_num

    def pop_and_expand(self, L):
        """Pop a rotation batch, expand children. Returns
        (centers, widths, active, child_nodes) or None when finished."""
        cfg = self.cfg
        if self.done:
            return None
        p_lb, p_a, p_b, p_c, p_w, p_level, _ = self.frontier.pop(
            cfg.rot_batch, self.opt_error)
        if len(p_lb) == 0:
            self.converged = True
            self.done = True
            return None
        if self.opt_error - p_lb[0] <= self.sse_thresh():
            self.frontier.clear()
            self.converged = True
            self.done = True
            self.min_lb_seen = float(p_lb[0])
            return None
        keep = self.opt_error - p_lb > self.sse_thresh()
        p_lb, p_a, p_b, p_c, p_w, p_level = (
            x[keep] for x in (p_lb, p_a, p_b, p_c, p_w, p_level))
        self.outer_steps += 1
        self.min_lb_seen = float(p_lb[0])

        n_par = len(p_lb)
        cw = (p_w / 2.0)[:, None]
        off = np.array([[j & 1, (j >> 1) & 1, (j >> 2) & 1]
                        for j in range(8)], np.float32)
        child_xyz = np.stack([p_a, p_b, p_c], 1)[:, None, :] \
            + off[None] * cw[..., None]
        child_ctr = child_xyz + cw[..., None] / 2.0
        n_child = n_par * 8
        centers = np.zeros((L, 3), np.float32)
        widths = np.zeros((L,), np.float32)
        active = np.zeros((L,), bool)
        child_nodes = np.zeros((L, 5), np.float64)
        centers[:n_child] = child_ctr.reshape(-1, 3)
        widths[:n_child] = np.repeat(p_w / 2.0, 8)
        child_nodes[:n_child, 0:3] = child_xyz.reshape(-1, 3)
        child_nodes[:n_child, 3] = np.repeat(p_w / 2.0, 8)
        child_nodes[:n_child, 4] = np.repeat(p_level + 1, 8)
        inside = (np.linalg.norm(centers[:n_child], axis=1)
                  - SQRT3 * widths[:n_child] / 2.0) <= math.pi
        active[:n_child] = inside
        return centers, widths, active, child_nodes

    def adopt(self, ubs, best_nodes, ub_terms, R_lanes):
        nd = self.pair.n_data
        for lane in np.argsort(ubs):
            if ubs[lane] >= self.opt_error:
                break
            self.opt_error = float(ubs[lane])
            self.opt_R = R_lanes[lane]
            tn = best_nodes[lane]
            self.opt_t = tn[:3] + tn[3] / 2.0
            self.geom, ic, fp = ub_terms[lane]
            self.incomp, self.fpfh = float(ic), float(fp)
            self.last_icp = False
            bnb_comp = self._icp_improve(self.opt_R, self.opt_t,
                                         with_bnb_count=True)
            if not self.last_icp:  # ICP did not improve: BnB count stands
                self.opt_comp = bnb_comp

    def push_children(self, child_nodes, active, lbs, ubs):
        survive = active & (lbs < self.opt_error)
        if survive.any():
            self.frontier.push(lbs[survive].astype(np.float32),
                               child_nodes[survive, 0].astype(np.float32),
                               child_nodes[survive, 1].astype(np.float32),
                               child_nodes[survive, 2].astype(np.float32),
                               child_nodes[survive, 3].astype(np.float32),
                               child_nodes[survive, 4].astype(np.int32),
                               ubs[survive].astype(np.float32))

    def result(self) -> RegistrationResult:
        if not self.converged and not len(self.frontier):
            self.converged = True
        remaining = self.frontier.min_lb if len(self.frontier) \
            else self.opt_error
        remaining = min(remaining, self.frontier.min_dropped_lb)
        gap = max(0.0, self.opt_error - min(remaining, self.opt_error)) \
            if len(self.frontier) else \
            max(0.0, min(self.opt_error - self.min_lb_seen,
                         self.sse_thresh()))
        nd = self.pair.n_data
        return RegistrationResult(
            error=self.opt_error, R=self.opt_R, t=self.opt_t,
            optComp=self.opt_comp, compatibilities=nd - self.opt_comp,
            geom_error=self.geom, incomp_error=self.incomp,
            fpfh_error=self.fpfh, last_icp=self.last_icp,
            time_s=time.time() - self.t0, outer_steps=self.outer_steps,
            bound_evals=self.bound_evals, icp_runs=self.icp_runs,
            gap=gap, converged=self.converged)


def register_batch(pairs: list[PairData], cfg: GoICPConfig,
                   slots: int | None = None,
                   max_steps: int | None = None,
                   mesh=None) -> list[RegistrationResult]:
    """Register many same-bucket pairs concurrently. Returns results in
    input order.

    mesh: optional jax.sharding.Mesh with a `data` axis — the slot axis of
    every stacked tensor shards across it (multi-chip pair-DP; slots should
    be a multiple of the axis size)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if any(p.dynamic_counts for p in pairs):
        raise ValueError("the slot engine tracks counts host-side; pass "
                         "static pairs (device_engine batches dynamic ones)")
    n = len(pairs)
    slots = min(slots or n, n)
    L = cfg.rot_batch * 8
    pending = deque(range(slots, n))
    states: list[_SlotState | None] = [
        _SlotState(i, pairs[i], cfg) for i in range(slots)]
    results: list[RegistrationResult | None] = [None] * n

    if mesh is not None:
        pair_sh = NamedSharding(mesh, P("data"))

        def shard(tree):
            return jax.device_put(tree, pair_sh)
    else:
        def shard(tree):
            return tree

    stacked = shard(stack_pairs([s.pair for s in states]))

    step = _batched_step(cfg)

    steps = 0
    while steps < (max_steps or cfg.max_outer_steps):
        steps += 1
        restack = False
        batch = []
        for si, st in enumerate(states):
            work = st.pop_and_expand(L) if st is not None else None
            while work is None:
                if st is not None and st.done:
                    results[st.index] = st.result()
                    states[si] = None
                    st = None
                if pending:
                    nxt = pending.popleft()
                    st = _SlotState(nxt, pairs[nxt], cfg)
                    states[si] = st
                    restack = True
                    work = st.pop_and_expand(L)
                else:
                    break
            batch.append(work)
        if all(w is None for w in batch):
            break
        if restack:
            stacked = shard(stack_pairs([
                (states[si].pair if states[si] is not None else pairs[0])
                for si in range(slots)]))

        centers = np.zeros((slots, L, 3), np.float32)
        widths = np.zeros((slots, L), np.float32)
        active = np.zeros((slots, L), bool)
        child_nodes = [None] * slots
        opt = np.full((slots,), np.inf, np.float32)
        for si, work in enumerate(batch):
            if work is None:
                continue
            centers[si], widths[si], active[si], child_nodes[si] = work
            opt[si] = states[si].opt_error

        # one fused device dispatch for ALL slots' rotate+ub+lb work
        R_lanes, res_ub, res_lb = step(
            stacked, shard(jnp.asarray(centers)), shard(jnp.asarray(widths)),
            shard(jnp.asarray(active)), shard(jnp.asarray(opt)))
        (R_all, ubs_all, nodes_all, terms_all, ub_evals, lbs_all,
         lb_evals) = jax.device_get(
            (R_lanes, res_ub.best_err, res_ub.best_node, res_ub.ub_terms,
             res_ub.evals, res_lb.lb_safe, res_lb.evals))
        ubs_all = np.asarray(ubs_all, np.float64)
        nodes_all = np.asarray(nodes_all, np.float64)
        terms_all = np.asarray(terms_all, np.float64)
        R_all = np.asarray(R_all, np.float64)
        lbs_all = np.asarray(lbs_all, np.float64)

        for si, work in enumerate(batch):
            if work is None:
                continue
            st = states[si]
            st.bound_evals += int(ub_evals[si]) + int(lb_evals[si])
            ubs = ubs_all[si].copy()
            ubs[~active[si]] = np.inf
            st.adopt(ubs, nodes_all[si], terms_all[si], R_all[si])
            st.push_children(child_nodes[si], active[si], lbs_all[si], ubs)

    for st in states:
        if st is not None:
            st.done = True
            results[st.index] = st.result()
    return [r for r in results]
