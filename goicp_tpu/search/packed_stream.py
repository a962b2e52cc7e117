"""Slot-packed cross-pair stream: kernel volume tracks ACTIVE work.

The fused stream (search/fused_stream.py) advances every pair's full
L-lane inner state each global iteration under vmap; vmap executes every
lane, so done lanes and drained windows still pay full kernel volume —
measured utilization on the 64-pair bench is ~25-50% (evals/slot).  A
straggling hard pair at window width 2 burns half the chip on a retired
row, and per-pair lane compaction is impossible under vmap (vmapped
cond/switch executes all branches).

This engine removes the vmap: ALL (pair, lane) inner translation
searches live in ONE flat pool of W*L lanes, and each global iteration
  1. selects the S least-advanced LIVE lanes (S = cfg.packed_slots)
     across every pair — one argsort over W*L keys;
  2. gathers their frontier bundles + their pair's kernel tables
     (per-lane-table Pallas kernels: bounds/pallas_eval.py *_lanes);
  3. runs ONE inner-BnB iteration on the packed (S, ...) batch;
  4. scatters the updated bundles back.
Per-lane trajectories are BIT-IDENTICAL to the fused/device engines
(each lane's search depends only on its own state), so results match
register_device per pair; only scheduling changes.  A lone straggler
automatically receives every slot its own frontier can fill — the
work-conserving generalization of the straggler shape escalation asked
for in VERDICT r3 (next-1).

State packs into three bundles to keep the hot path's gather/scatter op
count flat: sn (W,L,C,5) nodes+lbs, ss (W,L,16) scalars, pm (W,L,Nd,4)
rotated points + rot uncertainty (pair-major so the stream driver's
window-refill row scatter stays valid; the hot loop reshapes to flat
(W*L, ...) views, which is free).  Outer-step transitions unpack to the
fused engine's layout and reuse its harvest/ICP/advance logic verbatim
(they fire under a scalar cond, off the common path).

Reference anchors: the one-node-at-a-time InnerBnB pops this batches are
jly_goicp.cpp:286-579; the pair loop bo1_GoICP.py:40-54.

Scope: requires the Pallas kernel envelope (pallas_eval.supports) and
chem == incompatibility-only (or off); other configs use the fused
stream.  Single-device: multi-chip runs shard PAIRS across processes
and pack within each device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from goicp_tpu.bounds.evaluate import (chem_bounds_from_lattice,
                                       _CHILD_OFFSETS, _LATTICE_OFFSETS)
from goicp_tpu.config import GoICPConfig
from goicp_tpu.pipeline.prepare import PairData
from goicp_tpu.search.device_engine import DeviceResult
from goicp_tpu.search import fused_stream as fs

SQRT3 = 3.0 ** 0.5
INF = jnp.inf

# ss bundle layout (f32; integer-valued fields stay exact below 2^24)
_OPT, _THR, _MIND, _DONE, _IT, _EVALS = 0, 1, 2, 3, 4, 5
_BN = slice(6, 10)          # best_node (x,y,z,w)
_UBT = slice(10, 13)        # ub_terms (geom, incomp, fpfh)
_GSURV, _CHEMC = 13, 14     # per-lane geometric-survivor / chem-corner
                            # counters (see search/inner.InnerResult)
_SS_W = 16


def supports_packed(pair: PairData, cfg: GoICPConfig) -> bool:
    """Packed engine envelope: Pallas chem/geom kernels must cover the
    grid, and chem must be incompatibility-only (or off)."""
    from goicp_tpu.bounds import pallas_eval
    from goicp_tpu.bounds.evaluate import _c_pad
    chem = fs._chem_active(cfg)
    only_incomp = (cfg.regularization > 0
                   and not (cfg.regularizationFPFH > 0 and cfg.cfpfh != 0)
                   and cfg.regularizationNeighbors <= 0)
    if chem and not only_incomp:
        return False
    gate = pallas_eval.supports if chem else pallas_eval.supports_geom
    return gate(pair.grid.geom.size, _c_pad(pair), cfg.norm)


# ---------------------------------------------------------------------------
# state packing
# ---------------------------------------------------------------------------

def _pack_inner(inner: dict, pts_rot, mrd, lane_it, lane_evals,
                lane_gsurv, lane_chemc):
    """fused-style per-(pair,lane) inner dict (W,L,...) -> bundles
    (flattened to (W*L, ...)).  Returns (sn, ss, pm, sv) where sv is the
    corner-reuse payload (W,L,C,8T) or None when chem_reuse is off."""
    W, L, C, _ = inner["nodes"].shape
    sn = jnp.concatenate([inner["nodes"],
                          inner["lbs"][..., None]], axis=-1)
    ss = jnp.concatenate([
        inner["opt_err"][..., None], inner["thr"][..., None],
        inner["min_dropped"][..., None],
        inner["done"].astype(jnp.float32)[..., None],
        lane_it[..., None], lane_evals[..., None],
        inner["best_node"], inner["ub_terms"],
        lane_gsurv[..., None], lane_chemc[..., None],
        jnp.zeros((W, L, _SS_W - 15), jnp.float32)], axis=-1)
    del W, L, C
    pm = jnp.concatenate([pts_rot, mrd[..., None]], axis=-1)
    return sn, ss, pm, inner.get("cvals")


def _inner_view(s: dict, W: int, L: int):
    """Packed bundles -> the fused engine's (W, L, ...) inner dict (plus
    pts_rot/mrd), for the transition path.  Pure reshapes/slices."""
    del W, L
    sn, ss, pm = s["sn"], s["ss"], s["pm"]
    inner = dict(
        nodes=sn[..., :4], lbs=sn[..., 4],
        opt_err=ss[..., _OPT], thr=ss[..., _THR],
        min_dropped=ss[..., _MIND], done=ss[..., _DONE] > 0,
        best_node=ss[..., _BN], ub_terms=ss[..., _UBT],
        # pair-level counters for the fused transition logic: SUMS over
        # lanes (the packed engine's inner_iters metric is total
        # lane-iterations — the work/volume unit — not sequential depth)
        it=jnp.sum(ss[..., _IT], axis=1).astype(jnp.int32),
        evals=jnp.sum(ss[..., _EVALS], axis=1).astype(jnp.int32),
        geom_surv=jnp.sum(ss[..., _GSURV], axis=1).astype(jnp.int32),
        chem_corners=jnp.sum(ss[..., _CHEMC], axis=1).astype(jnp.int32),
    )
    if "sv" in s and s["sv"] is not None:
        inner["cvals"] = s["sv"]
    return inner, pm[..., :3], pm[..., 3], ss


def packed_init(pair_batch: PairData, cfg: GoICPConfig) -> dict:
    """Batched fused init, repacked into slot bundles."""
    st = jax.vmap(lambda p: fs.fused_init(p, cfg))(pair_batch)
    inner = st.pop("inner")
    pts_rot = st.pop("pts_rot")
    mrd = st.pop("mrd")
    W, L = inner["done"].shape
    zeros = jnp.zeros((W, L), jnp.float32)
    sn, ss, pm, sv = _pack_inner(inner, pts_rot, mrd, zeros, zeros, zeros,
                                 zeros)
    st.update(sn=sn, ss=ss, pm=pm)
    if sv is not None:
        st["sv"] = sv
    # inner_work: total lane-iterations executed (the packed engine's
    # volume metric; reported as inner_iters)
    st["inner_it"] = jnp.zeros((W,), jnp.int32)
    return st


# ---------------------------------------------------------------------------
# per-pair kernel tables (computed once per chunk invocation, off-loop)
# ---------------------------------------------------------------------------

def _pair_tables(pair_batch: PairData, cfg: GoICPConfig):
    """-> dict of stacked per-pair tables for the per-lane kernels:
    tab (W,Cp,22) [geom 6 | chem 16], pside (W,12,Nd) [weights; pp 10;
    spare], consts (W,8) grid consts + trim count slot, sse (W,)."""
    from goicp_tpu.bounds.pallas_eval import geom_table, chem_tables

    def one(p: PairData):
        size = p.grid.geom.size
        g6 = geom_table(p.grid.cell_coords, size)
        a16, pp = chem_tables(p.grid.cell_coords, p.cell_compat,
                              p.prop_onehot, p.data_mask, size)
        tab = jnp.concatenate([g6, a16], axis=1)              # (Cp, 22)
        pside = jnp.concatenate(
            [p.weights[None, :], pp,
             jnp.zeros((1, pp.shape[1]), jnp.float32)], axis=0)  # (12, Nd)
        trim_k = p.inlier_f() if cfg.doTrim else jnp.float32(0.0)
        cons = jnp.concatenate([p.grid.consts.astype(jnp.float32),
                                jnp.asarray(trim_k,
                                            jnp.float32).reshape(1),
                                jnp.zeros(2, jnp.float32)])   # (8,)
        sse = jnp.float32(cfg.mse_margin) * p.inlier_f()
        return dict(tab=tab, pside=pside, cons=cons, sse=sse)

    return jax.vmap(one)(pair_batch)


# ---------------------------------------------------------------------------
# the packed inner iteration
# ---------------------------------------------------------------------------

def _packed_iter(cfg: GoICPConfig, size: int, sn, ss, pm, tab, pside,
                 cons, sse, live, sv=None):
    """One inner-BnB iteration on S packed lanes (possibly from different
    pairs).  Mirrors search/inner._make_inner_body lane-for-lane; the
    Pallas kernels take per-lane tables.  sv (S,C,8): the corner-reuse
    payload rows when cfg.chem_reuse (incomp-only chem here)."""
    from goicp_tpu.bounds.pallas_eval import (geometric_bounds_kernel_lanes,
                                              chem_incomp_kernel_lanes)
    from goicp_tpu.search.inner import _LAT_FROM_STORED, _ODD_LATTICE
    S, C, _ = sn.shape
    P = cfg.trans_pop
    chem = fs._chem_active(cfg)
    interp = jax.default_backend() != "tpu"
    child_off = jnp.asarray(_CHILD_OFFSETS, jnp.float32)
    lattice_off = jnp.asarray(_LATTICE_OFFSETS, jnp.float32)

    nodes, lbs = sn[..., :4], sn[..., 4]
    pts, mrd = pm[..., :3], pm[..., 3]
    ref_err = ss[:, _THR]
    opt_err0 = ss[:, _OPT]
    min_lb = lbs[:, 0]
    done = (ss[:, _DONE] > 0) | jnp.isinf(min_lb) \
        | (ref_err - min_lb < sse)

    pop_lb = lbs[:, :P]
    parents = nodes[:, :P]
    expand = (~done[:, None]) & jnp.isfinite(pop_lb) \
        & (ref_err[:, None] - pop_lb >= sse[:, None])
    rest_lbs = lbs[:, P:]
    rest_nodes = nodes[:, P:]

    cw = parents[..., 3:4] / 2.0                             # (S,P,1)
    cxyz = parents[..., None, 0:3] + child_off[None, None] * cw[..., None, :]
    cwidth = jnp.broadcast_to(cw[..., None, :], cxyz[..., :1].shape)
    children = jnp.concatenate([cxyz, cwidth], axis=-1)      # (S,P,8,4)
    centers = (cxyz + cw[..., None, :] / 2.0).reshape(S, P * 8, 3)
    widths = cwidth.reshape(S, P * 8)

    ub, ubu, lb = geometric_bounds_kernel_lanes(
        pts, centers, widths, mrd, pside[:, 0], tab[..., :6], cons,
        size=size, norm=cfg.norm, fused=True, trim=cfg.doTrim,
        interpret=interp)

    valid = jnp.repeat(expand, 8, axis=1)                    # (S, P*8)
    # per-lane counters (see search/inner.InnerResult): geometric
    # survivors vs the incumbent, and chem corner kernel volume
    alive = valid & ~(lb >= opt_err0[:, None])               # NaN-keeps
    n_surv_lane = jnp.sum(alive, axis=1).astype(jnp.float32)
    chemc_lane = jnp.float32(27 * P) if chem else jnp.float32(0.0)

    child_cv = None
    if chem:
        corners = (parents[..., None, 0:3]
                   + lattice_off[None, None] * cw[..., None, :])
        if sv is not None:
            # corner reuse (search/inner.py semantics): stored parent
            # corners fill the even lattice slots, the kernel evaluates
            # the 19 new points
            parents_cv = sv[:, :P]                           # (S,P,8)
            odd = jnp.asarray(_ODD_LATTICE)
            corners_odd = jnp.take(corners, odd, axis=2)     # (S,P,19,3)
            counts = chem_incomp_kernel_lanes(
                pts, corners_odd.reshape(S, P * 19, 3), tab[..., 6:22],
                pside[:, 1:11], cons, size=size, interpret=interp)
            both = jnp.concatenate(
                [parents_cv, counts.reshape(S, P, 19)], axis=-1)
            vals = {"incomp": jnp.take(
                both, jnp.asarray(_LAT_FROM_STORED), axis=-1)}
            chemc_lane = jnp.float32(19 * P)
        else:
            counts = chem_incomp_kernel_lanes(
                pts, corners.reshape(S, P * 27, 3), tab[..., 6:22],
                pside[:, 1:11], cons, size=size, interpret=interp)
            vals = {"incomp": counts.reshape(S, P, 27)}
        if sv is not None:
            ub_add, lb_add, ub_t, cvd = chem_bounds_from_lattice(
                cfg, vals, with_child_vals=True)
            child_cv = cvd["incomp"].reshape(S, P * 8, 8)
        else:
            ub_add, lb_add, ub_t = chem_bounds_from_lattice(cfg, vals)
        ub = ub + ub_add.reshape(S, P * 8)
        ubu = ubu + ub_add.reshape(S, P * 8)
        lb = lb + lb_add.reshape(S, P * 8)
        incomp_t = ub_t.get("incomp", jnp.zeros((S, P, 8)))
        terms = jnp.stack([
            ub - incomp_t.reshape(S, P * 8),
            incomp_t.reshape(S, P * 8),
            jnp.zeros_like(ub)], axis=-1)
    else:
        terms = jnp.stack([ub, jnp.zeros_like(ub), jnp.zeros_like(ub)],
                          axis=-1)

    ub = jnp.where(valid, ub, INF)
    lb = jnp.where(valid, lb, INF)
    ubu = jnp.where(valid, ubu, INF)

    # adopt the best child ub per lane
    bc = jnp.argmin(ub, axis=1)
    best_ub = jnp.take_along_axis(ub, bc[:, None], axis=1)[:, 0]
    improved = ~(best_ub >= opt_err0) & ~done       # NaN-infectious <
    opt_err = jnp.where(improved, best_ub, opt_err0)
    chosen = jnp.take_along_axis(
        children.reshape(S, P * 8, 4), bc[:, None, None], axis=1)[:, 0]
    best_node = jnp.where(improved[:, None], chosen, ss[:, _BN])
    chosen_terms = jnp.take_along_axis(terms, bc[:, None, None],
                                       axis=1)[:, 0]
    ub_terms = jnp.where(improved[:, None], chosen_terms, ss[:, _UBT])

    # fused threshold: min of achieved values
    best_ubu = jnp.min(ubu, axis=1)
    thr = jnp.minimum(ss[:, _THR], jnp.minimum(opt_err, best_ubu))
    thr = jnp.where(done, ss[:, _THR], thr)
    lb = jnp.where(lb >= thr[:, None], INF, lb)

    # merge + keep the C lowest-lb nodes (corner-reuse payload rides)
    child_payload = children.reshape(S, P * 8, 4)
    rest_payload = rest_nodes
    if sv is not None:
        child_payload = jnp.concatenate([child_payload, child_cv], axis=-1)
        rest_payload = jnp.concatenate([rest_nodes, sv[:, P:]], axis=-1)
    all_lbs = jnp.concatenate([rest_lbs, lb], axis=1)
    all_nodes = jnp.concatenate([rest_payload, child_payload], axis=1)
    order = jnp.argsort(all_lbs, axis=1)
    sorted_lbs = jnp.take_along_axis(all_lbs, order, axis=1)
    keep_lbs = sorted_lbs[:, :C]
    keep_payload = jnp.take_along_axis(all_nodes, order[:, :C, None],
                                       axis=1)
    keep_nodes = keep_payload[..., :4]
    dropped = sorted_lbs[:, C:]
    min_drop = jnp.min(jnp.where(jnp.isfinite(dropped), dropped, INF),
                       axis=1)
    min_dropped = jnp.minimum(ss[:, _MIND],
                              jnp.where(done, INF, min_drop))

    keep_nodes = jnp.where(done[:, None, None], nodes, keep_nodes)
    keep_lbs = jnp.where(done[:, None], lbs, keep_lbs)
    sv_new = None
    if sv is not None:
        sv_new = jnp.where(done[:, None, None], sv, keep_payload[..., 4:])
        sv_new = jnp.where(live[:, None, None], sv_new, sv)

    n_evals = jnp.sum(valid, axis=1).astype(jnp.float32)     # per lane

    sn_new = jnp.concatenate([keep_nodes, keep_lbs[..., None]], axis=-1)
    ss_new = jnp.concatenate([
        opt_err[:, None], thr[:, None], min_dropped[:, None],
        done.astype(jnp.float32)[:, None],
        (ss[:, _IT] + jnp.where(done, 0.0, 1.0))[:, None],
        (ss[:, _EVALS] + n_evals)[:, None],
        best_node, ub_terms,
        (ss[:, _GSURV] + n_surv_lane)[:, None],
        (ss[:, _CHEMC] + chemc_lane)[:, None],
        ss[:, 15:]], axis=-1)

    # dead slots (padding when fewer than S lanes are live) keep state
    sn_new = jnp.where(live[:, None, None], sn_new, sn)
    ss_new = jnp.where(live[:, None], ss_new, ss)
    return sn_new, ss_new, sv_new


# ---------------------------------------------------------------------------
# transitions (reuse the fused engine's logic on an unpacked view)
# ---------------------------------------------------------------------------

def _transition(pair_batch: PairData, cfg: GoICPConfig, s: dict,
                need_trans, W: int, L: int) -> dict:
    inner, pts_rot, mrd, ss = _inner_view(s, W, L)
    fstate = {k: v for k, v in s.items()
              if k not in ("sn", "ss", "pm", "sv")}
    fstate.update(inner=inner, pts_rot=pts_rot, mrd=mrd)
    out = fs._transition_batch(pair_batch, cfg, fstate, need_trans)
    transitioned = need_trans & ~s["converged"]

    inner_new = out.pop("inner")
    pts_new = out.pop("pts_rot")
    mrd_new = out.pop("mrd")
    # per-lane counters reset on transitioned pairs, survive otherwise
    zeros = jnp.where(transitioned[:, None],
                      0.0, ss[..., _IT])
    zeros_e = jnp.where(transitioned[:, None], 0.0, ss[..., _EVALS])
    zeros_g = jnp.where(transitioned[:, None], 0.0, ss[..., _GSURV])
    zeros_c = jnp.where(transitioned[:, None], 0.0, ss[..., _CHEMC])
    sn, ss_new, pm, sv = _pack_inner(inner_new, pts_new, mrd_new, zeros,
                                     zeros_e, zeros_g, zeros_c)
    out.update(sn=sn, ss=ss_new, pm=pm)
    if sv is not None:
        out["sv"] = sv
    return out


def _pair_inner_done(s: dict, cfg: GoICPConfig, W: int, L: int):
    ss = s["ss"]                                 # (W, L, _SS_W)
    lane_over = (ss[..., _DONE] > 0) \
        | (ss[..., _IT] >= cfg.inner_max_iters)
    return jnp.all(lane_over, axis=1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def packed_run_chunk(pair_batch: PairData, cfg: GoICPConfig, state: dict,
                     steps) -> dict:
    """Advance the packed pool by at most `steps` global iterations."""
    W = state["converged"].shape[0]
    L = cfg.rot_batch * 8
    WL = W * L
    S = min(cfg.packed_slots, WL)
    size = pair_batch.grid.geom.size
    if hasattr(size, "item"):
        size = int(size)
    tabs = _pair_tables(pair_batch, cfg)

    TE = max(1, cfg.packed_trans_every)

    def body(carry):
        s, g = carry
        live_pair = ~s["converged"] & (s["it"] < cfg.max_outer_steps)
        # transition batching: fire the (expensive, vmapped-over-W)
        # harvest/ICP/advance block only every TE iterations — completed
        # phases idle while other pairs' lanes fill the slots — UNLESS
        # live lanes can no longer fill the slot budget (endgame /
        # straggler: then transition immediately, no added latency)
        ss0f = s["ss"].reshape(WL, _SS_W)
        lane_live0 = (ss0f[:, _DONE] == 0) \
            & (ss0f[:, _IT] < cfg.inner_max_iters) \
            & jnp.repeat(live_pair, L)
        check = (g % TE == 0) | (jnp.sum(lane_live0) < S)
        need_trans = _pair_inner_done(s, cfg, W, L) & live_pair & check

        K = min(cfg.trans_slots, W) if cfg.trans_slots > 0 else W

        def do_trans(st):
            if K >= W:
                return _transition(pair_batch, cfg, st, need_trans, W, L)
            # slot-gathered transition (see fused_stream.fused_run_chunk):
            # serve <= K transitioning pairs per event instead of paying
            # the W-wide vmapped block; unserved pairs wait (idempotent
            # completed inner state), per-pair trajectories unchanged
            _, idx = jax.lax.top_k(need_trans.astype(jnp.int32), K)
            sub_s = jax.tree_util.tree_map(lambda x: x[idx], st)
            sub_p = jax.tree_util.tree_map(lambda x: x[idx], pair_batch)
            sub_o = _transition(sub_p, cfg, sub_s, need_trans[idx], K, L)
            return jax.tree_util.tree_map(
                lambda full, so: full.at[idx].set(so), st, sub_o)

        s = jax.lax.cond(jnp.any(need_trans), do_trans, lambda st: st, s)

        # ---- slot selection: S least-advanced live lanes (flat views
        # of the pair-major bundles; the reshapes are free) ----
        C = s["sn"].shape[2]
        ndp = s["pm"].shape[2]
        snf = s["sn"].reshape(WL, C, 5)
        ssf = s["ss"].reshape(WL, _SS_W)
        pmf = s["pm"].reshape(WL, ndp, 4)
        svf = s["sv"].reshape(WL, C, s["sv"].shape[-1]) \
            if "sv" in s else None
        live_pair2 = ~s["converged"] & (s["it"] < cfg.max_outer_steps)
        lane_live = (ssf[:, _DONE] == 0) \
            & (ssf[:, _IT] < cfg.inner_max_iters) \
            & jnp.repeat(live_pair2, L)
        key = jnp.where(lane_live, ssf[:, _IT], jnp.float32(2 ** 30))
        slots = jnp.argsort(key)[:S]                          # (S,)
        spair = slots // L
        live = lane_live[slots]

        sn_n, ss_n, sv_n = _packed_iter(
            cfg, size, snf[slots], ssf[slots], pmf[slots],
            tabs["tab"][spair], tabs["pside"][spair], tabs["cons"][spair],
            tabs["sse"][spair], live,
            sv=svf[slots] if svf is not None else None)
        s = dict(s,
                 sn=snf.at[slots].set(sn_n).reshape(s["sn"].shape),
                 ss=ssf.at[slots].set(ss_n).reshape(s["ss"].shape))
        if sv_n is not None:
            s["sv"] = svf.at[slots].set(sv_n).reshape(
                (W, L) + svf.shape[1:])
        return (s, g + 1)

    def cond(carry):
        s, g = carry
        unfinished = (~s["converged"]) & (s["it"] < cfg.max_outer_steps)
        return jnp.any(unfinished) & (g < steps)

    s, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return s


def packed_finalize(state: dict) -> DeviceResult:
    """Identical gap semantics to fused_finalize (incl. the in-flight
    inner lower-bound fold), via the unpacked view."""
    W = state["converged"].shape[0]
    L = state["active"].shape[1]
    inner, pts_rot, mrd, _ = _inner_view(state, W, L)
    fstate = {k: v for k, v in state.items()
              if k not in ("sn", "ss", "pm", "sv")}
    fstate.update(inner=inner, pts_rot=pts_rot, mrd=mrd)
    res = fs.fused_finalize(fstate)
    # inner_iters: total lane-iterations (the packed work metric) =
    # retired phases (accumulated at transitions) + in-flight lanes
    inflight = jnp.sum(state["ss"][..., _IT], axis=1).astype(jnp.int32)
    return res._replace(inner_iters=res.inner_iters + inflight)


@functools.lru_cache(maxsize=16)
def _jit_init(cfg: GoICPConfig):
    return jax.jit(lambda pb: packed_init(pb, cfg))


def _packed_inflight_np(state) -> np.ndarray:
    """(W,) in-flight inner lower bound from the packed bundles (host-side
    progress telemetry; mirrors fused_stream._fused_inflight_np — ADVICE
    r4: without it packed progress rows overstated the proven bound)."""
    ss = np.asarray(state["ss"])
    sn = np.asarray(state["sn"])
    lane_lb = np.minimum(ss[..., _THR], ss[..., _MIND])
    done = ss[..., _DONE] > 0
    lane_lb = np.where(done, lane_lb,
                       np.minimum(lane_lb, sn[..., 4].min(-1)))
    return np.where(np.asarray(state["active"]), lane_lb, np.inf).min(-1)


def register_packed_stream(pairs, cfg: GoICPConfig, width: int = 8,
                           chunk_steps: int = 256, progress=None,
                           checkpoint_path: str | None = None,
                           resume: bool = False,
                           max_chunks: int | None = None,
                           checkpoint_every: int = 1):
    """Continuous-batching driver over the packed engine (same windowing,
    checkpoint, and refill semantics as register_fused_stream)."""
    if not supports_packed(pairs[0], cfg):
        raise ValueError("packed stream requires the Pallas kernel "
                         "envelope and incomp-only (or no) chem terms; "
                         "use register_fused_stream")
    return fs._stream_driver(
        pairs, cfg, width=width, chunk_steps=chunk_steps,
        progress=progress, checkpoint_path=checkpoint_path, resume=resume,
        max_chunks=max_chunks, mesh=None,
        init_fn=_jit_init, run_chunk=packed_run_chunk,
        finalize=packed_finalize, inflight_fn=_packed_inflight_np,
        checkpoint_every=checkpoint_every)
