"""Pallas TPU kernels for the BnB bound-evaluation hot path.

Reference hot loops being replaced (see SURVEY.md §3.3): the InnerBnB
per-point weighted DT lookup + bound sums (jly_goicp.cpp:343-415) and the
chem corner compatibility probes (:429-550 via checkCompatibility
:974-1041).

Why a custom kernel, and why THIS formulation
---------------------------------------------
The XLA path (bounds/evaluate.py) evaluates bounds as table *gathers* over
the precomputed EDT fields.  Two problems on TPU:
  1. gathers run on the VPU at a few elements/cycle and dominate the step;
  2. batched (vmapped) multi-dimensional gathers have produced sporadic
     TPU-worker kernel faults on v5e in this environment.

This kernel computes the SAME values with zero gathers, using the MXU:
because our EDT is exact (grid/edt.py), the table value at a voxel IS
  min over occupied cells c of |voxel_center - cell_center| / scale,
so instead of gathering dist[flat(voxel)] we recompute the min over the
(few hundred) occupied cells as a (points x cells) matmul.  All voxel and
cell coordinates are small integers, so every product/sum fits exactly in
f32 and the result is BIT-EQUAL to the gather path.

The nearest-cell argmin (needed for the chem terms) is recovered with a
key encoding: key = 2*(d2 * stride + cell_index) + incompat_bit, where
stride is the next POWER OF TWO >= Cpad (the _aug_dot multiplier -4*stride
must be a power of two to keep MXU operands bf16-exact).  Distinct
cells' doubled keys differ by >= 2, so the per-(cell, point) bit never
reorders cells: ONE min recovers (min d2, smallest winning cell index —
the same tie-break as the EDT build's first-min argmin) AND the winning
cell's compatibility in the key's parity (flag = min mod 2).  Exactness
requires 2*(27 * S^2 * stride + stride) + 1 < 2^24 (f32 integer range);
the wrapper falls back to the XLA gather path otherwise (cavity
workloads: S=20, stride<=512 — comfortably inside).

Per-node segment reductions (sum of dis^2 over each node's Nd points) are
also matmuls against a 0/1 segment matrix, so the only VPU work is
elementwise arithmetic.  One kernel invocation evaluates a whole
(lanes x nodes x points) bound batch with NO HBM intermediates.

Precision contract: node-value -> point-lane BROADCASTS never go through
the MXU.  A dot against a one-hot segment matrix would round arbitrary
floats under reduced-precision MXU passes — in particular the bisection
select's threshold expansion must reproduce t* bitwise or the count
invariant (and with it trimmed-bound validity) breaks on hardware.  All
such expansions use exact broadcast/reshape (`_expand_seg`); only genuine
reductions (integer-valued min-matmul, 0/1-weighted segment sums) ride
the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT3 = float(np.sqrt(3.0))
_LANE = 128

def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _pow2_at_least(n: int) -> int:
    """Smallest power of two >= n (the chem argmin-key stride must be a
    power of two so the _aug_dot multiplier -4*stride keeps every MXU
    operand inside 8 significand bits — see _aug_chem)."""
    p = 1
    while p < n:
        p *= 2
    return p


def _chunk_limit(c_pad: int, ndp: int, buffers: int) -> int:
    """Largest per-program node/corner chunk that keeps VMEM comfortable,
    to amortize grid program overhead (callers PAD the node axis up to a
    multiple — no divisor restriction).

    Budget ~12 MB split across the `buffers` live (c_pad, bc*ndp) work
    matrices, AND the (bc, bc*ndp) segment-selection matrices (which grow
    quadratically in bc and would otherwise blow up when c_pad is tiny)."""
    budget = 12_000_000
    bc = 1
    while True:
        cand = bc + 1
        work = buffers * 4 * c_pad * cand * ndp
        seg = 2 * 4 * cand * cand * ndp
        if work + seg > budget or cand > 512:
            return bc
        bc = cand


def supports(size: int, c_pad: int, n_norm: int) -> bool:
    """Can the key encoding stay exact for this grid?  (chem-kernel gate:
    the argmin-cell identity needs the doubled 2*(d2*stride+idx)+bit key,
    with stride = next power of two >= c_pad so the _aug_dot multiplier
    -4*stride is itself a power of two — the documented exactness
    precondition for 1-pass-bf16 MXU operands)"""
    stride = _pow2_at_least(c_pad)
    d2_max = 27.0 * size * size          # incl. far-padded cells at -2S
    return (c_pad <= 512
            and 2.0 * (d2_max * stride + stride) + 1 < 2 ** 24
            and n_norm in (1, 2))


_GEOM_C_CHUNK = 512      # cells per in-kernel min chunk (VMEM work tile)
_GEOM_C_MAX = 65536      # CAPABILITY envelope: the (Cp,6) aug table must
                         # stay a comfortable VMEM resident (64k cells =
                         # 1.5 MB).  Covers the bunny demo's 300^3 grid
                         # (~20-35k occupied cells), which previously had
                         # NO kernel path at all and depended on the XLA
                         # gather path with its documented sporadic v5e
                         # kernel-fault history (VERDICT r4 missing-2).
                         # Measured on the bunny (35k cells, 856 evals,
                         # device-resident pair): kernel 1.09 s warm vs
                         # gather 0.58 s — a 1.9x demo-scale premium for
                         # ZERO exposure to the gather path's documented
                         # sporadic v5e kernel faults, so the kernel is
                         # the default; GOICP_KERNEL=xla opts into the
                         # faster gather (PERF.md round 5).


def supports_geom(size: int, c_pad: int, n_norm: int) -> bool:
    """Geometric-kernel gate.  The distance needs only min d2 (no argmin
    identity), so exactness requires just d2 itself integer-exact in f32:
    27 S^2 < 2^24 (S <= 788).  The cell cap keeps the aug table VMEM-
    resident (perf/memory bound, not an exactness one)."""
    return (c_pad <= _GEOM_C_MAX and 27.0 * size * size < 2 ** 24
            and n_norm in (1, 2))


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _cread(consts_ref, k: int, lane_tables: bool = False):
    """Scalar read from the SMEM consts row: shared path carries (1,8),
    the per-lane-table path (1,1,8) (Mosaic requires full-size trailing
    block dims, so an (L,8) operand cannot take (1,8) blocks)."""
    return consts_ref[0, 0, k] if lane_tables else consts_ref[0, k]


def _voxelize(pos, consts_ref, size_f, lane_tables: bool = False):
    """pos (3,T) world -> (raw (3,T) f32 int-valued, clamped (3,T) f32)."""
    lo = jnp.concatenate(
        [_cread(consts_ref, 0, lane_tables).reshape(1, 1),
         _cread(consts_ref, 1, lane_tables).reshape(1, 1),
         _cread(consts_ref, 2, lane_tables).reshape(1, 1)], axis=0)  # (3,1)
    scale = _cread(consts_ref, 3, lane_tables)
    raw = jnp.trunc((pos - lo) * scale + 0.5)                # ROUND, f32
    clamped = jnp.clip(raw, 0.0, size_f - 1.0)
    return raw, clamped


def _aug_dot(aug, clamped, mult: float, extra_rows=None):
    """aug (Cc, 6 [+E]) = [c_x c_y c_z d16 d8 d1 | extra cols] x
    clamped (3, T) [+ extra_rows (E, T)] ->
    (Cc, T) = mult * (c . v) + (65536 d16 + 256 d8 + d1) [+ extra.extra],
    EXACT in f32 at DEFAULT (1-pass bf16) MXU precision: every operand has
    <= 8 mantissa bits — cell coords and voxel coords are small integers,
    mult is a power of two (so mult*v keeps v's mantissa), the digit
    columns are base-256 digits in [0, 255], and their multiplier rows are
    powers of two — so every product is exact in f32 and the f32
    accumulation of integer values < 2^24 is exact.  extra_rows (callers:
    the rank-9 incompatibility factors, entries in {-1,0,1}) must keep the
    same contract.  (A precision=HIGHEST dot would also be exact but
    lowers to a ~4x slower multi-pass; measured on-chip.)"""
    t = clamped.shape[1]
    parts = [
        jnp.float32(mult) * clamped,
        jnp.full((1, t), 65536.0, jnp.float32),
        jnp.full((1, t), 256.0, jnp.float32),
        jnp.ones((1, t), jnp.float32)]
    if extra_rows is not None:
        parts.append(extra_rows)
    rows = jnp.concatenate(parts, axis=0)                    # (6+E, T)
    return jax.lax.dot_general(
        aug, rows, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _digits256(val: jnp.ndarray) -> jnp.ndarray:
    """Integer-valued f32 (Cp,) in [0, 2^24) -> (Cp, 3) base-256 digits
    [d16 d8 d1] with val = 65536 d16 + 256 d8 + d1; each digit <= 255 is
    bf16-exact, making the digit columns safe MXU operands (see
    _aug_dot)."""
    d16 = jnp.floor(val / 65536.0)
    r = val - d16 * 65536.0
    d8 = jnp.floor(r / 256.0)
    d1 = r - d8 * 256.0
    return jnp.stack([d16, d8, d1], axis=1)


def _min_d2(clamped, aug_g):
    """clamped (3,T), aug_g (Cp,6) = [c | digits(c_norm)] -> (1,T) min over
    cells of |v-c|^2, integer-exact in f32 (no argmin identity needed —
    the geometric kernel only uses the distance).  The cell-norm term
    rides inside the matmul (one VPU min pass, no elementwise d2
    assembly); |v|^2 is constant per column and added after the min.
    Cells are consumed in chunks of _GEOM_C_CHUNK so the (chunk, T) work
    tile stays VMEM-resident even for mid-size models (c_pad up to
    _GEOM_C_MAX)."""
    c_pad = aug_g.shape[0]
    vn = jnp.sum(clamped * clamped, axis=0, keepdims=True)   # (1,T)

    def one(a):
        return jnp.min(_aug_dot(a, clamped, -2.0), axis=0, keepdims=True)

    if c_pad <= _GEOM_C_CHUNK:
        return one(aug_g) + vn

    # STATIC Python unroll over cell chunks (c_pad is trace-time known;
    # Mosaic does not lower dynamic_slice on VMEM values inside a
    # fori_loop, and static slices let each chunk's (cc, T) work tile
    # retire before the next is produced).  _pad_cells parks padding at
    # -2S, so a ragged final chunk is safe to take at full width from
    # the padded table.
    cc = _GEOM_C_CHUNK
    best = one(aug_g[0:cc])
    for i in range(1, -(-c_pad // cc)):
        lo = min(i * cc, c_pad - cc)
        best = jnp.minimum(best, one(aug_g[lo:lo + cc]))
    return best + vn


def _expand_seg(v, nd: int):
    """(r, bc) per-node values -> (r, bc*nd) point-major segments, EXACT
    (broadcast + reshape only; a one-hot matmul would round arbitrary f32
    values under reduced-precision MXU passes).

    bc < 8: Mosaic cannot collapse a second-minor dim smaller than the
    sublane count ((r, 2, 1024) -> (r, 2048) fails "Unsupported
    reshape" — hit at demo-grid shapes where the VMEM budget caps the
    node chunk at 2); a static per-node concat of plain broadcasts is
    layout-trivial and equally exact."""
    r, bc = v.shape
    if bc < 8:
        return jnp.concatenate(
            [jnp.broadcast_to(v[:, j:j + 1], (r, nd)) for j in range(bc)],
            axis=1)
    return jnp.broadcast_to(v[:, :, None], (r, bc, nd)).reshape(r, bc * nd)


def _seg_sum_rows(v, bc: int, nd: int):
    """(r, bc*nd) -> (r, bc) per-node row sums, exact f32 (lane-axis
    reduction after an 8-aligned reshape; static per-node slice unroll
    when bc < 8 — same Mosaic reshape limit as _expand_seg)."""
    r = v.shape[0]
    if bc < 8:
        return jnp.concatenate(
            [jnp.sum(v[:, j * nd:(j + 1) * nd], axis=1, keepdims=True)
             for j in range(bc)], axis=1)
    if r == 1:
        return jnp.sum(v.reshape(bc, nd), axis=1)[None, :]
    return jnp.sum(v.reshape(r, bc, nd), axis=2)


def _kth_select(vals, bc: int, nd: int, k_f):
    """Per-node K-smallest selection without sorting (intro_select
    analogue, jly_sorting.hpp:229).

    vals (R,T): R independent rows of per-point values with padding
    pushed to a huge sentinel (the fused trimmed path batches its TWO
    selections — dis and disu — as R=2 rows of ONE bisection, halving
    the per-step fixed cost).
    k_f: the K as an f32 scalar — a Python constant (static trim) or a
    traced SMEM value (dynamic-counts trim).
    Finds each (row, node)'s K-th smallest value t* by 31-step bisection
    over the (monotonic for non-negative f32) bit space, exactly.
    Returns (sel (R,T) 0/1 indicator of vals <= t*, surplus (R,bc) =
    count(sel)-K, t_star (R,bc)).  The surplus elements all equal t*, so
    a caller sums g(vals)*sel - surplus*g(t*) to reproduce the exact
    trimmed sum of any per-element transform g.

    Counts are VPU lane row-sums over the (R,bc,nd) reshape (exact
    integer accumulation) — the round-3 formulation's per-step 0/1 count
    MATMUL was ~4x slower (62 MXU dots per trimmed fused evaluation)."""
    r = vals.shape[0]

    def count(sel):                                          # (R,T)->(R,bc)
        return _seg_sum_rows(sel, bc, nd)

    def expand(v):                                           # (R,bc)->(R,T)
        return _expand_seg(v, nd)

    def bisect_body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        t_seg = expand(pltpu.bitcast(mid, jnp.float32))
        cnt = count((vals <= t_seg).astype(jnp.float32))
        ge_k = cnt >= k_f
        return (jnp.where(ge_k, lo, mid + 1), jnp.where(ge_k, mid, hi))

    lo0 = jnp.zeros((r, bc), jnp.int32)
    hi0 = jnp.full((r, bc), 0x7F7FFFFF, jnp.int32)
    _, hi = jax.lax.fori_loop(0, 31, bisect_body, (lo0, hi0))
    t_star = pltpu.bitcast(hi, jnp.float32)                   # (R,bc)
    sel = (vals <= expand(t_star)).astype(jnp.float32)
    surplus = count(sel) - k_f
    return sel, surplus, t_star


_TRIM_SENTINEL = 1.0e30   # pushes padded points past any real distance


def _geom_kernel(consts_ref, pts_ref, cen_ref, wid_ref, ru_ref, w_ref,
                 cells_ref, *out_refs, nd, bc, size, c_pad, norm,
                 with_unc, fused, trim_k, trim_dynamic, lane_tables=False):
    # trim K: static Python constant, or traced from SMEM consts slot 5
    # (dynamic-counts mode — one compilation serves every inlier count)
    k_f = _cread(consts_ref, 5, lane_tables) if trim_dynamic \
        else jnp.float32(trim_k)
    do_trim = trim_k or trim_dynamic
    t = bc * nd
    size_f = jnp.float32(size)
    p3 = pts_ref[0]                                          # (3, Nd)
    p_t = jnp.concatenate([p3] * bc, axis=1)                 # (3, T)
    w_t = jnp.concatenate([w_ref[0] if lane_tables else w_ref[:]] * bc,
                          axis=1)                            # (1, T)
    aug_g = cells_ref[0] if lane_tables else cells_ref[:]    # (Cp, 6)
    del t
    cen_seg = _expand_seg(cen_ref[0, 0], nd)                 # (3, T)
    pos = p_t + cen_seg
    raw, clamped = _voxelize(pos, consts_ref, size_f, lane_tables)
    # min d2 over occupied cells, chunked (no argmin key: geometry only
    # needs the distance, so the 2^24 key gate does not apply here)
    d2 = _min_d2(clamped, aug_g)
    scale = _cread(consts_ref, 3, lane_tables)
    dist = jnp.sqrt(d2) / scale                              # (1, T)
    # out-of-bounds extension (DT3D::Distance, jly_3ddt.cpp:1156-1190)
    excess = jnp.where(raw < 0.0, raw,
                       jnp.where(raw >= size_f, raw - size_f + 1.0, 0.0))
    extra = jnp.sqrt(jnp.sum(excess * excess, axis=0, keepdims=True)) / scale
    oob = jnp.any((raw < 0.0) | (raw >= size_f), axis=0, keepdims=True)
    dist = jnp.where(oob, dist + extra, dist)

    def seg_sum(v):
        # EXACT per-node sums: v carries arbitrary f32 values, and a
        # default-precision MXU dot against the 0/1 segment matrix rounds
        # them to bf16 (measured ~1e-2 drift vs the XLA sum on-chip),
        # while a precision=HIGHEST dot costs ~110us extra per call
        # (multi-pass).  A lane-axis row sum after reshape keeps full f32
        # (static slice unroll below 8 nodes — Mosaic reshape limit).
        return _seg_sum_rows(v, bc, nd)                      # (1, bc)

    def f(v):
        return v * v if norm == 2 else v

    dis = w_t * dist
    wid_seg = _expand_seg(wid_ref[0, 0], nd)                 # (1, T)
    mask = w_t > 0.0   # real points (padding has zero weight)

    def trimmed(v, s3w_seg, s3w_node):
        """Trimmed (ub, lb) sums of f over the K smallest v per node;
        lb transform g(x) = f(max(x - s3w, 0)) is monotone in x, so the
        K-smallest set is shared and the boundary correction uses g(t*)."""
        vm = jnp.where(mask, v, _TRIM_SENTINEL)
        sel, surplus, t_star = _kth_select(vm, bc, nd, k_f)
        ub = seg_sum(f(v) * sel) - surplus * f(t_star)
        lb_all = jnp.maximum(v - s3w_seg, 0.0)
        lb_t = jnp.maximum(t_star - s3w_node, 0.0)
        lb = seg_sum(f(lb_all) * sel) - surplus * f(lb_t)
        return ub, lb

    s3w_seg = (SQRT3 / 2.0) * wid_seg
    s3w_node = (SQRT3 / 2.0) * wid_ref[0, 0]                 # (1, bc)
    if fused:
        ub_ref, ubu_ref, lbu_ref = out_refs
        ru_t = jnp.concatenate([ru_ref[0]] * bc, axis=1)
        disu = jnp.maximum(dis - ru_t, 0.0)
        if do_trim:
            # ONE bisection selects both passes' inlier sets: row 0 =
            # plain dis (the ub pass), row 1 = uncertainty-adjusted disu
            # (the lb pass) — each pass intro_selects its own distances
            # in the reference (jly_goicp.cpp:384-390)
            vm = jnp.concatenate(
                [jnp.where(mask, dis, _TRIM_SENTINEL),
                 jnp.where(mask, disu, _TRIM_SENTINEL)], axis=0)
            sel, surplus, t_star = _kth_select(vm, bc, nd, k_f)
            sel0, sel1 = sel[0:1], sel[1:2]
            sur0, sur1 = surplus[0:1], surplus[1:2]
            ts0, ts1 = t_star[0:1], t_star[1:2]
            ub_ref[0, 0] = seg_sum(f(dis) * sel0) - sur0 * f(ts0)
            ubu_ref[0, 0] = seg_sum(f(disu) * sel1) - sur1 * f(ts1)
            lb_all = jnp.maximum(disu - s3w_seg, 0.0)
            lb_t = jnp.maximum(ts1 - s3w_node, 0.0)
            lbu_ref[0, 0] = seg_sum(f(lb_all) * sel1) - sur1 * f(lb_t)
        else:
            lbd = jnp.maximum(disu - s3w_seg, 0.0)
            ub_ref[0, 0] = seg_sum(f(dis))
            ubu_ref[0, 0] = seg_sum(f(disu))
            lbu_ref[0, 0] = seg_sum(f(lbd))
        return
    ub_ref, lb_ref = out_refs
    if with_unc:
        ru_t = jnp.concatenate([ru_ref[0]] * bc, axis=1)
        dis = jnp.maximum(dis - ru_t, 0.0)
    if do_trim:
        ub_ref[0, 0], lb_ref[0, 0] = trimmed(dis, s3w_seg, s3w_node)
    else:
        lbd = jnp.maximum(dis - s3w_seg, 0.0)
        ub_ref[0, 0] = seg_sum(f(dis))
        lb_ref[0, 0] = seg_sum(f(lbd))


def _chem_kernel(consts_ref, pts_ref, cor_ref, aug_ref, pp_ref,
                 out_ref, *, nd, bc, g, size, stride, lane_tables=False):
    """Per-corner incompatibility counts: out[q] = #points whose property is
    incompatible with the nearest occupied cell of their clamped voxel.

    Processes the program's bc corners in unrolled groups of g: per group,
    ONE exact aug matmul (see _aug_chem) produces the (Cp, g*nd) DOUBLED
    argmin key INCLUDING the {0,1} incompatibility bit in its LSB: the
    compat table factors exactly as rank 9 (point-property one-hot x
    cell-compatible-with-property), so the bit rides as 10 extra 0/1
    matmul columns (aug: [H | 1], point rows pp: [-onehot*mask; mask])
    instead of a materialized (Cp, nd) VMEM tile + add pass (the round-3
    formulation — this removes 1 of the 3 full passes over the work
    tile, the bandwidth bound of this kernel).  Since distinct cells'
    doubled keys differ by >= 2, the bit never disturbs the cell order,
    and a SINGLE min pass yields both the argmin cell and its
    compatibility: flag = min mod 2."""
    size_f = jnp.float32(size)
    p3 = pts_ref[0]                                           # (3, nd)
    p_t = jnp.concatenate([p3] * g, axis=1)                   # (3, g*nd)
    pp_t = jnp.concatenate([pp_ref[0] if lane_tables
                            else pp_ref[:]] * g, axis=1)      # (10, g*nd)
    aug = aug_ref[0] if lane_tables else aug_ref[:]           # (Cp, 16)
    # one-hot per-group segment reduction (g*nd, g); 0/1 matmul is exact
    rows = jax.lax.broadcasted_iota(jnp.int32, (g * nd, g), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g * nd, g), 1)
    e_t = (rows // nd == cols).astype(jnp.float32)
    for grp in range(bc // g):
        cen = cor_ref[0, 0][:, grp * g:(grp + 1) * g]         # (3, g)
        pos = p_t + _expand_seg(cen, nd)
        _, clamped = _voxelize(pos, consts_ref, size_f, lane_tables)
        m = jnp.min(_aug_dot(aug, clamped, -4.0 * stride, extra_rows=pp_t),
                    axis=0, keepdims=True)                    # (1, g*nd)
        # parity of the winning key = its cell's incompatibility bit
        # (m is a signed even/odd integer, exact in f32: extract via
        # floor of half — works for negative values too)
        flag = m - 2.0 * jnp.floor(m * 0.5)                   # (1, g*nd)
        out_ref[0, 0, :, grp * g:(grp + 1) * g] = jax.lax.dot_general(
            flag, e_t, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (1, g)


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _pad_cells(cell_coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """(C,3) i32 cell coords -> (Cpad,3) f32; padding parked at -2S per axis
    (never wins the min: d2 >= 12 S^2 > 3 (S-1)^2 >= any real cell's d2)."""
    c = cell_coords.shape[0]
    c_pad = max(_ceil_to(c, 8), 8)
    far = jnp.float32(-2 * size)
    coords = jnp.where(
        (cell_coords >= 0) & (cell_coords < size),
        cell_coords.astype(jnp.float32), far)
    pad = jnp.full((c_pad - c, 3), far, jnp.float32)
    return jnp.concatenate([coords, pad], axis=0)


def _aug_geom(cells: jnp.ndarray) -> jnp.ndarray:
    """(Cp,3) f32 cell coords -> (Cp,6) [c | digits(c_norm)] so the
    in-kernel min-d2 is one DEFAULT-precision matmul (mult=-2, see
    _aug_dot) + one min pass (see _min_d2)."""
    c_norm = jnp.sum(cells * cells, axis=1)
    return jnp.concatenate([cells, _digits256(c_norm)], axis=1)


def _aug_chem(cells: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(Cp,3) f32 cell coords -> (Cp,6)
    [c | digits(2*(stride*c_norm + iota))]: the in-kernel _aug_dot with
    mult=-4*stride yields 2*(stride*(c_norm - 2 c.v) + iota) — DOUBLE the
    argmin-cell key of pallas chem lookups (the |v|^2 term is constant
    per column and cancels in the key comparison).  `stride` is the next
    POWER OF TWO >= c_pad: _aug_dot's exactness precondition requires a
    power-of-two multiplier (mult*v must keep v's significand), and
    iota < c_pad <= stride keeps distinct cells' keys separated.  The
    doubling frees the LSB: the kernel adds the per-(cell, point)
    incompatibility BIT, and since distinct cells' keys differ by >= 2,
    the bit never reorders cells — ONE min then carries the winning
    cell's compatibility in its parity (saves a full (cells x points)
    min pass vs the two-min formulation).  Values stay integer-exact f32
    under the supports() gate (2*(27 S^2 stride + stride) + 1 < 2^24)."""
    c_pad = cells.shape[0]
    assert stride >= c_pad and (stride & (stride - 1)) == 0
    c_norm = jnp.sum(cells * cells, axis=1)
    iota = jnp.arange(c_pad, dtype=jnp.float32)
    return jnp.concatenate(
        [cells,
         _digits256(2.0 * (jnp.float32(stride) * c_norm + iota))], axis=1)


def _pad_pts(pts_t, weights, rot_unc, nd):
    """Pad the point axis to a lane multiple; padded points carry zero
    weight/uncertainty so they contribute 0 to every sum."""
    ndp = _ceil_to(nd, _LANE)
    if ndp == nd:
        return pts_t, weights, rot_unc, ndp
    dp = ndp - nd
    pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, dp)))
    weights = jnp.pad(weights, ((0, 0), (0, dp)))
    if rot_unc is not None:
        rot_unc = jnp.pad(rot_unc, ((0, 0), (0, dp)))
    return pts_t, weights, rot_unc, ndp


@functools.partial(jax.jit, static_argnames=("size", "norm", "fused",
                                             "trim_k", "interpret"))
def geometric_bounds_kernel(pts_rot, centers, widths, rot_unc, weights,
                            cell_coords, consts, trim_count=None, *,
                            size: int, norm: int,
                            fused: bool = False, trim_k: int = 0,
                            interpret: bool = False):
    """Geometric bound evaluation (gather-free, MXU formulation).

    pts_rot (L,Nd,3), centers (L,B,3), widths (L,B), rot_unc (L,Nd)|None,
    weights (Nd,), cell_coords (C,3) i32, consts (5,) -> ub, lb (L,B); with
    fused=True -> (ub_plain, ubu, lbu) (L,B) each (see
    evaluate.geometric_bounds_fused).  Untrimmed sums are bit-equal to the
    XLA gather path (every intermediate is integer-exact in f32); trimmed
    sums select the identical inlier SET but accumulate in a different
    order than XLA's sorted/top_k reduction, so they agree to float
    tolerance (~1e-5 rel), not bit-for-bit.

    Trimming: trim_k > 0 bakes the inlier count into the program;
    trim_count (traced f32 scalar, dynamic-counts mode) ships it to the
    kernel via an SMEM consts slot so one compilation serves every count.
    """
    l, nd, _ = pts_rot.shape
    b0 = centers.shape[1]
    cells = _pad_cells(cell_coords, size)
    c_pad = cells.shape[0]
    # the chunked min keeps only a (<= _GEOM_C_CHUNK, T) work tile live;
    # with the aug fold only ~2 work matrices are live, and the node axis
    # is PADDED up to a bc multiple (not restricted to divisors) so small
    # chunk grids serve any b
    bc = min(b0, _chunk_limit(min(c_pad, _GEOM_C_CHUNK),
                              _ceil_to(nd, _LANE), buffers=2))
    b = _ceil_to(b0, bc)
    if b != b0:
        centers = jnp.pad(centers, ((0, 0), (0, b - b0), (0, 0)))
        widths = jnp.pad(widths, ((0, 0), (0, b - b0)))
    pts_t = pts_rot.transpose(0, 2, 1)
    cen_t = centers.transpose(0, 2, 1)
    with_unc = rot_unc is not None
    pts_t, w2, ru, ndp = _pad_pts(pts_t, weights[None, :],
                                  rot_unc if with_unc else None, nd)
    if ru is None:
        ru = jnp.zeros((l, ndp), jnp.float32)
    trim_dynamic = trim_count is not None
    k_slot = jnp.asarray(trim_count, jnp.float32).reshape(1) \
        if trim_dynamic else jnp.zeros(1, jnp.float32)
    consts8 = jnp.concatenate([consts.astype(jnp.float32), k_slot,
                               jnp.zeros(2, jnp.float32)])[None, :]

    kern = functools.partial(_geom_kernel, nd=ndp, bc=bc, size=size,
                             c_pad=c_pad, norm=norm, with_unc=with_unc,
                             fused=fused, trim_k=trim_k,
                             trim_dynamic=trim_dynamic)
    k_chunks = b // bc
    grid = (l, k_chunks)
    n_out = 3 if fused else 2
    # Mosaic requires the last two block dims to be (8,128)-divisible or
    # full-size, so chunked operands carry the chunk axis OUTSIDE them:
    # (L,3,B) -> (L,K,3,bc), (L,B) -> (L,K,1,bc), (L,Nd) -> (L,1,Nd).
    cen_r = cen_t.reshape(l, 3, k_chunks, bc).transpose(0, 2, 1, 3)
    wid_r = widths.reshape(l, k_chunks, 1, bc)
    ru_r = ru[:, None, :]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, ndp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bc), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bc), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ndp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ndp), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, 6), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, 1, bc), lambda i, k: (i, k, 0, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((l, k_chunks, 1, bc), jnp.float32)
                   ] * n_out,
        interpret=interpret,
    )(consts8, pts_t, cen_r, wid_r, ru_r, w2, _aug_geom(cells))
    return tuple(o.reshape(l, b)[:, :b0] for o in outs)


def geom_table(cell_coords, size: int) -> jnp.ndarray:
    """Per-pair geometric kernel table: (Cp,6) [c | digits(c_norm)]
    (precompute once per pair; the packed engine gathers rows per slot)."""
    return _aug_geom(_pad_cells(cell_coords, size))


def chem_tables(cell_coords, cell_compat, prop_onehot, data_mask,
                size: int):
    """Per-pair chem kernel tables: aug16 (Cp,16) cell-side columns and
    pp (10,Nd) point-side rows (see chem_incomp_kernel for semantics)."""
    cells = _pad_cells(cell_coords, size)
    c_pad = cells.shape[0]
    c_real = cell_compat.shape[0]
    stride = _pow2_at_least(c_pad)
    hcols = jnp.pad(cell_compat.astype(jnp.float32),
                    ((0, c_pad - c_real), (0, 0)))
    aug16 = jnp.concatenate(
        [_aug_chem(cells, stride), hcols,
         jnp.ones((c_pad, 1), jnp.float32)], axis=1)
    pp = jnp.concatenate([
        -prop_onehot.T,
        (data_mask > 0).astype(jnp.float32)[None, :]], axis=0)
    return aug16, pp


@functools.partial(jax.jit, static_argnames=("size", "norm", "fused",
                                             "trim", "interpret"))
def geometric_bounds_kernel_lanes(pts_rot, centers, widths, rot_unc,
                                  weights, cells_aug, consts_lanes, *,
                                  size: int, norm: int, fused: bool = True,
                                  trim: bool = False,
                                  interpret: bool = False):
    """Per-LANE-table variant of geometric_bounds_kernel for the packed
    cross-pair engine (search/packed_stream.py): every lane may belong to
    a DIFFERENT registration pair, so weights / occupied-cell tables /
    grid consts arrive with a leading lane axis and each grid program
    reads its own lane's slice.  Shapes share one bucket (same c_pad/Nd
    across the pool — the sweep's bucketed prep guarantees this).

    pts_rot (L,Nd,3), centers (L,B,3), widths (L,B), rot_unc (L,Nd),
    weights (L,Nd), cells_aug (L,Cp,6) = per-pair _aug_geom(_pad_cells),
    consts_lanes (L,8) = per-pair grid consts with the trim count in
    slot 5 -> (ub, ubu, lbu) each (L,B).  trim selects the in-kernel
    bisection select with the PER-LANE traced count (dynamic-counts
    semantics of geometric_bounds_kernel)."""
    l, nd, _ = pts_rot.shape
    b0 = centers.shape[1]
    c_pad = cells_aug.shape[1]
    bc = min(b0, _chunk_limit(min(c_pad, _GEOM_C_CHUNK),
                              _ceil_to(nd, _LANE), buffers=2))
    b = _ceil_to(b0, bc)
    if b != b0:
        centers = jnp.pad(centers, ((0, 0), (0, b - b0), (0, 0)))
        widths = jnp.pad(widths, ((0, 0), (0, b - b0)))
    pts_t = pts_rot.transpose(0, 2, 1)
    cen_t = centers.transpose(0, 2, 1)
    pts_t, w2, ru, ndp = _pad_pts(pts_t, weights, rot_unc, nd)

    kern = functools.partial(_geom_kernel, nd=ndp, bc=bc, size=size,
                             c_pad=c_pad, norm=norm, with_unc=True,
                             fused=fused, trim_k=0, trim_dynamic=trim,
                             lane_tables=True)
    k_chunks = b // bc
    grid = (l, k_chunks)
    cen_r = cen_t.reshape(l, 3, k_chunks, bc).transpose(0, 2, 1, 3)
    wid_r = widths.reshape(l, k_chunks, 1, bc)
    ru_r = ru[:, None, :]
    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, ndp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bc), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bc), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ndp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ndp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad, 6), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, 1, bc), lambda i, k: (i, k, 0, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((l, k_chunks, 1, bc), jnp.float32)
                   ] * 3,
        interpret=interpret,
    )(consts_lanes[:, None, :], pts_t, cen_r, wid_r, ru_r, w2[:, None, :],
      cells_aug)
    return tuple(o.reshape(l, b)[:, :b0] for o in outs)


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def chem_incomp_kernel(pts_rot, corners, cell_compat, prop_onehot,
                       data_mask, cell_coords, consts, *, size: int,
                       interpret: bool = False):
    """Per-corner incompatibility counts (BnB chem path, zero gathers).

    pts_rot (L,Nd,3), corners (L,Q,3), cell_compat (C,9) f32 0/1,
    prop_onehot (Nd,9) f32 masked one-hot, data_mask (Nd,) -> counts
    (L,Q) f32.  Matches the XLA path of
    bounds/evaluate.chem_corner_values()["incomp"] exactly: the
    incompatibility bit inc(i,j) = mask_i - sum_k onehot[i,k]*H[j,k]
    rides inside the key matmul (see _chem_kernel).
    """
    l, nd, _ = pts_rot.shape
    q = corners.shape[1]
    cells = _pad_cells(cell_coords, size)
    c_pad = cells.shape[0]
    c_real = cell_compat.shape[0]
    ndp = _ceil_to(nd, _LANE)

    # group size g: corners evaluated per aug matmul; 27-group programs
    # (one parent lattice per pop) keep the unroll bounded while the grid
    # stays tiny (round-2's bc~6 divisor chunks cost ~1.5us/program x 288)
    g = 8
    groups_total = -(-q // g)
    gpp = min(groups_total, 27)
    k_chunks = -(-groups_total // gpp)
    bc = gpp * g
    qp = k_chunks * bc

    pts_t = pts_rot.transpose(0, 2, 1)
    cor_t = corners.transpose(0, 2, 1)                       # (l, 3, q)
    if qp != q:
        cor_t = jnp.pad(cor_t, ((0, 0), (0, 0), (0, qp - q)))
    if ndp != nd:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, ndp - nd)))
    # point-side rows of the incompatibility fold: [-onehot*mask; mask]
    # (entries in {-1,0,1} — exact bf16 MXU operands); padded points get
    # all-zero columns -> inc = 0 (never flags).  Cell-side columns:
    # [H (Cp,9) | 1]; padded cells never win the min (parked far by
    # _pad_cells), their columns are harmless zeros/ones.
    del c_real
    aug16, pp = chem_tables(cell_coords, cell_compat, prop_onehot,
                            data_mask, size)                 # (Cp,16),(10,Nd)
    pp = jnp.pad(pp, ((0, 0), (0, ndp - nd)))
    consts8 = jnp.concatenate([consts.astype(jnp.float32),
                               jnp.zeros(3, jnp.float32)])[None, :]

    stride = _pow2_at_least(c_pad)
    kern = functools.partial(_chem_kernel, nd=ndp, bc=bc, g=g, size=size,
                             stride=stride)
    grid = (l, k_chunks)
    cor_r = cor_t.reshape(l, 3, k_chunks, bc).transpose(0, 2, 1, 3)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, ndp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bc), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, 16), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, ndp), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, bc), lambda i, k: (i, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, k_chunks, 1, bc), jnp.float32),
        interpret=interpret,
    )(consts8, pts_t, cor_r, aug16, pp)
    return out.reshape(l, qp)[:, :q]


@functools.partial(jax.jit, static_argnames=("size", "interpret"))
def chem_incomp_kernel_lanes(pts_rot, corners, aug16, pp, consts_lanes, *,
                             size: int, interpret: bool = False):
    """Per-LANE-table variant of chem_incomp_kernel (packed cross-pair
    engine): aug16 (L,Cp,16) = per-pair [_aug_chem | H | 1] columns,
    pp (L,10,Nd) = per-pair [-onehot*mask; mask] rows, consts_lanes (L,8)
    -> counts (L,Q) f32 (same values as chem_incomp_kernel per lane)."""
    l, nd, _ = pts_rot.shape
    q = corners.shape[1]
    c_pad = aug16.shape[1]
    ndp = _ceil_to(nd, _LANE)

    g = 8
    groups_total = -(-q // g)
    gpp = min(groups_total, 27)
    k_chunks = -(-groups_total // gpp)
    bc = gpp * g
    qp = k_chunks * bc

    pts_t = pts_rot.transpose(0, 2, 1)
    cor_t = corners.transpose(0, 2, 1)                       # (l, 3, q)
    if qp != q:
        cor_t = jnp.pad(cor_t, ((0, 0), (0, 0), (0, qp - q)))
    if ndp != nd:
        pts_t = jnp.pad(pts_t, ((0, 0), (0, 0), (0, ndp - nd)))
        pp = jnp.pad(pp, ((0, 0), (0, 0), (0, ndp - nd)))

    stride = _pow2_at_least(c_pad)
    kern = functools.partial(_chem_kernel, nd=ndp, bc=bc, g=g, size=size,
                             stride=stride, lane_tables=True)
    grid = (l, k_chunks)
    cor_r = cor_t.reshape(l, 3, k_chunks, bc).transpose(0, 2, 1, 3)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, ndp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3, bc), lambda i, k: (i, k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_pad, 16), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 10, ndp), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, bc), lambda i, k: (i, k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, k_chunks, 1, bc), jnp.float32),
        interpret=interpret,
    )(consts_lanes[:, None, :], pts_t, cor_r, aug16, pp)
    return out.reshape(l, qp)[:, :q]
