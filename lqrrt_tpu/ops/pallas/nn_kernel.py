"""Fused Pallas distance + argmin kernel for LQR-metric nearest-neighbor.

Reference: Planner._nearest scans the whole node array for the minimizer of
e' S e with e = erf(x_node, xrand) (SURVEY.md C4); BASELINE.json mandates the
TPU replacement: "NN search -> Pallas blocked argmin" / "fused Pallas
distance-kernel over a fixed-capacity SoA tree".

MXU formulation
---------------
For the subtract-erf, the quadratic cost is bilinear in per-side features:

    e0 = x_j - r_b
    c0(b, j) = e0' S_j e0
             = x_j'S_j x_j  -  2 r_b'(S_j x_j)  +  vec(r_b r_b') . vec(S_j)
             = psi(r_b) . phi(x_j, S_j)

    psi_b = [1,  r_b,  vec(r_b r_b')]             in R^{1 + n + n^2}
    phi_j = [x_j'S_j x_j,  -2 S_j x_j,  vec(S_j)] in R^{1 + n + n^2}

so the entire (B x N) cost matrix is ONE matmul psi @ phi' that runs on the
systolic array, and the kernel fuses the running (min, argmin) over node
blocks in VMEM — the (B, N) cost matrix never touches HBM (at B = 1024,
N = 32768 that is a 128 MB round trip the jnp path cannot avoid).

Wrapped angle dim (the boat's psi, SURVEY.md D3): the wrapped error is
e = e0 - 2 pi k s_a with the data-dependent shift k = round((x_a - r_a)/2pi)
in {-1, 0, 1} that lands the angle difference in [-pi, pi).  For symmetric S
(cost-to-go matrices are), expanding the quadratic gives a closed-form
correction

    cost(b, j) = c0 - 4 pi k (S_j e0)_a + 4 pi^2 k^2 (S_j)_aa
    (S_j e0)_a = (S_j x_j)_a - S_j[a, :] . r_b      (bilinear again)

so the kernel packs TWO row groups into one matmul — rows [0, B) carry psi
against phi's c0 lanes, rows [B, 2B) carry [1, -r_b] against phi's
[(S x)_a, S[a, :]] lanes — and combines them with the per-(b, j) shift k
computed from the node/candidate angles.  1.5x fewer MXU flops than
evaluating three shifted candidate sets.  One wrapped dim is supported
(covers every model in the zoo: boat psi, car heading, quad yaw); other erfs
use the jnp path in core/nearest.py.

Numerics: the expansion of c0 cancels catastrophically for near nodes, so
the matmul runs at Precision.HIGHEST (multi-pass f32 on the MXU) and all
coordinates are centered about the candidate-batch mean first (the metric is
translation-invariant; centering shrinks the cancelling term magnitudes).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TWO_PI = 2.0 * np.pi
_INF = float(np.inf)  # python scalar: kernels cannot capture device consts


def feature_dim(n: int) -> int:
    """Feature length 1 + n + n^2 (+ 1 + n wrap-correction lanes), padded to
    the 128-lane boundary."""
    f = 1 + n + n * n + 1 + n
    return -(-f // 128) * 128


def node_features(states, S, wrap_dim=None):
    """phi_j rows, lane-padded to (N, F).

    Lanes [0, 1+n+n^2):      [x'Sx, -2 Sx, vec(S)]     -> c0 via psi
    Lanes [1+n+n^2, +1+n):   [(S x)_a, S[a, :]]        -> (S e0)_a via psi2
    """
    N, n = states.shape
    Sx = jnp.einsum("nij,nj->ni", S, states)
    xSx = jnp.sum(states * Sx, axis=-1, keepdims=True)
    parts = [xSx, -2.0 * Sx, S.reshape(N, n * n)]
    if wrap_dim is not None:
        parts += [Sx[:, wrap_dim:wrap_dim + 1], S[:, wrap_dim, :]]
    phi = jnp.concatenate(parts, axis=-1)
    F = feature_dim(n)
    return jnp.pad(phi, ((0, 0), (0, F - phi.shape[-1])))


def cand_features(xrand, n):
    """psi_b = [1, r, vec(r r')] rows (c0 lanes), lane-padded: (B, F)."""
    B = xrand.shape[0]
    outer = (xrand[:, :, None] * xrand[:, None, :]).reshape(B, n * n)
    psi = jnp.concatenate(
        [jnp.ones((B, 1), xrand.dtype), xrand, outer], axis=-1)
    F = feature_dim(n)
    return jnp.pad(psi, ((0, 0), (0, F - psi.shape[-1])))


def cand_corr_features(xrand, n):
    """psi2_b = [1, -r] on the wrap-correction lanes: (B, F)."""
    B = xrand.shape[0]
    base = 1 + n + n * n
    F = feature_dim(n)
    psi2 = jnp.zeros((B, F), xrand.dtype)
    psi2 = psi2.at[:, base].set(1.0)
    psi2 = psi2.at[:, base + 1:base + 1 + n].set(-xrand)
    return psi2


def _nn_kernel(size_ref, psi_ref, psi2_ref, phi_ref, cand_ang_ref,
               node_ang_ref, node_saa_ref, cost_ref, idx_ref, *, blk: int,
               wrapped: bool):
    """One (candidate-tile, node-block) grid step: block matmul + wrap
    correction + running argmin merge.

    Grid is (nb_B, nblocks) with the node axis MINOR, so each candidate
    tile's (cost, idx) output block is revisited across consecutive steps
    (the standard Pallas accumulator pattern).

    psi_ref / psi2_ref: (Bt, F) candidate main / wrap-correction features of
                  THIS candidate tile (psi2 unused when not wrapped).
    phi_ref:      (blk, F) node-feature block for this grid step.
    cand_ang_ref: (1, Bt) candidate angles (zeros when not wrapped).
    node_ang_ref / node_saa_ref: (nblocks, blk) ALL node angles / S_aa,
                  row-indexed by the node program id (whole-array residency:
                  tiny, and TPU block specs need sublane-aligned or full-dim
                  blocks).
    cost/idx:     (Bt, 1) running best for this candidate tile.
    """
    i = pl.program_id(1)                               # node block (minor)
    Bt = psi_ref.shape[0]

    @pl.when(i == 0)
    def _():
        cost_ref[:] = jnp.full_like(cost_ref, _INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # Skip blocks entirely past the live region: early in a replan the tree
    # holds a few hundred nodes of a 32k capacity, so most grid steps do
    # zero compute (the masking below already guarantees correctness for the
    # partially-live boundary block).
    @pl.when(i * blk < size_ref[0])
    def _():
        # (Bt, F) @ (blk, F)' on the MXU.  HIGHEST precision (multi-pass
        # f32) is required: the bilinear expansion x'Sx - 2r'Sx + r'Sr
        # cancels catastrophically for near nodes, and the TPU's default
        # single-pass bf16 matmul loses the small distances that decide the
        # argmin.
        def dot(a):
            return jax.lax.dot_general(
                a, phi_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)   # (Bt, blk)

        c = dot(psi_ref[:])
        if wrapped:
            g = dot(psi2_ref[:])                       # (S e0)_a per pair
            r_a = cand_ang_ref[0, :]                   # (Bt,)
            x_a = node_ang_ref[i, :]                   # (blk,)
            s_aa = node_saa_ref[i, :]                  # (blk,)
            k = jnp.round((x_a[None, :] - r_a[:, None]) / _TWO_PI)
            c = (c - (2.0 * _TWO_PI) * k * g
                 + (_TWO_PI * _TWO_PI) * (k * k) * s_aa[None, :])

        node_idx = i * blk + jax.lax.broadcasted_iota(
            jnp.int32, (Bt, blk), 1)
        c = jnp.where(node_idx < size_ref[0], c, _INF)

        bc = jnp.min(c, axis=1, keepdims=True)         # (Bt, 1)
        bi = (i * blk
              + jnp.argmin(c, axis=1).astype(jnp.int32)[:, None])
        take = bc < cost_ref[:]
        idx_ref[:] = jnp.where(take, bi, idx_ref[:])
        cost_ref[:] = jnp.where(take, bc, cost_ref[:])


@functools.partial(
    jax.jit, static_argnames=("block", "wrap_dim", "interpret"))
def nearest_pallas(states, S, size, xrand, *, block: int = 1024,
                   wrap_dim: int | None = None, interpret: bool = False):
    """Fused nearest(states, S, size, xrand) -> (ids, costs).

    states: (N, n); S: (N, n, n); size: () int; xrand: (B, n).
    N must be a multiple of ``block``; invalid rows (>= size) are masked in
    the kernel.  ``wrap_dim``: optional single angle dim handled exactly via
    the closed-form shift correction (see module docstring; assumes S
    symmetric, as LQR cost-to-go matrices are).
    """
    N, n = states.shape
    B = xrand.shape[0]
    wrapped = wrap_dim is not None
    # 2-D tiling keeps per-step VMEM bounded for any batch/capacity: the
    # candidate axis tiles at Bt <= 1024 and the node axis at blk <= block,
    # so the live buffers (two (Bt, blk) cost planes + features) stay a few
    # MB regardless of problem size.
    def pick(total, base, cap):
        cands = [b for b in (base << i for i in range(16))
                 if b <= total and total % b == 0] or [total]
        fitting = [b for b in cands if b <= cap]
        return max(fitting) if fitting else min(cands)

    blk = pick(N, 128, block)
    # Cap the (Bt, blk) tile product: the kernel body stacks several f32/i32
    # (Bt, blk) temporaries (cost + wrap-correction planes, index iota,
    # masked select) in scoped VMEM, and real-TPU compiles enforce a 16 MiB
    # limit that interpret mode never checks — at blk=2048, Bt=1024 the stack
    # hits 22.3 MiB and compilation fails (observed on v5e).  512*1024 keeps
    # the MXU matmul shapes ample while staying well under the limit.
    Bt = pick(B, 8, min(1024, max(512 * 1024 // blk, 8)))
    assert N % blk == 0 and B % Bt == 0, (N, blk, B, Bt)
    F = feature_dim(n)
    nblocks = N // blk
    nb_B = B // Bt

    # Center non-angle dims about the candidate-batch mean: the metric is
    # translation-invariant, and smaller |x|, |r| magnitudes cut the f32
    # cancellation error of the expanded bilinear form by orders of
    # magnitude (cost ~ |x - r|^2 while the expansion's terms ~ |x|^2).
    center = jnp.mean(xrand, axis=0)
    if wrapped:
        center = center.at[wrap_dim].set(0.0)          # keep angles in [-pi, pi)
    states = states - center
    xrand = xrand - center

    phi = node_features(states, S, wrap_dim)           # (N, F)
    psi = cand_features(xrand, n)                      # (B, F)
    if wrapped:
        psi2 = cand_corr_features(xrand, n)            # (B, F)
        cand_ang = xrand[:, wrap_dim][None, :]         # (1, B)
        node_ang = states[:, wrap_dim].reshape(nblocks, blk)
        node_saa = S[:, wrap_dim, wrap_dim].reshape(nblocks, blk)
    else:
        psi2 = jnp.zeros((8, F), jnp.float32)          # placeholder operand
        cand_ang = jnp.zeros((1, B), jnp.float32)
        node_ang = jnp.zeros((nblocks, blk), jnp.float32)
        node_saa = jnp.zeros((nblocks, blk), jnp.float32)

    psi2_bt = Bt if wrapped else 8
    n_grp = 2 if wrapped else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                         # size
        # node axis MINOR: each candidate tile's output block accumulates
        # across consecutive node-block steps
        grid=(nb_B, nblocks),
        # index maps take (grid indices..., scalar-prefetch refs...)
        in_specs=[
            pl.BlockSpec((Bt, F), lambda j, i, s: (j, 0),
                         memory_space=pltpu.VMEM),     # psi tile
            pl.BlockSpec((psi2_bt, F), lambda j, i, s: (j if wrapped else 0,
                                                        0),
                         memory_space=pltpu.VMEM),     # psi2 tile
            pl.BlockSpec((blk, F), lambda j, i, s: (i, 0),
                         memory_space=pltpu.VMEM),     # phi block
            pl.BlockSpec((1, Bt), lambda j, i, s: (0, j),
                         memory_space=pltpu.VMEM),     # candidate angles
            pl.BlockSpec((nblocks, blk), lambda j, i, s: (0, 0),
                         memory_space=pltpu.VMEM),     # all node angles
            pl.BlockSpec((nblocks, blk), lambda j, i, s: (0, 0),
                         memory_space=pltpu.VMEM),     # all node S_aa
        ],
        out_specs=[
            pl.BlockSpec((Bt, 1), lambda j, i, s: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), lambda j, i, s: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    cost, idx = pl.pallas_call(
        functools.partial(_nn_kernel, blk=blk, wrapped=wrapped),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_grp * B * N * F,
            bytes_accessed=(n_grp * B * F + nb_B * N * F + 2 * N) * 4
            + B * 8,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(size, jnp.int32).reshape(1), psi, psi2, phi, cand_ang,
      node_ang, node_saa)

    return idx[:, 0], cost[:, 0]


def make_nearest_pallas(block: int = 1024, wrap_dim: int | None = None,
                        interpret: bool = False):
    """Adapter matching core.nearest.make_nearest's return signature."""
    def nearest(states, S, size, xrand):
        return nearest_pallas(states, S, size, xrand, block=block,
                              wrap_dim=wrap_dim, interpret=interpret)
    return nearest


# ---------------------------------------------------------------------------
# Constant-S specialization: MXU split-compensated distance kernel
# ---------------------------------------------------------------------------
#
# When the user's lqr(x, u) is state-independent (one cost-to-go S for the
# whole tree — the reference's own boat/double-integrator demos precompute a
# single CARE solution, SURVEY.md section 2.2), the metric factorizes through
# the Cholesky whitening S = L L':
#
#     cost(b, j) = (x_j - r_b)' S (x_j - r_b) = ||z_j - w_b||^2,
#     z = x L,  w = r L                                  (whitened coords)
#
# and the wrapped-angle correction collapses to RANK-1 (separable) terms:
# with e = e0 - 2 pi k u_a (u_a the one-hot angle axis) and p = (S x)_a,
# q = (S r)_a,
#
#     cost = ||z - w||^2 - 4 pi k (p_j - q_b) + 4 pi^2 k^2 S_aa.
#
# Implementation (round 5): the per-candidate-constant |w|^2 is dropped
# inside the kernel (it cannot change the argmin; added back to the returned
# cost), so the per-pair cost is BILINEAR:  c = |z_j|^2 - 2 w_b . z_j =
# psi_b . phi_j with psi = [1, w], phi = [|z|^2, -2 z] — one K=(1+n) matmul
# per tile on the MXU.  Round-4's kernel evaluated direct whitened diffs on
# the VPU instead (exact, zero cancellation) but was VPU-BOUND at ~29
# ops/pair = 2.9 ms composed at B = 8192, N = 40960 (exp_nn_hybrid_v5.py);
# moving the distance to the MXU leaves only the wrap correction + argmin on
# the VPU (~12 ops/pair) at 1.45 ms — 2x — at bench shapes.
#
# Precision: a plain bf16 MXU pass loses the argmin (id_match 0.41 vs the
# f32 reference); Precision.HIGHEST (6-pass) is exact but eats the gain
# (2.8 ms composed — no better than the VPU kernel it replaces).  We use a
# 3-way SPLIT-COMPENSATED product: each operand splits into bf16 chunks
# a = h + m + l (8 mantissa bits each, 24 total = full f32), and the six
# product groups whose magnitude exceeds 2^-24 —
#     hH + (hM + mH) + (hL + mM + lH)
# — are evaluated as a SINGLE K-stacked matmul
#     [h, h, m, h, m, l] @ [H; M; H; L; M; H]     (K = 6(1+n))
# K pads to the MXU's native 128 anyway, so this costs the same as one
# bf16 pass while matching f32 numerics (error ~2^-24 relative; measured
# id_match vs the f32 reference identical to Precision.HIGHEST on
# boat-scale data, at DEFAULT-pass speed — tools/exp_nn_hybrid_v5.py).
# CAVEAT: the splits must be built with integer mantissa masking — this
# backend forces --xla_allow_excess_precision=true, which folds the plain
# f32(bf16(a)) convert pair back to `a` and silently collapses the
# compensation (measured: identical results to the bf16 pass).
#
# Dead rows (>= size) are masked by POISONING the |z|^2 feature in prep
# (1e30), which survives the matmul and can never win the argmin — no
# per-pair index masking on the VPU.


_POISON = 1e30


def _bf16_round(a):
    """Round-to-nearest-even bf16 of f32 ``a`` via integer ops (immune to
    the excess-precision rewrite, see module comment).  Returned as f32,
    exactly bf16-representable, so the MXU's operand truncation is lossless
    on it."""
    ai = jax.lax.bitcast_convert_type(a, jnp.uint32)
    rounded = ai + 0x7FFF + ((ai >> 16) & 1)
    return jax.lax.bitcast_convert_type(rounded & jnp.uint32(0xFFFF0000),
                                        jnp.float32)


def _bf16_split3(a):
    """a == h + m + l with each part exactly bf16-representable (8 mantissa
    bits per chunk, 24 total = full f32 coverage)."""
    h = _bf16_round(a)
    r = a - h
    m = _bf16_round(r)
    return h, m, r - m


def _nn_const_kernel(size_ref, saa_ref, nodeT_ref, cand_ref, cost_ref,
                     idx_ref, *, blk: int, KS: int, wrapped: bool):
    """One (candidate-tile, node-block) grid step of the constant-S kernel.

    nodeT_ref: (R, blk) node block; rows [0, KS) = K-stacked split node
               features [H; M; H; L; M; H], row KS = node angle x_a, row
               KS+1 = P = -4 pi (S x)_a.
    cand_ref:  (Bt, 128) candidate tile; cols [0, KS) = K-stacked split
               candidate features [h, h, m, h, m, l], col KS = r_a, col
               KS+1 = Q = +4 pi (S r)_a.
    cost/idx:  (Bt, 1) running best for this candidate tile (node axis
               minor).
    """
    i = pl.program_id(1)
    Bt = cand_ref.shape[0]

    @pl.when(i == 0)
    def _():
        cost_ref[:] = jnp.full_like(cost_ref, _POISON * 8.0)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    @pl.when(i * blk < size_ref[0])
    def _():
        c = jax.lax.dot_general(
            cand_ref[:, 0:KS], nodeT_ref[0:KS, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)        # (Bt, blk)
        if wrapped:
            x_a = nodeT_ref[KS:KS + 1, :]              # (1, blk)
            P = nodeT_ref[KS + 1:KS + 2, :]            # (1, blk)
            r_a = cand_ref[:, KS:KS + 1]               # (Bt, 1)
            Q = cand_ref[:, KS + 1:KS + 2]             # (Bt, 1)
            k = jnp.round((x_a - r_a) * (1.0 / _TWO_PI))
            c = c + k * (P + Q) + (_TWO_PI * _TWO_PI * saa_ref[0]) * (k * k)

        bc = jnp.min(c, axis=1, keepdims=True)
        io = jax.lax.broadcasted_iota(jnp.int32, (Bt, blk), 1)
        bi = i * blk + jnp.min(jnp.where(c == bc, io, blk),
                               axis=1, keepdims=True)
        take = bc < cost_ref[:]
        idx_ref[:] = jnp.where(take, bi, idx_ref[:])
        cost_ref[:] = jnp.where(take, bc, cost_ref[:])


@functools.partial(
    jax.jit, static_argnames=("block", "wrap_dim", "interpret"))
def nearest_const_pallas(states, S, size, xrand, *, block: int = 1024,
                         wrap_dim: int | None = None,
                         interpret: bool = False):
    """Fused nearest for a CONSTANT metric: (states, S, size, xrand) ->
    (ids, costs).  Same contract as ``nearest_pallas`` except only S[0] (or a
    single (n, n) S) is used — every live node must share it (the planner
    auto-detects this by probing the user's lqr, planner.py nn_impl="auto").
    """
    N, n = states.shape
    B = xrand.shape[0]
    wrapped = wrap_dim is not None
    if S.ndim == 3:
        S = S[0]
    F = 1 + n                                          # bilinear K dim
    KS = 6 * F                                         # stacked split K
    if KS + 2 > 128:
        raise ValueError(f"nstates={n} too large for the K-stacked const "
                         "NN kernel (6(1+n)+2 must fit 128 lanes)")
    # tiny jitter keeps chol defined for merely PSD cost-to-go matrices
    L = jnp.linalg.cholesky(S + 1e-9 * jnp.eye(n, dtype=S.dtype))

    def pick(total, base, cap):
        cands = [b for b in (base << i for i in range(16))
                 if b <= total and total % b == 0] or [total]
        fitting = [b for b in cands if b <= cap]
        return max(fitting) if fitting else min(cands)

    blk = pick(N, 128, block)
    # Scoped-VMEM budget: the kernel body materializes several (Bt, blk)
    # f32/i32 temporaries (cost plane, wrap correction, argmin iota); at
    # Bt = blk = 1024 those stack past the 16 MiB scoped-vmem limit on
    # real-TPU compiles (interpret mode on CPU never checks it — bench.py's
    # pallas_equiv gate does).  Capping Bt*blk <= 512*1024 keeps the stack
    # comfortably under budget at no measurable throughput cost.
    Bt = pick(B, 8, min(1024, max(512 * 1024 // blk, 8)))
    assert N % blk == 0 and B % Bt == 0, (N, blk, B, Bt)
    nblocks = N // blk
    nb_B = B // Bt

    # Center about the candidate mean (the metric is translation-invariant):
    # shrinks |z|^2 / |w.z| term magnitudes, which bounds the absolute error
    # of the split-compensated bilinear expansion (~2^-17 relative).
    center = jnp.mean(xrand, axis=0)
    if wrapped:
        center = center.at[wrap_dim].set(0.0)          # angles stay wrapped
    statesc = states - center
    xrandc = xrand - center

    # HIGHEST on the O(N n^2) prep matmuls — negligible next to the kernel.
    PHI = jax.lax.Precision.HIGHEST
    z = jnp.dot(statesc, L, precision=PHI)             # (N, n) whitened
    w = jnp.dot(xrandc, L, precision=PHI)              # (B, n)
    z2 = jnp.sum(z * z, axis=-1)                       # (N,)
    live = jnp.arange(N) < size

    # Buffer assembly is ONE concatenate per side: building the (R, N) /
    # (B, 128) operands with ~8 .at[].set passes instead costs ~0.45 ms of
    # extra per-call prep at bench shapes (measured round 5) — the dominant
    # term for small live sizes, where the restart chunk spends most rounds.
    phi = jnp.concatenate(
        [jnp.where(live, z2, _POISON)[None, :], -2.0 * z.T], axis=0)
    phi_h, phi_m, phi_l = _bf16_split3(phi)
    psi = jnp.concatenate([jnp.ones((B, 1), jnp.float32), w], axis=1)
    psi_h, psi_m, psi_l = _bf16_split3(psi)

    # product groups hH + (hM + mH) + (hL + mM + lH); see module comment
    cand_groups = [psi_h, psi_h, psi_m, psi_h, psi_m, psi_l]
    node_groups = [phi_h, phi_m, phi_h, phi_l, phi_m, phi_h]

    R = -(-(KS + 2) // 8) * 8                          # sublane-pad
    if wrapped:
        Sa = S[wrap_dim, :]
        node_groups += [statesc[None, :, wrap_dim],
                        (-2.0 * _TWO_PI
                         * jnp.dot(statesc, Sa, precision=PHI))[None, :]]
        cand_groups += [xrandc[:, wrap_dim][:, None],
                        (2.0 * _TWO_PI
                         * jnp.dot(xrandc, Sa, precision=PHI))[:, None]]
        saa = S[wrap_dim, wrap_dim].reshape(1)
    else:
        node_groups += [jnp.zeros((2, N), jnp.float32)]
        cand_groups += [jnp.zeros((B, 2), jnp.float32)]
        saa = jnp.zeros((1,), jnp.float32)
    nodeT = jnp.concatenate(
        node_groups + [jnp.zeros((R - KS - 2, N), jnp.float32)], axis=0)
    cand = jnp.concatenate(
        cand_groups + [jnp.zeros((B, 128 - KS - 2), jnp.float32)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                         # size, S_aa
        grid=(nb_B, nblocks),                          # node axis MINOR
        in_specs=[
            pl.BlockSpec((R, blk), lambda j, i, s, a: (0, i),
                         memory_space=pltpu.VMEM),     # nodeT block
            pl.BlockSpec((Bt, 128), lambda j, i, s, a: (j, 0),
                         memory_space=pltpu.VMEM),     # cand tile
        ],
        out_specs=[
            pl.BlockSpec((Bt, 1), lambda j, i, s, a: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, 1), lambda j, i, s, a: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    cost, idx = pl.pallas_call(
        functools.partial(_nn_const_kernel, blk=blk, KS=KS,
                          wrapped=wrapped),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * KS + (12 if wrapped else 4) * B * N,
            bytes_accessed=(R * N + B * 128) * 4 + B * 8,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(size, jnp.int32).reshape(1),
      jnp.asarray(saa, jnp.float32), nodeT, cand)

    # |w|^2 is constant per candidate (cannot affect the argmin); add it
    # back so the returned cost is the true metric value.
    w2 = jnp.sum(w * w, axis=-1)
    return idx[:, 0], cost[:, 0] + w2


def make_nearest_const_pallas(block: int = 1024, wrap_dim: int | None = None,
                              interpret: bool = False):
    """Adapter matching core.nearest.make_nearest's return signature."""
    def nearest(states, S, size, xrand):
        return nearest_const_pallas(states, S, size, xrand, block=block,
                                    wrap_dim=wrap_dim, interpret=interpret)
    return nearest
