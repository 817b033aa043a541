"""Fused Pallas distance + argmin kernel for LQR-metric nearest-neighbor.

Reference: Planner._nearest scans the whole node array for the minimizer of
e' S e with e = erf(x_node, xrand) (SURVEY.md C4); BASELINE.json mandates the
TPU replacement: "NN search -> Pallas blocked argmin" / "fused Pallas
distance-kernel over a fixed-capacity SoA tree".

MXU formulation
---------------
For the subtract-erf (optionally with wrapped angle dims), the quadratic cost
is bilinear in per-side features:

    e = x_j - r_b
    cost(b, j) = e' S_j e
               = x_j'S_j x_j  -  2 r_b'(S_j x_j)  +  vec(r_b r_b') . vec(S_j)
               = psi(r_b) . phi(x_j, S_j)

    psi_b = [1,  r_b,  vec(r_b r_b')]             in R^{1 + n + n^2}
    phi_j = [x_j'S_j x_j,  -2 S_j x_j,  vec(S_j)] in R^{1 + n + n^2}

so the entire (B x N) cost matrix is ONE matmul psi @ phi' that runs on the
systolic array, and the kernel fuses the running (min, argmin) over node
blocks in VMEM — the (B, N) cost matrix never touches HBM (at B = 1024,
N = 32768 that is a 128 MB round trip the jnp path cannot avoid).

Wrapped angle dims (the boat's psi, SURVEY.md D3): e_a = wrap(x_a - r_a) is
x_a - (r_a + 2 pi k) for the data-dependent k in {-1, 0, 1} that lands the
difference in [-pi, pi).  The kernel evaluates the three shifted candidate
feature rows (one matmul with 3B rows) and selects per (b, j) by computing
k = round((x_a - r_a) / 2 pi) from the node/candidate angles.  One wrapped
dim is supported (covers every model in the zoo: boat psi, car heading);
other erfs use the jnp path in core/nearest.py.
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
    """Bilinear feature length 1 + n + n^2, padded to the 128-lane boundary."""
    f = 1 + n + n * n
    return -(-f // 128) * 128


def node_features(states, S):
    """phi_j = [x'Sx, -2 Sx, vec(S)] rows, lane-padded: (N, F).

    Recomputed from the SoA tree each call — N * n^2 work, fused by XLA, and
    always consistent with the committed tree (no incremental-update state).
    """
    N, n = states.shape
    Sx = jnp.einsum("nij,nj->ni", S, states)
    xSx = jnp.sum(states * Sx, axis=-1, keepdims=True)
    phi = jnp.concatenate([xSx, -2.0 * Sx, S.reshape(N, n * n)], axis=-1)
    F = feature_dim(n)
    return jnp.pad(phi, ((0, 0), (0, F - phi.shape[-1])))


def cand_features(xrand, n):
    """psi_b = [1, r, vec(r r')] rows, lane-padded: (B, F)."""
    B = xrand.shape[0]
    outer = (xrand[:, :, None] * xrand[:, None, :]).reshape(B, n * n)
    psi = jnp.concatenate(
        [jnp.ones((B, 1), xrand.dtype), xrand, outer], axis=-1)
    F = feature_dim(n)
    return jnp.pad(psi, ((0, 0), (0, F - psi.shape[-1])))


def _nn_kernel(size_ref, psi_ref, phi_ref, cand_ang_ref, node_ang_ref,
               cost_ref, idx_ref, *, blk: int, wrapped: bool):
    """One grid step: block matmul + wrap-select + running argmin merge.

    psi_ref:      ((3 if wrapped else 1) * B, F) candidate features.
    phi_ref:      (blk, F) node-feature block for this grid step.
    cand_ang_ref: (1, B) candidate angles (zeros when not wrapped).
    node_ang_ref: (nblocks, blk) ALL node angles, row-indexed by program_id
                  (whole-array residency: tiny, and TPU block specs require
                  sublane-aligned or full-dim blocks).
    cost/idx:     (B, 1) running best, revisited every grid step.
    """
    i = pl.program_id(0)
    n_shift = 3 if wrapped else 1
    B = psi_ref.shape[0] // n_shift

    @pl.when(i == 0)
    def _():
        cost_ref[:] = jnp.full_like(cost_ref, _INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # ((n_shift*B), F) @ (blk, F)' on the MXU.  HIGHEST precision (multi-pass
    # f32) is required: the bilinear expansion x'Sx - 2r'Sx + r'Sr cancels
    # catastrophically for near nodes, and the TPU's default single-pass
    # bf16 matmul loses the small distances that decide the argmin.
    c_all = jax.lax.dot_general(
        psi_ref[:], phi_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)           # (n_shift*B, blk)

    if wrapped:
        # pick the shift that lands the angle difference in [-pi, pi)
        r_a = cand_ang_ref[0, :]                       # (B,)
        x_a = node_ang_ref[i, :]                       # (blk,)
        k = jnp.round((x_a[None, :] - r_a[:, None]) / _TWO_PI)  # (B, blk)
        c = jnp.where(k <= -1.0, c_all[:B],            # r shifted by -2pi
            jnp.where(k >= 1.0, c_all[2 * B:],         # r shifted by +2pi
                      c_all[B:2 * B]))                 # unshifted
    else:
        c = c_all

    node_idx = i * blk + jax.lax.broadcasted_iota(jnp.int32, (B, blk), 1)
    c = jnp.where(node_idx < size_ref[0], c, _INF)

    bc = jnp.min(c, axis=1, keepdims=True)             # (B, 1)
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
    shifted-candidate selection (see module docstring).
    """
    N, n = states.shape
    B = xrand.shape[0]
    blk = min(block, N)
    assert N % blk == 0, f"capacity {N} not a multiple of block {blk}"
    F = feature_dim(n)
    nblocks = N // blk
    wrapped = wrap_dim is not None

    # Center non-angle dims about the candidate-batch mean: the metric is
    # translation-invariant, and smaller |x|, |r| magnitudes cut the f32
    # cancellation error of the expanded bilinear form by orders of
    # magnitude (cost ~ |x - r|^2 while the expansion's terms ~ |x|^2).
    center = jnp.mean(xrand, axis=0)
    if wrapped:
        center = center.at[wrap_dim].set(0.0)          # keep angles in [-pi, pi)
    states = states - center
    xrand = xrand - center

    phi = node_features(states, S)                     # (N, F)
    if wrapped:
        shift = jnp.zeros((n,), xrand.dtype).at[wrap_dim].set(_TWO_PI)
        psi = jnp.concatenate([
            cand_features(xrand - shift, n),           # k = -1
            cand_features(xrand, n),                   # k =  0
            cand_features(xrand + shift, n)], axis=0)  # k = +1
        cand_ang = xrand[:, wrap_dim][None, :]         # (1, B)
        node_ang = states[:, wrap_dim].reshape(nblocks, blk)
    else:
        psi = cand_features(xrand, n)
        cand_ang = jnp.zeros((1, B), jnp.float32)
        node_ang = jnp.zeros((nblocks, blk), jnp.float32)

    n_shift = 3 if wrapped else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,                         # size
        grid=(nblocks,),
        # index maps take (grid indices..., scalar-prefetch refs...)
        in_specs=[
            pl.BlockSpec((n_shift * B, F), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),     # psi (whole)
            pl.BlockSpec((blk, F), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),     # phi block
            pl.BlockSpec((1, B), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),     # candidate angles
            pl.BlockSpec((nblocks, blk), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),     # all node angles
        ],
        out_specs=[
            pl.BlockSpec((B, 1), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i, s: (0, 0),
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
            flops=2 * n_shift * B * N * F,
            bytes_accessed=(n_shift * B * F + N * F + N) * 4 + B * 8,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(size, jnp.int32).reshape(1), psi, phi, cand_ang, node_ang)

    return idx[:, 0], cost[:, 0]


def make_nearest_pallas(block: int = 1024, wrap_dim: int | None = None,
                        interpret: bool = False):
    """Adapter matching core.nearest.make_nearest's return signature."""
    def nearest(states, S, size, xrand):
        return nearest_pallas(states, S, size, xrand, block=block,
                              wrap_dim=wrap_dim, interpret=interpret)
    return nearest
