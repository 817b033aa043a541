"""Fused Pallas rollout kernel for batched LQR steering (SURVEY.md C5;
SURVEY.md §7 step 6 "fused rollout+collision"; VERDICT round 3 item 1).

Why a kernel: the XLA lax.scan steer costs ~25 us per horizon step at
B = 8192 regardless of layout — the rk4 dynamics body is a chain of ~30
small ops with stack/concatenate joints that XLA does not fuse into one
loop kernel, so every step round-trips the carry through HBM-backed
buffers (measured round 4, tools/exp_layout_micro.py: H=50 -> 2.1 ms,
H=100 -> 2.8 ms; logical compute is ~0.5 GFLOP).  Here the WHOLE H-step
closed loop runs inside one Pallas program per batch tile: the carry
(state, done, length) lives in VMEM/registers, each step writes one
(n, Bt) slab of the time-major output, and the only HBM traffic is the
inputs once and the rollout outputs once.

Genericity: the per-step math — erf, K-matvec, saturation, dynamics,
feasibility, goal test, the user callbacks vmapped over the trailing lane
axis — is traced once and closure-converted (jax.closure_convert), so any
numpy/jnp constants the callbacks capture (drag coefficients, obstacle
centers, wrench limits...) become explicit kernel inputs automatically.
Any callback built from elementwise jnp ops + small stacks/concats lowers
fine (every shipped model); callbacks Mosaic cannot lower (e.g.
occupancy-grid gathers) fail at build/compile time and callers fall back
to the lax.scan path (core/steer.py layout="tm"), same contract.  The
bench gates hardware equivalence like the NN kernels.

Layout contract (= core/steer.py layout="tm"): inputs batch-leading, edge
outputs TIME-MAJOR — x_seq (H, n, B), u_seq (H, m, B) — matching the tree's
edge storage, so the round stays relayout-free end to end.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (SMEM et al.)

from ...core.steer import SteerResult


def make_steer_pallas(dynamics, erf, is_feasible, horizon_steps: int,
                      dt: float, error_tol, saturate=None, goal_buffer=None,
                      batch_tile: int = 512, unroll: int = 1,
                      interpret: bool = False):
    """Build steer(x0, K, xtar[, goal]) -> SteerResult (time-major outputs).

    ``batch_tile``: candidates per grid program.  VMEM per program ~
    2 * H * (n_pad + m_pad) * batch_tile * 4 bytes with double buffering;
    512 keeps the boat config (H=100) ~7 MB, inside the 16 MiB scoped-VMEM
    budget of this environment's compile path.
    """
    H = int(horizon_steps)
    tol = np.asarray(error_tol, np.float32)
    per_dim = tol.ndim > 0
    gbuf = None if goal_buffer is None else np.asarray(goal_buffer,
                                                       np.float32)

    dynT = jax.vmap(lambda x, u: dynamics(x, u, dt),
                    in_axes=(-1, -1), out_axes=-1)
    erfT = jax.vmap(erf, in_axes=(-1, -1), out_axes=-1)
    feasT = jax.vmap(is_feasible, in_axes=(-1, -1))
    satT = None if saturate is None else jax.vmap(saturate, in_axes=-1,
                                                  out_axes=-1)
    erfgT = None if gbuf is None else jax.vmap(erf, in_axes=(None, -1),
                                               out_axes=-1)

    def converged(e):                       # (n, Bt) -> (Bt,)
        if per_dim:
            return jnp.all(jnp.abs(e) <= tol[:, None], axis=0)
        return jnp.sum(e * e, axis=0) <= float(tol) * float(tol)

    def step_math(x, K, tar, goal, done, length, hit):
        """One closed-loop step on a (·, Bt) lane tile — the whole per-step
        dataflow in one traceable function so closure_convert can hoist the
        callbacks' captured constants into explicit arguments."""
        n = x.shape[0]
        e = erfT(tar, x)
        arrived = converged(e)
        # u = K e as m*n fused multiply-adds on lane vectors (contraction
        # dims are tiny; dot_general would waste the MXU)
        u = K[:, 0, :] * e[0][None, :]
        for j in range(1, n):
            u = u + K[:, j, :] * e[j][None, :]
        if satT is not None:
            u = satT(u)
        xn = dynT(x, u)
        feas = feasT(xn, u)
        commit = jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_and(jnp.logical_not(arrived), feas))
        x_out = jnp.where(commit[None, :], xn, x)
        length = length + commit.astype(jnp.int32)
        done = done | arrived | jnp.logical_not(feas)
        if gbuf is not None:
            hit_step = commit & jnp.all(
                jnp.abs(erfgT(goal, xn)) <= gbuf[:, None], axis=0)
            hit = hit | hit_step
            done = done | hit_step
        return x_out, u, done, length, hit

    def final_reached(x, tar):
        return converged(erfT(tar, x))

    def steer(x0, K, xtar, goal=None):
        B, n = x0.shape
        m = K.shape[1]
        Bt = min(batch_tile, B)
        if B % Bt:
            raise ValueError(f"batch {B} not divisible by tile {Bt}")
        nb = B // Bt
        goal_in = (jnp.zeros((n,), jnp.float32) if goal is None
                   else jnp.asarray(goal, jnp.float32))

        # Hoist every constant the callbacks capture into explicit inputs
        # (Pallas kernels may not close over arrays).  Bools ride as int32.
        ex = (jnp.zeros((n, Bt)), jnp.zeros((m, n, Bt)), jnp.zeros((n, Bt)),
              jnp.zeros((n,)), jnp.zeros((Bt,), bool),
              jnp.zeros((Bt,), jnp.int32), jnp.zeros((Bt,), bool))
        step_pure, consts = jax.closure_convert(step_math, *ex)
        reach_pure, consts_r = jax.closure_convert(
            final_reached, jnp.zeros((n, Bt)), jnp.zeros((n, Bt)))
        all_consts = list(consts) + list(consts_r)
        n_step_consts = len(consts)
        const_dtypes = [c.dtype for c in all_consts]
        const_in = [jnp.atleast_1d(c).astype(
            jnp.int32 if c.dtype == jnp.bool_ else c.dtype)
            for c in all_consts]

        def kernel(goal_ref, x0_ref, K_ref, tar_ref, *refs):
            const_refs = refs[:len(const_in)]
            xs_ref, us_ref, len_ref, xf_ref, reach_ref, hit_ref = \
                refs[len(const_in):]
            cs = [r[:].astype(jnp.bool_) if d == jnp.bool_ else r[:]
                  for r, d in zip(const_refs, const_dtypes)]
            cs = [c.reshape(a.shape) for c, a in zip(cs, all_consts)]
            c_step, c_reach = cs[:n_step_consts], cs[n_step_consts:]
            x0_t = x0_ref[:]
            K_t = K_ref[:]
            tar_t = tar_ref[:]
            goal_t = goal_ref[:]
            Bt_ = x0_t.shape[-1]

            def body(h, carry):
                x, done, length, hit = carry
                x_out, u, done, length, hit = step_pure(
                    x, K_t, tar_t, goal_t, done, length, hit, *c_step)
                xs_ref[pl.ds(h, 1)] = x_out[None]
                us_ref[pl.ds(h, 1)] = u[None]
                return x_out, done, length, hit

            init = (x0_t, jnp.zeros((Bt_,), bool),
                    jnp.zeros((Bt_,), jnp.int32), jnp.zeros((Bt_,), bool))
            x, done, length, hit = jax.lax.fori_loop(0, H, body, init,
                                                     unroll=unroll)
            len_ref[:] = length
            xf_ref[:] = x
            reach_ref[:] = reach_pure(x, tar_t, *c_reach).astype(jnp.int32)
            hit_ref[:] = hit.astype(jnp.int32)

        # batch-trailing device layouts (tiny transposes: (B, n) metadata)
        x0T = x0.T
        tarT = xtar.T
        KT = jnp.transpose(K, (1, 2, 0))

        out_shape = (
            jax.ShapeDtypeStruct((H, n, B), jnp.float32),   # xs
            jax.ShapeDtypeStruct((H, m, B), jnp.float32),   # us
            jax.ShapeDtypeStruct((B,), jnp.int32),          # length
            jax.ShapeDtypeStruct((n, B), jnp.float32),      # xf
            jax.ShapeDtypeStruct((B,), jnp.int32),          # reached
            jax.ShapeDtypeStruct((B,), jnp.int32),          # hit
        )
        rep = [pl.BlockSpec(c.shape, functools.partial(
            lambda nd, i: (0,) * nd, c.ndim)) for c in const_in]
        flops_step = B * (2 * m * n + 40 * n)   # matvec + ~rk4 body
        cost = pl.CostEstimate(
            flops=H * flops_step,
            bytes_accessed=4 * (B * (2 * n + m * n)
                                + H * (n + m) * B + 3 * B),
            transcendentals=H * B * 4)
        xs, us, length, xfT, reached, hit = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((n,), lambda i: (0,)),              # goal
                pl.BlockSpec((n, Bt), lambda i: (0, i)),         # x0T
                pl.BlockSpec((m, n, Bt), lambda i: (0, 0, i)),   # KT
                pl.BlockSpec((n, Bt), lambda i: (0, i)),         # tarT
            ] + rep,
            out_specs=(
                pl.BlockSpec((H, n, Bt), lambda i: (0, 0, i)),
                pl.BlockSpec((H, m, Bt), lambda i: (0, 0, i)),
                pl.BlockSpec((Bt,), lambda i: (i,)),
                pl.BlockSpec((n, Bt), lambda i: (0, i)),
                pl.BlockSpec((Bt,), lambda i: (i,)),
                pl.BlockSpec((Bt,), lambda i: (i,)),
            ),
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(goal_in, x0T, KT, tarT, *const_in)
        mask = (jnp.arange(H, dtype=jnp.int32)[:, None]
                < length[None, :])                     # commits are a prefix
        return SteerResult(xs, us, mask, length, xfT.T,
                           reached.astype(bool), hit.astype(bool))

    return steer
