"""EXPERIMENTAL APPARATUS (moved out of the package in round 5).

Round-4 history: this fused Pallas rollout kernel was believed to run the
boat steer at 0.07 ms vs 3.0 ms for the lax.scan standalone, with a ~300x
"composition pessimization" blocking production use.  Round 5 re-timed it
with a synchronizing harness (this backend dispatches asynchronously and
block_until_ready does NOT synchronize — only a device fetch does) and found
BOTH numbers were artifacts: the kernel costs ~22.5 ms in EVERY regime
(entry-param operands, small carries, big carries; exp_steer_v5.json), i.e.
~60x its compute roofline, while the scan steer costs 1.39 ms composed.

Stage bisection (tools/exp_steer_stages_v5.py): the vmapped rk4 boat
dynamics alone cost +17.7 ms inside the kernel, while the same math
hand-written with 2-D row slices cost 1.43 ms — `jax.vmap(f, in_axes=-1)`
of per-vector user callbacks produces 1-D (Bt,) intermediates that Mosaic
lowers catastrophically.  A generic double-vmap repair (>= 2-D
intermediates everywhere, tools/exp_steer_dv_v5.py) fails to compile on
this backend; even if repaired, the projected floor (~1.0-1.4 ms from the
hand-rows measurement plus the scaffold floor) only TIES the scan.  Per
VERDICT r4 next-item 1 route (c), the scan remains the production steer and
this kernel is retained here, outside the package, as measured evidence.
"""

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

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lqrrt_tpu.core.steer import SteerResult  # noqa: E402


def make_steer_pallas(dynamics, erf, is_feasible, horizon_steps: int,
                      dt: float, error_tol, saturate=None, goal_buffer=None,
                      batch_tile: int = 512, unroll: int = 1,
                      interpret: bool = False):
    """Build steer(x0, K, xtar[, goal]) -> SteerResult (time-major outputs).

    ``batch_tile``: candidates per grid program.  VMEM per program ~
    2 * H * (n_pad + m_pad) * batch_tile * 4 bytes with double buffering;
    512 keeps the boat config (H=100) ~7 MB, inside the 16 MiB scoped-VMEM
    budget of this environment's compile path.

    ``unroll``: Mosaic's fori_loop supports only 1 (rolled) or the full trip
    count (fully unrolled).
    """
    H = int(horizon_steps)
    if unroll not in (1, H):
        raise ValueError(f"unroll must be 1 or horizon_steps={H}")
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

    def converged(e):                       # (n, Bt) -> (1, Bt) bool
        # keepdims + 2-D masks throughout: Mosaic fails to legalize scf.for
        # over 1-D/bool carried vectors on this backend
        # (tools/dbg_steer_scaffold.py)
        if per_dim:
            return jnp.all(jnp.abs(e) <= tol[:, None], axis=0, keepdims=True)
        return jnp.sum(e * e, axis=0, keepdims=True) <= float(tol) * float(tol)

    def step_math(x, K, tar, goal, done_i, length, hit_i):
        """One closed-loop step on a (·, Bt) lane tile — the whole per-step
        dataflow in one traceable function so the jaxpr-level hoist can turn
        the callbacks' captured constants into explicit arguments.

        Loop-carried masks are (1, Bt) int32 (done_i, hit_i) and (1, Bt)
        int32 length; bools exist only as intra-step temporaries."""
        n = x.shape[0]
        e = erfT(tar, x)
        arrived = converged(e)                         # (1, Bt) bool
        # u = K e as m*n fused multiply-adds on lane vectors (contraction
        # dims are tiny; dot_general would waste the MXU)
        u = K[:, 0, :] * e[0][None, :]
        for j in range(1, n):
            u = u + K[:, j, :] * e[j][None, :]
        if satT is not None:
            u = satT(u)
        xn = dynT(x, u)
        feas = feasT(xn, u)[None, :]                   # (1, Bt) bool
        done = done_i > 0
        commit = jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_and(jnp.logical_not(arrived), feas))
        x_out = jnp.where(commit, xn, x)
        length = length + commit.astype(jnp.int32)
        done = done | arrived | jnp.logical_not(feas)
        hit = hit_i > 0
        if gbuf is not None:
            hit_step = commit & jnp.all(
                jnp.abs(erfgT(goal, xn)) <= gbuf[:, None], axis=0,
                keepdims=True)
            hit = hit | hit_step
            done = done | hit_step
        return (x_out, u, done.astype(jnp.int32), length,
                hit.astype(jnp.int32))

    def final_reached(x, tar):
        return converged(erfT(tar, x))

    def steer(x0, K, xtar, goal=None):
        import math
        B, n = x0.shape
        m = K.shape[1]
        # largest tile <= batch_tile that divides B (each distinct B is a
        # fresh trace anyway, so the per-call computation is free)
        Bt = math.gcd(B, batch_tile) if B % min(batch_tile, B) \
            else min(batch_tile, B)
        nb = B // Bt
        goal_in = (jnp.zeros((1, n), jnp.float32) if goal is None
                   else jnp.asarray(goal, jnp.float32)[None, :])

        # Hoist every constant the callbacks capture into explicit inputs
        # (Pallas kernels may not close over arrays; jax.closure_convert
        # hoists only perturbed/traced consts, so concrete numpy model
        # constants need a manual jaxpr-level hoist).  Bools ride as int32.
        def hoist(fun, *ex):
            closed = jax.make_jaxpr(fun)(*ex)
            jaxpr, cs = closed.jaxpr, closed.consts
            n_args = len(ex)

            def pure(*args_and_consts):
                args = args_and_consts[:n_args]
                consts = args_and_consts[n_args:]
                out = jax.core.eval_jaxpr(jaxpr, consts, *args)
                return tuple(out) if len(out) > 1 else out[0]

            return pure, [jnp.asarray(c) for c in cs]

        ex = (jnp.zeros((n, Bt)), jnp.zeros((m, n, Bt)), jnp.zeros((n, Bt)),
              jnp.zeros((n,)), jnp.zeros((1, Bt), jnp.int32),
              jnp.zeros((1, Bt), jnp.int32), jnp.zeros((1, Bt), jnp.int32))
        step_pure, consts = hoist(step_math, *ex)
        reach_pure, consts_r = hoist(
            final_reached, jnp.zeros((n, Bt)), jnp.zeros((n, Bt)))
        all_consts = list(consts) + list(consts_r)
        n_step_consts = len(consts)
        # Constant handling: custom-call operands cost ~0.4 ms EACH on this
        # backend (dbg P8: 16 small const operands -> 6.6 ms; derived big
        # tensors are free) — so CONCRETE consts are NOT passed as operands
        # at all.  They are re-materialized inside the kernel from python
        # scalar literals, each multiplied by an input-derived 1.0 so the
        # result is a computed value rather than a (forbidden) captured
        # array constant.  Only TRACER consts (e.g. dynamic-obstacle data
        # threaded as a traced chunk argument) remain operands — those take
        # the fast derived-operand path.  ~50 scalar ops at trace time for
        # every shipped model; refuse absurd embeddings.
        is_trc = [isinstance(c, jax.core.Tracer) for c in all_consts]
        for c, trc in zip(all_consts, is_trc):
            if not trc and np.asarray(c).size > 4096:
                raise ValueError(
                    f"captured constant of {np.asarray(c).size} elements is "
                    "too large to embed in the rollout kernel")
        op_consts = [c for c, trc in zip(all_consts, is_trc) if trc]
        const_dtypes = [c.dtype for c in op_consts]
        # every operand >= 2-D: 1-D custom-call operands ALSO trigger the
        # pessimized-executable path on this backend (dbg: "D param(1d in)"
        # 84 ms vs 2-D 0.095 ms); originals are restored by reshape inside
        const_in = [jnp.atleast_2d(c).astype(
            jnp.int32 if c.dtype == jnp.bool_ else c.dtype)
            for c in op_consts]

        def kernel(s_ref, goal_ref, x0_ref, K_ref, tar_ref, *refs):
            del s_ref          # dummy scalar-prefetch (see pallas_call note)
            const_refs = refs[:len(const_in)]
            xs_ref, us_ref, len_ref, xf_ref, reach_ref, hit_ref = \
                refs[len(const_in):]
            x0_t = x0_ref[:]
            one = x0_t[0, 0] * 0.0 + 1.0   # input-derived 1.0 (no folding)

            def embed(arr):
                a = np.asarray(arr)
                flat = [jnp.float32(float(v)) * one
                        for v in a.astype(np.float64).ravel().tolist()]
                out = jnp.stack(flat).reshape(a.shape)
                if a.dtype == np.bool_:
                    return out > 0.5
                return out.astype(a.dtype)

            traced_cs = [r[:].astype(jnp.bool_) if d == jnp.bool_ else r[:]
                         for r, d in zip(const_refs, const_dtypes)]
            traced_cs = [c.reshape(a.shape)
                         for c, a in zip(traced_cs, op_consts)]
            it = iter(traced_cs)
            cs = [next(it) if trc else embed(c)
                  for c, trc in zip(all_consts, is_trc)]
            c_step, c_reach = cs[:n_step_consts], cs[n_step_consts:]
            K_t = K_ref[:]
            tar_t = tar_ref[:]
            goal_t = goal_ref[:].reshape((goal_ref.shape[1],))
            Bt_ = x0_t.shape[-1]


            def body(h, carry):
                x, done, length, hit = carry
                x_out, u, done, length, hit = step_pure(
                    x, K_t, tar_t, goal_t, done, length, hit, *c_step)
                xs_ref[pl.ds(h, 1)] = x_out[None]
                us_ref[pl.ds(h, 1)] = u[None]
                return x_out, done, length, hit

            init = (x0_t, jnp.zeros((1, Bt_), jnp.int32),
                    jnp.zeros((1, Bt_), jnp.int32),
                    jnp.zeros((1, Bt_), jnp.int32))
            x, done, length, hit = jax.lax.fori_loop(0, H, body, init,
                                                     unroll=unroll)
            # per-candidate outputs are (1, Bt) blocks: Mosaic rejects 1-D
            # OUTPUT blocks on this backend (1-D inputs are fine) —
            # tools/dbg_steer_scaffold.py stages D/E
            len_ref[:] = length
            xf_ref[:] = x
            reach_ref[:] = reach_pure(x, tar_t, *c_reach).astype(jnp.int32)
            hit_ref[:] = hit

        # batch-trailing device layouts (tiny transposes: (B, n) metadata)
        x0T = x0.T
        tarT = xtar.T
        KT = jnp.transpose(K, (1, 2, 0))

        out_shape = (
            jax.ShapeDtypeStruct((H, n, B), jnp.float32),   # xs
            jax.ShapeDtypeStruct((H, m, B), jnp.float32),   # us
            jax.ShapeDtypeStruct((1, B), jnp.int32),        # length
            jax.ShapeDtypeStruct((n, B), jnp.float32),      # xf
            jax.ShapeDtypeStruct((1, B), jnp.int32),        # reached
            jax.ShapeDtypeStruct((1, B), jnp.int32),        # hit
        )
        rep = [pl.BlockSpec(c.shape, functools.partial(
            lambda nd, i, s: (0,) * nd, c.ndim),
            memory_space=pltpu.VMEM) for c in const_in]
        flops_step = B * (2 * m * n + 40 * n)   # matvec + ~rk4 body
        cost = pl.CostEstimate(
            flops=H * flops_step,
            bytes_accessed=4 * (B * (2 * n + m * n)
                                + H * (n + m) * B + 3 * B),
            transcendentals=H * B * 4)
        # PrefetchScalarGridSpec (with a dummy scalar-prefetch operand) is
        # LOAD-BEARING on this backend: a plain grid= pallas_call compiles
        # to a ~400x-pessimized executable whenever any operand is an
        # internal value (fusion output / constant) rather than an entry
        # parameter — i.e. always, inside a fused round.  The prefetch grid
        # spec takes the fast path for derived operands (measured round 4:
        # 49 ms -> 0.057 ms for the identical kernel; same phenomenon class
        # as the round-3 batched-LU pessimization).
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, n), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),           # goal
                pl.BlockSpec((n, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),           # x0T
                pl.BlockSpec((m, n, Bt), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),           # KT
                pl.BlockSpec((n, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),           # tarT
            ] + rep,
            out_specs=(
                pl.BlockSpec((H, n, Bt), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, m, Bt), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        )
        xs, us, length, xfT, reached, hit = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.zeros((1,), jnp.int32), goal_in, x0T, KT, tarT, *const_in)
        length = length[0]
        reached = reached[0]
        hit = hit[0]
        mask = (jnp.arange(H, dtype=jnp.int32)[:, None]
                < length[None, :])                     # commits are a prefix
        return SteerResult(xs, us, mask, length, xfT.T,
                           reached.astype(bool), hit.astype(bool))

    return steer


def make_steer_pallas_tree(dynamics, erf, is_feasible, horizon_steps: int,
                           dt: float, error_tol, saturate=None,
                           goal_buffer=None, batch_tile: int = 512,
                           node_block: int = 1024, interpret: bool = False):
    """Rollout kernel with the parent gather INSIDE the kernel.

    steer(states, K, pids, xtar[, goal]) -> SteerResult (time-major), where
    ``states`` (N, n) and ``K`` (N, m, n) are the TREE buffers themselves.

    Why: operands GATHERED from a loop-carried buffer put the whole
    executable on this backend's ~25 ms pessimized path, but the carried
    buffers passed DIRECTLY are fast (see module docstring / round-4
    bisection).  So the per-candidate x0/K0 rows are gathered in-kernel
    with a blocked ONE-HOT MATMUL over node blocks (Mosaic has no dynamic
    lane indexing; the one-hot contraction runs on the MXU and costs ~0.2
    ms at bench shapes) and the rollout proceeds exactly like
    make_steer_pallas.
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

    def converged(e):
        if per_dim:
            return jnp.all(jnp.abs(e) <= tol[:, None], axis=0, keepdims=True)
        return jnp.sum(e * e, axis=0, keepdims=True) <= float(tol) * float(tol)

    def step_math(x, Kflat, tar, goal, done_i, length, hit_i):
        """Identical closed-loop step to make_steer_pallas.step_math, with
        K delivered as gathered flat rows in j-MAJOR order (row j*m + i =
        K[i, j]) so the per-j slices are contiguous — strided row slices
        lower as (unsupported) gathers in Mosaic."""
        n = x.shape[0]
        m = Kflat.shape[0] // n
        e = erfT(tar, x)
        arrived = converged(e)
        u = Kflat[0:m, :] * e[0][None, :]
        for j in range(1, n):
            u = u + Kflat[j * m:(j + 1) * m, :] * e[j][None, :]
        if satT is not None:
            u = satT(u)
        xn = dynT(x, u)
        feas = feasT(xn, u)[None, :]
        done = done_i > 0
        commit = jnp.logical_and(
            jnp.logical_not(done),
            jnp.logical_and(jnp.logical_not(arrived), feas))
        x_out = jnp.where(commit, xn, x)
        length = length + commit.astype(jnp.int32)
        done = done | arrived | jnp.logical_not(feas)
        hit = hit_i > 0
        if gbuf is not None:
            hit_step = commit & jnp.all(
                jnp.abs(erfgT(goal, xn)) <= gbuf[:, None], axis=0,
                keepdims=True)
            hit = hit | hit_step
            done = done | hit_step
        return (x_out, u, done.astype(jnp.int32), length,
                hit.astype(jnp.int32))

    def final_reached(x, tar):
        return converged(erfT(tar, x))

    def steer(states, K, pids, xtar, goal=None):
        import math
        N, n = states.shape
        m = K.shape[1]
        B = pids.shape[0]
        Bt = math.gcd(B, batch_tile) if B % min(batch_tile, B) \
            else min(batch_tile, B)
        nb = B // Bt
        NB = min(node_block, N)
        if N % NB:
            raise ValueError(f"tree rows {N} not divisible by node block "
                             f"{NB}")
        n_nblk = N // NB
        goal_in = (jnp.zeros((1, n), jnp.float32) if goal is None
                   else jnp.asarray(goal, jnp.float32)[None, :])

        def hoist(fun, *ex):
            closed = jax.make_jaxpr(fun)(*ex)
            jaxpr, cs = closed.jaxpr, closed.consts
            n_args = len(ex)

            def pure(*ac):
                out = jax.core.eval_jaxpr(jaxpr, ac[n_args:], *ac[:n_args])
                return tuple(out) if len(out) > 1 else out[0]
            return pure, [jnp.asarray(c) for c in cs]

        ex = (jnp.zeros((n, Bt)), jnp.zeros((m * n, Bt)), jnp.zeros((n, Bt)),
              jnp.zeros((n,)), jnp.zeros((1, Bt), jnp.int32),
              jnp.zeros((1, Bt), jnp.int32), jnp.zeros((1, Bt), jnp.int32))
        step_pure, consts = hoist(step_math, *ex)
        reach_pure, consts_r = hoist(
            final_reached, jnp.zeros((n, Bt)), jnp.zeros((n, Bt)))
        all_consts = list(consts) + list(consts_r)
        n_step_consts = len(consts)
        is_trc = [isinstance(c, jax.core.Tracer) for c in all_consts]
        for c, trc in zip(all_consts, is_trc):
            if not trc and np.asarray(c).size > 4096:
                raise ValueError("captured constant too large to embed")
        op_consts = [c for c, trc in zip(all_consts, is_trc) if trc]
        const_dtypes = [c.dtype for c in op_consts]
        const_in = [jnp.atleast_2d(c).astype(
            jnp.int32 if c.dtype == jnp.bool_ else c.dtype)
            for c in op_consts]

        def kernel(s_ref, goal_ref, st_ref, K_ref, pid_ref, tar_ref, *refs):
            del s_ref
            const_refs = refs[:len(const_in)]
            xs_ref, us_ref, len_ref, xf_ref, reach_ref, hit_ref = \
                refs[len(const_in):]
            tar_t = tar_ref[:]
            one = tar_t[0, 0] * 0.0 + 1.0

            def embed(arr):
                a = np.asarray(arr)
                flat = [jnp.float32(float(v)) * one
                        for v in a.astype(np.float64).ravel().tolist()]
                out = jnp.stack(flat).reshape(a.shape)
                if a.dtype == np.bool_:
                    return out > 0.5
                return out.astype(a.dtype)

            traced_cs = [r[:].astype(jnp.bool_) if d == jnp.bool_ else r[:]
                         for r, d in zip(const_refs, const_dtypes)]
            traced_cs = [c.reshape(a.shape)
                         for c, a in zip(traced_cs, op_consts)]
            it = iter(traced_cs)
            cs = [next(it) if trc else embed(c)
                  for c, trc in zip(all_consts, is_trc)]
            c_step, c_reach = cs[:n_step_consts], cs[n_step_consts:]
            goal_t = goal_ref[:].reshape((goal_ref.shape[1],))
            pid_t = pid_ref[0, :]                    # (Bt,) int32
            Bt_ = tar_t.shape[-1]

            # ---- in-kernel parent gather: blocked one-hot matmul (MXU).
            # The buffers arrive PRE-BLOCKED (n_nblk, ., NB) so the per-block
            # read is a leading-dim dynamic index (dynamic LANE slicing does
            # not lower in Mosaic). ----
            def gather_blk(b, acc):
                x_acc, K_acc = acc
                ids = (b * NB
                       + jax.lax.broadcasted_iota(jnp.int32, (NB, Bt_), 0))
                oh = (ids == pid_t[None, :]).astype(jnp.float32)
                st_b = st_ref[pl.ds(b, 1)][0]                # (n, NB)
                K_b = K_ref[pl.ds(b, 1)][0]                  # (m*n, NB)
                x_acc = x_acc + jnp.dot(st_b, oh,
                                        preferred_element_type=jnp.float32)
                K_acc = K_acc + jnp.dot(K_b, oh,
                                        preferred_element_type=jnp.float32)
                return x_acc, K_acc

            x0_t, Kflat_t = jax.lax.fori_loop(
                0, n_nblk, gather_blk,
                (jnp.zeros((n, Bt_), jnp.float32),
                 jnp.zeros((m * n, Bt_), jnp.float32)))

            def body(h, carry):
                x, done, length, hit = carry
                x_out, u, done, length, hit = step_pure(
                    x, Kflat_t, tar_t, goal_t, done, length, hit, *c_step)
                xs_ref[pl.ds(h, 1)] = x_out[None]
                us_ref[pl.ds(h, 1)] = u[None]
                return x_out, done, length, hit

            init = (x0_t, jnp.zeros((1, Bt_), jnp.int32),
                    jnp.zeros((1, Bt_), jnp.int32),
                    jnp.zeros((1, Bt_), jnp.int32))
            x, done, length, hit = jax.lax.fori_loop(0, H, body, init)
            len_ref[:] = length
            xf_ref[:] = x
            reach_ref[:] = reach_pure(x, tar_t, *c_reach).astype(jnp.int32)
            hit_ref[:] = hit

        tarT = xtar.T
        # batch-trailing, PRE-BLOCKED buffers: an (N, small) VMEM block pads
        # its minor dim to 128 lanes (21 MB for the tree state — over the
        # VMEM cap); (n_nblk, small, NB) blocks pad only small -> 8 sublanes
        # and give the kernel a leading-dim index per node block
        statesB = states.T.reshape(n, n_nblk, NB).transpose(1, 0, 2)
        KflatB = (K.transpose(0, 2, 1).reshape(N, n * m).T   # row j*m+i
                  .reshape(n * m, n_nblk, NB).transpose(1, 0, 2))
        pids2 = pids.astype(jnp.int32)[None, :]

        out_shape = (
            jax.ShapeDtypeStruct((H, n, B), jnp.float32),
            jax.ShapeDtypeStruct((H, m, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((n, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        )
        rep = [pl.BlockSpec(c.shape, functools.partial(
            lambda nd, i, s: (0,) * nd, c.ndim),
            memory_space=pltpu.VMEM) for c in const_in]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, n), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),           # goal
                pl.BlockSpec((n_nblk, n, NB), lambda i, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),           # statesB
                pl.BlockSpec((n_nblk, m * n, NB), lambda i, s: (0, 0, 0),
                             memory_space=pltpu.VMEM),           # K-row B
                pl.BlockSpec((1, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),           # pids
                pl.BlockSpec((n, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),           # tarT
            ] + rep,
            out_specs=(
                pl.BlockSpec((H, n, Bt), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, m, Bt), lambda i, s: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i),
                             memory_space=pltpu.VMEM),
            ),
        )
        xs, us, length, xfT, reached, hit = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(jnp.zeros((1,), jnp.int32), goal_in, statesB, KflatB, pids2, tarT,
          *const_in)
        length = length[0]
        reached = reached[0]
        hit = hit[0]
        mask = (jnp.arange(H, dtype=jnp.int32)[:, None] < length[None, :])
        return SteerResult(xs, us, mask, length, xfT.T,
                           reached.astype(bool), hit.astype(bool))

    steer.takes_tree = True
    return steer
