"""Round-5 apparatus: the double-vmap (>=2-D intermediates) rollout-kernel
variant.  Motivation: exp_steer_stages_v5 showed the vmapped boat dynamics
cost +17.7 ms inside the kernel while the same math hand-written with row
slices cost 1.43 ms — vmap's 1-D (Bt,) intermediates lower catastrophically
in Mosaic.  This variant wraps every user callback in a second vmap over a
singleton axis so all intermediates stay >= 2-D.

STATUS: does NOT compile on this backend (remote tpu_compile_helper exit 1,
opaque; both with 4-D (H, n, 1, Bt) output blocks and with per-step
reshape-to-2-D stores).  Kept as a record + retry base.  Even if fixed, the
projected time (~1.2-1.4 ms at Bt=1024, from the hand-rows measurement plus
scaffold floor ~1.0 ms) would only tie the lax.scan steer (1.39 ms composed,
exp_steer_v5.json) — so the scan remains the production path either way.
"""
import os, sys, time, functools
sys.path.insert(0, "/root/repo")
import jax
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lqrrt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache("/root/repo/.jax_cache")
from lqrrt_tpu.models import boat
from lqrrt_tpu.core.steer import SteerResult

def make_steer_pallas_dv(dynamics, erf, is_feasible, horizon_steps, dt,
                         error_tol, saturate=None, goal_buffer=None,
                         batch_tile=512, interpret=False):
    """make_steer_pallas with the double-vmap (>=2-D intermediates) fix:
    callbacks vmapped twice (singleton axis inner) so no (Bt,) 1-D values
    reach Mosaic; carry is (., 1, Bt); outputs 4-D (H, n, 1, B)."""
    H = int(horizon_steps)
    tol = np.asarray(error_tol, np.float32)
    per_dim = tol.ndim > 0
    gbuf = None if goal_buffer is None else np.asarray(goal_buffer, np.float32)

    def dv(f, n_in):
        inner = jax.vmap(f, in_axes=(-1,) * n_in, out_axes=-1)
        return jax.vmap(inner, in_axes=(-1,) * n_in, out_axes=-1)

    dynT = dv(lambda x, u: dynamics(x, u, dt), 2)
    erfT = dv(erf, 2)
    feasT = dv(is_feasible, 2)           # -> (1, Bt)
    satT = None if saturate is None else dv(saturate, 1)
    erfgT = None if gbuf is None else jax.vmap(
        jax.vmap(erf, in_axes=(None, -1), out_axes=-1),
        in_axes=(None, -1), out_axes=-1)

    def converged(e):                    # (n, 1, Bt) -> (1, Bt)
        if per_dim:
            return jnp.all(jnp.abs(e) <= tol[:, None, None], axis=(0, 1))[None]
        return jnp.sum(e * e, axis=(0, 1))[None] <= float(tol) * float(tol)

    def step_math(x, K, tar, goal, done_i, length, hit_i):
        n = x.shape[0]
        e = erfT(tar, x)                               # (n, 1, Bt)
        arrived = converged(e)                         # (1, Bt)
        u = K[:, 0] * e[0][None]
        for j in range(1, n):
            u = u + K[:, j] * e[j][None]               # (m, 1, Bt)
        if satT is not None:
            u = satT(u)
        xn = dynT(x, u)
        feas = feasT(xn, u)                            # (1, Bt)
        done = done_i > 0
        commit = jnp.logical_and(jnp.logical_not(done),
                                 jnp.logical_and(jnp.logical_not(arrived), feas))
        x_out = jnp.where(commit[None], xn, x)
        length = length + commit.astype(jnp.int32)
        done = done | arrived | jnp.logical_not(feas)
        hit = hit_i > 0
        if gbuf is not None:
            hit_step = commit & jnp.all(
                jnp.abs(erfgT(goal, xn)) <= gbuf[:, None, None],
                axis=(0, 1))[None]
            hit = hit | hit_step
            done = done | hit_step
        return x_out, u, done.astype(jnp.int32), length, hit.astype(jnp.int32)

    def final_reached(x, tar):
        return converged(erfT(tar, x))

    def steer(x0, K, xtar, goal=None):
        import math
        B, n = x0.shape
        m = K.shape[1]
        Bt = math.gcd(B, batch_tile) if B % min(batch_tile, B) else min(batch_tile, B)
        nb = B // Bt
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

        ex = (jnp.zeros((n, 1, Bt)), jnp.zeros((m, n, 1, Bt)),
              jnp.zeros((n, 1, Bt)), jnp.zeros((n,)),
              jnp.zeros((1, Bt), jnp.int32), jnp.zeros((1, Bt), jnp.int32),
              jnp.zeros((1, Bt), jnp.int32))
        step_pure, consts = hoist(step_math, *ex)
        reach_pure, consts_r = hoist(final_reached, jnp.zeros((n, 1, Bt)),
                                     jnp.zeros((n, 1, Bt)))
        all_consts = list(consts) + list(consts_r)
        n_step_consts = len(consts)
        is_trc = [isinstance(c, jax.core.Tracer) for c in all_consts]
        op_consts = [c for c, trc in zip(all_consts, is_trc) if trc]
        const_dtypes = [c.dtype for c in op_consts]
        const_in = [jnp.atleast_2d(c).astype(
            jnp.int32 if c.dtype == jnp.bool_ else c.dtype) for c in op_consts]

        def kernel(s_ref, goal_ref, x0_ref, K_ref, tar_ref, *refs):
            del s_ref
            const_refs = refs[:len(const_in)]
            xs_ref, us_ref, len_ref, xf_ref, reach_ref, hit_ref = refs[len(const_in):]
            x0_t = x0_ref[:].reshape(x0_ref.shape[0], 1, x0_ref.shape[1])
            one = x0_t[0, 0, 0] * 0.0 + 1.0
            def embed(arr):
                a = np.asarray(arr)
                flat = [jnp.float32(float(v)) * one
                        for v in a.astype(np.float64).ravel().tolist()]
                out = jnp.stack(flat).reshape(a.shape)
                if a.dtype == np.bool_: return out > 0.5
                return out.astype(a.dtype)
            traced_cs = [r[:].astype(jnp.bool_) if d == jnp.bool_ else r[:]
                         for r, d in zip(const_refs, const_dtypes)]
            traced_cs = [c.reshape(a.shape) for c, a in zip(traced_cs, op_consts)]
            it = iter(traced_cs)
            cs = [next(it) if trc else embed(c)
                  for c, trc in zip(all_consts, is_trc)]
            c_step, c_reach = cs[:n_step_consts], cs[n_step_consts:]
            K_t = K_ref[:].reshape(K_ref.shape[0], K_ref.shape[1], 1,
                                   K_ref.shape[2])
            tar_t = tar_ref[:].reshape(tar_ref.shape[0], 1, tar_ref.shape[1])
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
            x, done, length, hit = jax.lax.fori_loop(0, H, body, init)
            len_ref[:] = length
            xf_ref[:] = x.reshape(x.shape[0], Bt_)
            reach_ref[:] = reach_pure(
                x, tar_t, *c_reach).reshape(1, Bt_).astype(jnp.int32)
            hit_ref[:] = hit

        x0T = x0.T
        tarT = xtar.T
        KT = jnp.transpose(K, (1, 2, 0))
        out_shape = (
            jax.ShapeDtypeStruct((H, n, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((H, m, 1, B), jnp.float32),
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
                pl.BlockSpec((1, n), lambda i, s: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, Bt), lambda i, s: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m, n, Bt), lambda i, s: (0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, Bt), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            ] + rep,
            out_specs=(
                pl.BlockSpec((H, n, 1, Bt), lambda i, s: (0, 0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, m, 1, Bt), lambda i, s: (0, 0, 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((n, Bt), lambda i, s: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bt), lambda i, s: (0, i), memory_space=pltpu.VMEM),
            ),
        )
        xs, us, length, xfT, reached, hit = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.zeros((1,), jnp.int32), goal_in, x0T, KT, tarT, *const_in)
        xs = xs[:, :, 0, :]
        us = us[:, :, 0, :]
        length = length[0]
        mask = (jnp.arange(H, dtype=jnp.int32)[:, None] < length[None, :])
        return SteerResult(xs, us, mask, length, xfT.T,
                           reached[0].astype(bool), hit[0].astype(bool))
    return steer


H_, n_, m_, B_ = 100, 6, 3, 8192
prob = boat.default_problem()
goal = jnp.asarray(prob["goal"])

def bench(name, steer):
    key = jax.random.PRNGKey(0)
    S0, K0 = prob["lqr"](None, None)
    x0 = jnp.tile(jnp.asarray(prob["x0"])[None], (B_, 1))
    K = jnp.tile(K0[None], (B_, 1, 1))
    tar = jax.random.normal(key, (B_, n_)) * 5.0
    def fn(state):
        x0, tar = state
        res = steer(x0, K, tar, goal)
        return res.xnew, tar + 1e-6
    jfn = jax.jit(fn, donate_argnums=0)
    try:
        st = (x0, tar)
        st = jfn(st)
        _ = jax.device_get(st[0].ravel()[0])
        outer = 100
        t0 = time.perf_counter()
        for _ in range(outer):
            st = jfn(st)
        _ = jax.device_get(st[0].ravel()[0])
        ms = (time.perf_counter() - t0) / outer * 1e3
        print(f"{name:24s}: {ms:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

for bt in (512, 1024):
    bench(f"dv kernel Bt={bt}", make_steer_pallas_dv(
        prob["dynamics"], prob["erf"], prob["constraints"].is_feasible,
        H_, prob["dt"], 0.05, saturate=prob["saturate"],
        goal_buffer=prob["constraints"].goal_buffer, batch_tile=bt))
