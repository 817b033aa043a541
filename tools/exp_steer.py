"""Experiment: steer-scan variants on TPU (diagnostic, not part of package).

Variants:
  a) current make_steer (batch-leading vmap, no unroll)
  b) unroll=k
  c) batch-minor vmap (state (n,B) layout on device) + unroll
Also times the Pallas NN at the planner's production block size.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from lqrrt_tpu.core.steer import make_steer
from lqrrt_tpu.models import boat

BATCH = int(os.environ.get("BATCH", 8192))
H = 100


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make_steer_unroll(dynamics, erf, is_feasible, horizon_steps, dt,
                      error_tol, saturate=None, unroll=1, batch_minor=False):
    tol = jnp.asarray(error_tol, jnp.float32)
    per_dim = tol.ndim > 0

    def converged(e):
        if per_dim:
            return jnp.all(jnp.abs(e) <= tol)
        return jnp.linalg.norm(e) <= tol

    def steer_one(x0, K, xtar):
        def step(carry, _):
            x, done, length = carry
            e = erf(xtar, x)
            arrived = converged(e)
            u = K @ e
            if saturate is not None:
                u = saturate(u)
            xn = dynamics(x, u, dt)
            feas = is_feasible(xn, u)
            commit = jnp.logical_and(jnp.logical_not(done),
                                     jnp.logical_and(jnp.logical_not(arrived), feas))
            x_out = jnp.where(commit, xn, x)
            length = length + commit.astype(jnp.int32)
            done = done | arrived | jnp.logical_not(feas)
            return (x_out, done, length), (x_out, u, commit)

        init = (x0, jnp.bool_(False), jnp.asarray(0, jnp.int32))
        (xf, _, length), (xs, us, mask) = jax.lax.scan(
            step, init, None, length=horizon_steps, unroll=unroll)
        reached = converged(erf(xtar, xf))
        return xs, us, mask, length, xf, reached

    if batch_minor:
        inner = jax.vmap(steer_one, in_axes=(-1, -1, -1),
                         out_axes=(-1, -1, -1, -1, -1, -1))

        def steer(x0, K, xtar):
            # inputs batch-leading; move batch to minor axis for the rollout
            xs, us, mask, length, xf, reached = inner(
                jnp.moveaxis(x0, 0, -1), jnp.moveaxis(K, 0, -1),
                jnp.moveaxis(xtar, 0, -1))
            return (jnp.moveaxis(xs, -1, 0), jnp.moveaxis(us, -1, 0),
                    jnp.moveaxis(mask, -1, 0), length, jnp.moveaxis(xf, -1, 0),
                    reached)
        return steer
    return jax.vmap(steer_one)


def main():
    prob = boat.default_problem()
    key = jax.random.PRNGKey(0)
    x0 = jnp.tile(jnp.asarray(prob["x0"]), (BATCH, 1))
    S0, K0 = prob["lqr"](None, None)
    K = jnp.tile(K0, (BATCH, 1, 1))
    xtar = jax.random.uniform(key, (BATCH, 6), minval=-5.0, maxval=5.0)

    base = jax.jit(make_steer(prob["dynamics"], prob["erf"],
                              prob["constraints"].is_feasible, H, prob["dt"],
                              0.05, saturate=prob["saturate"]))
    t = timeit(base, x0, K, xtar)
    print(f"steer current:           {t*1e3:7.3f} ms", flush=True)

    for u in (4, 10):
        f = jax.jit(make_steer_unroll(
            prob["dynamics"], prob["erf"], prob["constraints"].is_feasible,
            H, prob["dt"], 0.05, saturate=prob["saturate"], unroll=u))
        print(f"steer unroll={u}:         {timeit(f, x0, K, xtar)*1e3:7.3f} ms",
              flush=True)

    for u in (1, 10):
        f = jax.jit(make_steer_unroll(
            prob["dynamics"], prob["erf"], prob["constraints"].is_feasible,
            H, prob["dt"], 0.05, saturate=prob["saturate"], unroll=u,
            batch_minor=True))
        r = f(x0, K, xtar)
        rb = base(x0, K, xtar)
        # sanity: same endpoints/lengths as the current implementation
        np.testing.assert_allclose(np.asarray(r[4]), np.asarray(rb.xnew),
                                   rtol=2e-4, atol=2e-4)
        assert np.array_equal(np.asarray(r[3]), np.asarray(rb.length))
        print(f"steer batch-minor u={u:2d}:  {timeit(f, x0, K, xtar)*1e3:7.3f} ms"
              " (matches current)", flush=True)

    # Pallas NN at production block size, half-full tree
    from lqrrt_tpu.ops.pallas.nn_kernel import make_nearest_pallas
    N = 32768 + 8192
    states = jax.random.uniform(key, (N, 6), minval=-5, maxval=5)
    S = jnp.tile(S0, (N, 1, 1))
    size = jnp.asarray(16384, jnp.int32)
    nn = jax.jit(make_nearest_pallas(block=1024, wrap_dim=2))
    print(f"pallas NN (blk1024, size16k): "
          f"{timeit(nn, states, S, size, xtar)*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
