"""Round-5: attribute the composed round's hidden ~3 ms (NN kernel vs the
random row gathers x0=state[pids], K0=K[pids] vs the n_children scatter).

Timing on this backend: jax.block_until_ready does NOT synchronize (async
dispatch queue, ~20 ms tunnel sync cost on fetch) — every measurement here
chains iterations through a carried dependence inside ONE jitted fori_loop
and ends with a real device_get, with enough inner reps that the fixed sync
cost is <5% of the total.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from lqrrt_tpu.models import boat
from lqrrt_tpu.ops.pallas.nn_kernel import make_nearest_const_pallas

B = 8192
N = 32768 + 8192
SYNC_MS_BUDGET = 500.0   # target per-measurement total wall time


def timed(name, jfn, *args, inner: int, est_ms: float):
    """jfn(reps, *args) -> scalar; runs ceil(est total) outer calls chained
    by varying a fold key, one final fetch."""
    outer = max(int(SYNC_MS_BUDGET / max(est_ms * inner, 0.05)), 2)
    out = jfn(jnp.asarray(0, jnp.int32), *args)
    _ = jax.device_get(out)
    t0 = time.perf_counter()
    for i in range(outer):
        out = jfn(jnp.asarray(i + 1, jnp.int32), *args)
    _ = jax.device_get(out)
    ms = (time.perf_counter() - t0) / (outer * inner) * 1e3
    print(f"{name}: {ms:8.4f} ms/call   ({outer}x{inner} calls)", flush=True)
    return ms


def main():
    prob = boat.default_problem()
    S0, K0 = prob["lqr"](None, None)
    key = jax.random.PRNGKey(0)
    states = jax.random.normal(key, (N, 6)) * 10.0
    S = jnp.broadcast_to(S0, (N, 6, 6))
    K = jnp.broadcast_to(K0, (N, 3, 6))
    xrand = jax.random.normal(jax.random.fold_in(key, 1), (B, 6)) * 10.0
    pids_rand = jax.random.randint(jax.random.fold_in(key, 2), (B,), 0, N)
    pids_seq = jnp.arange(B, dtype=jnp.int32)

    nn = make_nearest_const_pallas(block=2048, wrap_dim=2)
    REPS = 16

    # 1. composed NN kernel, iteration-dependent input
    def comp_nn(seed, states, S, size, xr):
        xr = xr + 1e-9 * seed.astype(jnp.float32)

        def body(i, xr):
            ids, cost = nn(states, S, size, xr)
            return xr + 1e-7 * cost[:, None]
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, xr))

    cj = jax.jit(comp_nn)
    for size in (8192, 16384, 32768):
        timed(f"NN const composed size={size:6d}", cj, states, S,
              jnp.asarray(size, jnp.int32), xrand, inner=REPS, est_ms=1.0)

    # 2. random vs sequential row gather of state+K
    def comp_gather(seed, states, K, pids):
        def body(i, carry):
            p, acc = carry
            x0 = states[p]
            K0g = K[p]
            acc = acc + jnp.sum(x0) + jnp.sum(K0g)
            p = (p + seed + 1) % N
            return p, acc
        return jax.lax.fori_loop(0, REPS, body,
                                 (pids, jnp.asarray(0.0)))[1]

    gj = jax.jit(comp_gather)
    timed("gather state+K RANDOM  ", gj, states, K, pids_rand,
          inner=REPS, est_ms=1.0)
    timed("gather state+K SEQ     ", gj, states, K, pids_seq,
          inner=REPS, est_ms=1.0)

    # 3. scatter-add (n_children) random vs sequential
    def comp_scatter(seed, nc, pids):
        def body(i, carry):
            nc, p = carry
            nc = nc.at[p].add(1, mode="drop")
            p = (p + seed + 1) % N
            return nc, p
        return jnp.sum(jax.lax.fori_loop(
            0, REPS, body, (nc, pids))[0])

    sj = jax.jit(comp_scatter)
    nc = jnp.zeros((N,), jnp.int32)
    timed("scatter n_children RAND", sj, nc, pids_rand,
          inner=REPS, est_ms=1.0)
    timed("scatter n_children SEQ ", sj, nc, pids_seq,
          inner=REPS, est_ms=1.0)


if __name__ == "__main__":
    main()
