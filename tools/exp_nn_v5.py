"""Round-5 NN attribution: does the size-gated grid actually skip work, and
what would an MXU cross-term formulation buy over the VPU direct-difference
kernel?

Times the const-metric NN kernel composed in a fori_loop (8 calls per
dispatch, result carried) at several live sizes, plus raw dispatch overhead.
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
from lqrrt_tpu.ops.pallas.nn_kernel import (make_nearest_const_pallas,
                                            make_nearest_pallas)

B = 8192
N = 32768 + 8192
REPS = 8


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    prob = boat.default_problem()
    S0, _ = prob["lqr"](None, None)
    key = jax.random.PRNGKey(0)
    states = jax.random.normal(key, (N, 6)) * 10.0
    S = jnp.broadcast_to(S0, (N, 6, 6))
    xrand = jax.random.normal(jax.random.fold_in(key, 1), (B, 6)) * 10.0

    # dispatch overhead: trivial jitted op
    triv = jax.jit(lambda x: x + 1.0)
    t_triv = timeit(triv, jnp.zeros((8,)))
    print(f"trivial dispatch: {t_triv*1e3:7.3f} ms")

    nn = make_nearest_const_pallas(block=2048, wrap_dim=2)

    def composed(states, S, size, xr):
        def body(i, carry):
            idx, acc = carry
            ids, cost = nn(states, S, size, xr + acc * 1e-20)
            return ids, acc + jnp.sum(cost)
        return jax.lax.fori_loop(
            0, REPS, body,
            (jnp.zeros((B,), jnp.int32), jnp.asarray(0.0)))

    cj = jax.jit(composed)
    for size in (1024, 8192, 16384, 24576, 32768):
        t = timeit(cj, states, S, jnp.asarray(size, jnp.int32), xrand, n=5)
        print(f"const NN composed @ size={size:6d}: {t/REPS*1e3:7.3f} "
              f"ms/call", flush=True)

    # the general bilinear MXU kernel for comparison (same composition)
    nnb = make_nearest_pallas(block=2048, wrap_dim=2)

    def composed_b(states, S, size, xr):
        def body(i, carry):
            idx, acc = carry
            ids, cost = nnb(states, S, size, xr + acc * 1e-20)
            return ids, acc + jnp.sum(cost)
        return jax.lax.fori_loop(
            0, REPS, body,
            (jnp.zeros((B,), jnp.int32), jnp.asarray(0.0)))

    cjb = jax.jit(composed_b)
    for size in (16384, 32768):
        t = timeit(cjb, states, S, jnp.asarray(size, jnp.int32), xrand, n=5)
        print(f"bilinear NN composed @ size={size:6d}: {t/REPS*1e3:7.3f} "
              f"ms/call", flush=True)


if __name__ == "__main__":
    main()
