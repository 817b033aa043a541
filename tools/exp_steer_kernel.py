"""Hardware measurement of the fused Pallas rollout kernel vs the lax.scan
steer (VERDICT r4 roofline item): equivalence + timing at the bench operating
point, tile/unroll sweep."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from lqrrt_tpu.core.steer import make_steer
from lqrrt_tpu.models import boat
from steer_kernel_experimental import make_steer_pallas

B = int(os.environ.get("BATCH", 8192))
H = 100


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    prob = boat.default_problem()
    interp = jax.devices()[0].platform != "tpu"
    kw = dict(saturate=prob["saturate"],
              goal_buffer=prob["constraints"].goal_buffer)
    mkargs = (prob["dynamics"], prob["erf"], prob["constraints"].is_feasible,
              H, 0.05, 0.05)
    ref = jax.jit(make_steer(*mkargs, layout="tm", **kw))

    key = jax.random.PRNGKey(0)
    ss = jnp.asarray(prob["sample_space"])
    x0 = jax.random.uniform(key, (B, 6), minval=-1, maxval=1)
    _, K = prob["lqr"](None, None)
    Kb = jnp.tile(K[None], (B, 1, 1))
    xtar = jax.random.uniform(jax.random.fold_in(key, 1), (B, 6),
                              minval=ss[:, 0], maxval=ss[:, 1])
    goal = jnp.asarray(prob["goal"])

    t_ref = timeit(ref, x0, Kb, xtar, goal)
    print(f"scan (tm, unroll 4):        {t_ref:7.3f} ms")
    ra = ref(x0, Kb, xtar, goal)

    for Bt in (256, 512, 1024):
        for unroll in (1, H):
            try:
                pal = jax.jit(make_steer_pallas(
                    *mkargs, batch_tile=Bt, unroll=unroll,
                    interpret=interp, **kw))
                t = timeit(pal, x0, Kb, xtar, goal)
            except Exception as e:
                print(f"pallas Bt={Bt} unroll={unroll}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}")
                continue
            rb = pal(x0, Kb, xtar, goal)
            # equivalence on hardware
            lens_eq = np.array_equal(np.asarray(ra.length),
                                     np.asarray(rb.length))
            dx = float(np.max(np.abs(np.asarray(ra.x_seq, np.float64)
                                     - np.asarray(rb.x_seq, np.float64))))
            print(f"pallas Bt={Bt:5d} unroll={unroll}: {t:7.3f} ms "
                  f"({t_ref/t:4.1f}x)  len_eq={lens_eq} max|dx|={dx:.2e}")


if __name__ == "__main__":
    main()
