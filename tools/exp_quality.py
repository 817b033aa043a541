"""Quality-vs-budget experiments on the real TPU (refine gate, VERDICT r3).

1) Budget sweep at fixed seed: does the restart-min keep improving?
2) Informed prototype: corridor-biased sampling around the incumbent plan —
   does it dig below the unbiased restart plateau?

  python tools/exp_quality.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

import lqrrt_tpu
from lqrrt_tpu.core.sampling import sample_batch
from lqrrt_tpu.models import boat
from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache"))


def main():
    prob = boat.default_problem()
    bias = [0.3, 0.3, 0, 0, 0, 0]

    def mk():
        return lqrrt_tpu.Planner(
            prob["dynamics"], prob["lqr"], prob["constraints"],
            horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
            printing=False, batch_size=8192, capacity=32768,
            wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], seed=0)

    p = mk()
    p.warmup(prob["x0"], prob["sample_space"], goal_bias=0.0, pruning=True)

    print("== budget sweep, seed 777 ==", flush=True)
    for budget in (0.2, 0.5, 1.0, 2.0, 4.0):
        p._key = jax.random.PRNGKey(777)
        t0 = time.time()
        p.update_plan(prob["x0"], prob["sample_space"], goal_bias=bias,
                      specific_time=budget, pruning=True)
        print(f"  budget {budget}s: dur={p.T:.3f}s restarts="
              f"{p.stats['restarts']} wall={time.time()-t0:.2f}s",
              flush=True)

    # incumbent from the 1 s run
    p._key = jax.random.PRNGKey(777)
    p.update_plan(prob["x0"], prob["sample_space"], goal_bias=bias,
                  specific_time=1.0, pruning=True)
    inc = np.asarray(p.x_seq)
    print(f"incumbent: {p.T:.3f}s, {len(inc)} steps", flush=True)

    print("== informed prototype (pool = incumbent path + noise) ==",
          flush=True)
    rows = np.linspace(0, len(inc) - 1, 256).astype(int)
    pool = jnp.asarray(inc[rows], jnp.float32)
    space = jnp.asarray(prob["sample_space"], jnp.float32)
    scale = (space[:, 1] - space[:, 0]) * 0.05
    gbias = jnp.asarray(bias, jnp.float32)
    goal = jnp.asarray(prob["goal"])

    for frac in (0.25, 0.5):
        def gen(k, B, frac=frac):
            k1, k2, k3 = jax.random.split(k, 3)
            fresh = sample_batch(k1, B, space, gbias, goal)
            r = jax.random.randint(k2, (B,), 0, pool.shape[0])
            noisy = pool[r] + jax.random.normal(k3, (B, 6)) * scale
            take = jnp.arange(B) < int(frac * B)
            return jnp.where(take[:, None], noisy, fresh)

        for budget in (0.5, 1.0):
            p._key = jax.random.PRNGKey(777)
            p.update_plan(prob["x0"], prob["sample_space"], goal_bias=bias,
                          xrand_gen=gen, specific_time=budget, pruning=True)
            print(f"  frac={frac} budget={budget}s: dur={p.T:.3f}s "
                  f"restarts={p.stats['restarts']}", flush=True)


if __name__ == "__main__":
    main()
