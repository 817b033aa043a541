"""Operating-point sweep on the real TPU: rounds_per_chunk (restart cadence
vs dispatch amortization) and steer unroll factor.

At bench shapes (batch 8192, capacity 32768) a chunk of 8 rounds overshoots
capacity 2x — rounds past saturation evaluate candidates that mostly cannot
commit.  Smaller chunks restart earlier (smaller average tree -> cheaper NN,
more restarts per second -> better anytime quality) at the cost of more
dispatches.

  python tools/exp_operating_point.py
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
from lqrrt_tpu.models import boat
from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache"))


def main():
    prob = boat.default_problem()

    def run(rpc, budget=1.0, seed=123, goal_bias=0.0):
        p = lqrrt_tpu.Planner(
            prob["dynamics"], prob["lqr"], prob["constraints"],
            horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
            printing=False, batch_size=8192, capacity=32768,
            wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], seed=0,
            rounds_per_chunk=rpc)
        p.warmup(prob["x0"], prob["sample_space"], goal_bias=goal_bias,
                 pruning=True)
        outs = []
        for r in range(3):
            p._key = jax.random.PRNGKey(seed + r)
            p.update_plan(prob["x0"], prob["sample_space"],
                          goal_bias=goal_bias, specific_time=budget,
                          pruning=False)
            outs.append((p.stats["expansions_per_s"], p.stats["restarts"],
                         p.T))
        eps = float(np.median([o[0] for o in outs]))
        return eps, outs[-1][1], float(np.median([o[2] for o in outs]))

    print("== rounds_per_chunk sweep (budget 1s, goal_bias 0) ==", flush=True)
    for rpc in (2, 4, 8):
        eps, rst, _ = run(rpc)
        print(f"  rpc={rpc}: {eps:,.0f} exp/s, restarts={rst}", flush=True)

    print("== quality at rpc (goal-biased, budget 1s, seed 777) ==",
          flush=True)
    for rpc in (2, 4, 8):
        eps, rst, T = run(rpc, goal_bias=None or 0.0, seed=777)
        # quality run with bias
        p = lqrrt_tpu.Planner(
            prob["dynamics"], prob["lqr"], prob["constraints"],
            horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
            printing=False, batch_size=8192, capacity=32768,
            wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], seed=0,
            rounds_per_chunk=rpc)
        p.warmup(prob["x0"], prob["sample_space"],
                 goal_bias=[0.3, 0.3, 0, 0, 0, 0], pruning=True)
        p._key = jax.random.PRNGKey(777)
        p.update_plan(prob["x0"], prob["sample_space"],
                      goal_bias=[0.3, 0.3, 0, 0, 0, 0], specific_time=1.0,
                      pruning=True)
        print(f"  rpc={rpc}: dur={p.T:.2f}s restarts={p.stats['restarts']}",
              flush=True)


if __name__ == "__main__":
    main()
