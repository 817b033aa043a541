"""Deterministic informed-restart comparison on the real TPU: a fake clock
fixes the CHUNK COUNT (restart boundaries are data-deterministic), removing
wall-clock noise from the comparison.

  python tools/exp_informed.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import lqrrt_tpu
from lqrrt_tpu.models import boat
from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache"))


def clock_factory(n_chunks):
    state = {"n": 0}

    def clock():
        state["n"] += 1
        return 0.0 if state["n"] <= n_chunks + 1 else 1e9
    return clock


def main():
    prob = boat.default_problem()
    bias = [0.3, 0.3, 0, 0, 0, 0]

    def run(n_chunks, informed, anneal, seed=777):
        p = lqrrt_tpu.Planner(
            prob["dynamics"], prob["lqr"], prob["constraints"],
            horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
            printing=False, batch_size=8192, capacity=32768,
            wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], seed=0,
            informed=informed, informed_anneal=anneal)
        p.warmup(prob["x0"], prob["sample_space"], goal_bias=0.0,
                 pruning=True)
        p._key = jax.random.PRNGKey(seed)
        p.sys_time = clock_factory(n_chunks)
        p.update_plan(prob["x0"], prob["sample_space"], goal_bias=bias,
                      specific_time=1.0, pruning=True)
        return p.T, p.stats["restarts"]

    for informed, anneal, tag in ((0.0, 1.0, "uninformed"),
                                  (0.5, 1.0, "inf=.5 no-anneal"),
                                  (0.5, 0.7, "inf=.5 anneal=.7"),
                                  (0.25, 1.0, "inf=.25 no-anneal")):
        durs = []
        for n in (3, 8, 15, 30):
            d, r = run(n, informed, anneal)
            durs.append(f"{n}ch:{d:.2f}s/r{r}")
        print(f"{tag:18s} " + "  ".join(durs), flush=True)
    # seed robustness of the gate at the best config
    for seed in (7, 101, 777):
        d3, _ = run(3, 0.5, 1.0, seed)
        d15, _ = run(15, 0.5, 1.0, seed)
        print(f"seed {seed}: 3ch={d3:.2f}s  15ch={d15:.2f}s  "
              f"strict={d15 < d3 - 1e-3}", flush=True)


if __name__ == "__main__":
    main()
