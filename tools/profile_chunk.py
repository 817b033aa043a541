"""Time one full planner chunk dispatch (8 rounds) per NN backend."""
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

import lqrrt_tpu
from lqrrt_tpu.models import boat


def main():
    prob = boat.default_problem()
    for impl in ("pallas_const", "pallas"):
        planner = lqrrt_tpu.Planner(
            prob["dynamics"], prob["lqr"], prob["constraints"],
            horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
            printing=False, batch_size=8192, capacity=32768,
            wrap_dims=(2,), saturate=prob["saturate"], seed=0, nn_impl=impl)
        chunk = planner._get_chunk(None, 0)
        tree = planner._get_seed_tree()(
            jnp.asarray(prob["x0"]), planner.goal,
            planner.constraints.goal_buffer)
        ss = jnp.asarray(prob["sample_space"], jnp.float32).reshape(6, 2)
        gb = jnp.zeros(6)
        key = jax.random.PRNGKey(0)
        # one warm chunk (compile), then time chunks 1 and 2 separately so we
        # see the cost at small and large tree sizes
        tree, st = chunk(tree, key, 0, planner.goal, ss, gb, planner.goal)
        jax.block_until_ready(st)
        print(f"{impl}: after chunk0 size={int(st[0])} (sel={planner.nn_selected})")
        for c in (1, 2):
            t0 = time.perf_counter()
            tree, st = chunk(tree, key, c * 8, planner.goal, ss, gb,
                             planner.goal)
            jax.block_until_ready(st)
            dtms = (time.perf_counter() - t0) * 1e3
            print(f"  chunk{c}: {dtms:7.2f} ms ({dtms/8:5.2f} ms/round), "
                  f"size={int(st[0])}")


if __name__ == "__main__":
    main()
