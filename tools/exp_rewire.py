"""Experiment: does the refine round (leaf replacement + rewire) measurably
shorten the committed goal plan once the tree saturates capacity?

Run on CPU with small shapes:
  JAX_PLATFORMS=cpu python tools/exp_rewire.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):  # env var alone is not honored here
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from lqrrt_tpu.core.rounds import (RoundSpec, make_refine_round, make_round)
from lqrrt_tpu.core.rewire import recompute_node_times
from lqrrt_tpu.core.tree import best_node, init_tree
from lqrrt_tpu.models import boat


def main(batch=512, capacity=2048, grow_rounds=6, refine_rounds=40):
    prob = boat.default_problem()
    n, m = 6, 3
    H = int(round(prob["horizon"] / prob["dt"]))
    blk = 512
    slack = -(-batch // blk) * blk
    spec = RoundSpec(nstates=n, ncontrols=m, batch=batch,
                     horizon_steps=H, capacity=capacity, dt=prob["dt"],
                     nn_block=blk, slack=slack)
    wrap_mask = np.zeros(n, bool); wrap_mask[2] = True
    common = dict(wrap_mask=wrap_mask, saturate=prob["saturate"])
    feas = prob["constraints"].is_feasible
    grow = jax.jit(make_round(spec, prob["dynamics"], prob["lqr"],
                              prob["erf"], feas, 0.05,
                              prob["constraints"].goal_buffer, **common),
                   donate_argnums=(0,))
    refine = jax.jit(make_refine_round(spec, prob["dynamics"], prob["lqr"],
                                       prob["erf"], feas, 0.05,
                                       prob["constraints"].goal_buffer,
                                       **common), donate_argnums=(0,))

    x0 = jnp.asarray(prob["x0"]); goal = jnp.asarray(prob["goal"])
    gb = jnp.asarray(prob["constraints"].goal_buffer)
    S0, K0 = prob["lqr"](x0, jnp.zeros(m))
    e0 = prob["erf"](goal, x0)
    tree = init_tree(capacity, H, n, m, x0, S0, K0, e0 @ S0 @ e0,
                     jnp.all(jnp.abs(e0) <= gb), slack=slack)
    key = jax.random.PRNGKey(7)
    ss = jnp.asarray(prob["sample_space"])
    bias = jnp.asarray([0.3, 0.3, 0, 0, 0, 0], jnp.float32)

    def best_goal_time(t):
        bt = np.asarray(jnp.where(t.goal_found,
                                  t.node_time[best_node(t)], np.inf))
        return float(bt)

    for r in range(grow_rounds):
        tree = grow(tree, jax.random.fold_in(key, r), goal, ss, bias, goal)
    print(f"after grow: size={int(tree.size)}, goal={bool(tree.goal_found)}, "
          f"best_goal_time={best_goal_time(tree):.2f}s", flush=True)

    t0 = time.time()
    hist = []
    for r in range(refine_rounds):
        tree = refine(tree, jax.random.fold_in(key, 1000 + r), goal, ss,
                      bias, goal)
        if (r + 1) % 5 == 0:
            hist.append(best_goal_time(tree))
            print(f"  refine {r+1:3d}: best_goal_time={hist[-1]:.3f}s "
                  f"({(time.time()-t0)/(r+1)*1e3:.0f} ms/round)", flush=True)
    # consistency: recomputed times match stored
    nt = recompute_node_times(tree.parent, tree.edge_len, spec.dt)
    err = float(jnp.max(jnp.abs(nt - tree.node_time)))
    print(f"node_time consistency max err: {err:.2e}")
    print(f"improvement: {hist[0]:.3f} -> {hist[-1]:.3f}s")


if __name__ == "__main__":
    main()
