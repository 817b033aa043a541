"""Diagnose the rewire acceptance funnel on the boat problem: of B rewire
trials, how many (a) find a valid source, (b) converge to the target state,
(c) strictly beat the incumbent arrival time?

  JAX_PLATFORMS=cpu python tools/exp_rewire_diag.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):  # env var alone is not honored here
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from lqrrt_tpu.core.rewire import make_nearest_pred
from lqrrt_tpu.core.rounds import RoundSpec, make_round
from lqrrt_tpu.core.steer import make_steer
from lqrrt_tpu.core.tree import init_tree
from lqrrt_tpu.models import boat


def main(batch=512, capacity=2048, grow_rounds=6):
    prob = boat.default_problem()
    n, m = 6, 3
    H = int(round(prob["horizon"] / prob["dt"]))
    dt = prob["dt"]
    blk = 512
    slack = -(-batch // blk) * blk
    spec = RoundSpec(nstates=n, ncontrols=m, batch=batch, horizon_steps=H,
                     capacity=capacity, dt=dt, nn_block=blk, slack=slack)
    wrap_mask = np.zeros(n, bool); wrap_mask[2] = True
    feas = prob["constraints"].is_feasible
    grow = jax.jit(make_round(spec, prob["dynamics"], prob["lqr"],
                              prob["erf"], feas, 0.05,
                              prob["constraints"].goal_buffer,
                              wrap_mask=wrap_mask,
                              saturate=prob["saturate"]), donate_argnums=(0,))
    x0 = jnp.asarray(prob["x0"]); goal = jnp.asarray(prob["goal"])
    gb = jnp.asarray(prob["constraints"].goal_buffer)
    S0, K0 = prob["lqr"](x0, jnp.zeros(m))
    e0 = prob["erf"](goal, x0)
    tree = init_tree(capacity, H, n, m, x0, S0, K0, e0 @ S0 @ e0,
                     jnp.all(jnp.abs(e0) <= gb), slack=slack)
    key = jax.random.PRNGKey(7)
    ss = jnp.asarray(prob["sample_space"])
    bias = jnp.asarray([0.3, 0.3, 0, 0, 0, 0], jnp.float32)
    for r in range(grow_rounds):
        tree = grow(tree, jax.random.fold_in(key, r), goal, ss, bias, goal)
    print(f"size={int(tree.size)} goal={bool(tree.goal_found)}")

    steer = make_steer(prob["dynamics"], prob["erf"], feas, H, dt, 0.05,
                       saturate=prob["saturate"])
    nearest = make_nearest_pred(prob["erf"], block=blk)

    @jax.jit
    def funnel(tree, key):
        live = jnp.minimum(tree.size, spec.capacity)
        nlive = jnp.maximum(live - 1, 1)
        start = jax.random.randint(key, (), 0, nlive, dtype=jnp.int32)
        t_idx = 1 + (start + jnp.arange(batch, dtype=jnp.int32)) % nlive
        x_t = tree.state[t_idx]
        time_t = tree.node_time[t_idx]
        cur_parent = tree.parent[t_idx]
        src, cost = nearest(tree.state, tree.S, tree.node_time, live, x_t,
                            time_t, cur_parent, dt)
        res = steer(tree.state[src], tree.K[src], x_t)
        t_new = tree.node_time[src] + res.length.astype(jnp.float32) * dt
        has_src = jnp.isfinite(cost)
        e_final = jax.vmap(prob["erf"])(x_t, res.xnew)
        return dict(
            has_src=jnp.mean(has_src.astype(jnp.float32)),
            reached=jnp.mean(res.reached.astype(jnp.float32)),
            gain_if_reached=jnp.sum(jnp.where(
                res.reached, time_t - t_new, 0.0)) / jnp.maximum(
                jnp.sum(res.reached), 1),
            improve=jnp.mean((res.reached & (t_new < time_t - 1e-4))
                             .astype(jnp.float32)),
            mean_final_err=jnp.mean(jnp.linalg.norm(e_final, axis=-1)),
            p10_final_err=jnp.percentile(
                jnp.linalg.norm(e_final, axis=-1), 10),
            mean_len=jnp.mean(res.length.astype(jnp.float32)),
            mean_time_t=jnp.mean(time_t),
            mean_t_new_reached=jnp.sum(jnp.where(res.reached, t_new, 0.0))
                / jnp.maximum(jnp.sum(res.reached), 1),
        )

    for r in range(3):
        out = jax.device_get(funnel(tree, jax.random.fold_in(key, 500 + r)))
        print({k: round(float(v), 4) for k, v in out.items()})


if __name__ == "__main__":
    main()
