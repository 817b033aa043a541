"""Rewire funnel deep-dive: why do source->target steers fail?

Probes, per source strategy (nearest-pred vs grandparent):
  - initial position/full-state error distribution
  - stop cause: collision vs horizon vs arrived
  - reached rate at 1x and 3x horizon, with and without obstacles
  JAX_PLATFORMS=cpu python tools/exp_rewire_diag2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
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

    nearest = make_nearest_pred(prob["erf"], block=blk)
    free = lambda x, u: jnp.bool_(True)  # noqa: E731

    steers = {
        "1xH_obs": make_steer(prob["dynamics"], prob["erf"], feas, H, dt,
                              0.05, saturate=prob["saturate"]),
        "3xH_obs": make_steer(prob["dynamics"], prob["erf"], feas, 3 * H, dt,
                              0.05, saturate=prob["saturate"]),
        "3xH_free": make_steer(prob["dynamics"], prob["erf"], free, 3 * H,
                               dt, 0.05, saturate=prob["saturate"]),
    }

    k = jax.random.fold_in(key, 500)
    live = int(tree.size)
    nlive = live - 1
    start = int(jax.random.randint(k, (), 0, nlive))
    t_idx = 1 + (start + np.arange(batch)) % nlive
    t_idx = jnp.asarray(t_idx, jnp.int32)
    x_t = tree.state[t_idx]
    time_t = tree.node_time[t_idx]
    cur_parent = tree.parent[t_idx]

    nn_src, nn_cost = jax.jit(nearest)(tree.state, tree.S, tree.node_time,
                                       live, x_t, time_t, cur_parent, dt)
    gp_src = tree.parent[cur_parent]          # grandparent (may be -1)
    gp_ok = gp_src >= 0

    for name, src, ok in [("nn", nn_src, jnp.isfinite(nn_cost)),
                          ("gp", jnp.maximum(gp_src, 0), gp_ok)]:
        x_s = tree.state[src]
        d_pos = jnp.linalg.norm((x_t - x_s)[:, :2], axis=-1)
        d_t = time_t - tree.node_time[src]
        print(f"[{name}] valid={float(jnp.mean(ok.astype(jnp.float32))):.3f} "
              f"pos_dist p50={float(jnp.median(d_pos)):.2f} "
              f"p90={float(jnp.percentile(d_pos, 90)):.2f}  "
              f"dt_slack p50={float(jnp.median(d_t)):.2f}s")
        for sname, st in steers.items():
            res = jax.jit(st)(x_s, tree.K[src], x_t)
            t_new = tree.node_time[src] + res.length.astype(jnp.float32) * dt
            reached = res.reached & ok
            improve = reached & (t_new < time_t - 1e-4)
            hor = st is steers.get("1xH_obs") and H or 3 * H
            stopped_feas = (~res.reached) & (res.length < hor) & ok
            print(f"    {sname}: reached={float(jnp.mean(reached.astype(jnp.float32))):.3f} "
                  f"improve={float(jnp.mean(improve.astype(jnp.float32))):.3f} "
                  f"len p50={float(jnp.median(res.length)):.0f} "
                  f"stop_infeas={float(jnp.mean(stopped_feas.astype(jnp.float32))):.3f} "
                  f"final_err p50={float(jnp.median(jnp.linalg.norm(jax.vmap(prob['erf'])(x_t, res.xnew), axis=-1))):.3f}")


if __name__ == "__main__":
    main()
