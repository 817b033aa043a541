"""WAM-V boat demo — the headline workload (reference demos/*, SURVEY.md D3).

Plans a 40 m transit through a buoy field, then simulates the vessel tracking
the plan (feedforward efforts + LQR feedback on the planned state), and saves
a tree/plan figure.  Run:  python demos/boat_demo.py [--replan]
"""
import argparse
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import lqrrt_tpu  # noqa: E402
from lqrrt_tpu.models import boat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replan", action="store_true",
                    help="run a 1 Hz replanning loop instead of a single plan")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="boat_demo.png")
    args = ap.parse_args()

    prob = boat.default_problem()
    planner = lqrrt_tpu.Planner(
        prob["dynamics"], prob["lqr"], prob["constraints"],
        horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
        min_time=0.3, max_time=1.0,          # the reference's ~1 s replan budget
        batch_size=256, capacity=8192, seed=args.seed,
        wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], FPR=0.2)

    # warm the jit cache so the first timed replan is honest
    planner.update_plan(prob["x0"], prob["sample_space"], goal_bias=0.2,
                        specific_time=0.05, pruning=False)

    t0 = time.time()
    reached = planner.update_plan(prob["x0"], prob["sample_space"],
                                  goal_bias=[0.3, 0.3, 0, 0, 0, 0],
                                  finish_on_goal=True)
    print(f"plan: reached_goal={reached} in {time.time()-t0:.2f}s "
          f"stats={planner.stats}")

    # --- simulate tracking the plan (reference demo sim loop, SURVEY.md 3.5)
    x = np.asarray(prob["x0"], np.float32)
    dt = prob["dt"]
    S, K = prob["lqr"](None, None)
    dyn = prob["dynamics"]
    erf = prob["erf"]
    traj = [x.copy()]
    for k in range(int(planner.T / dt) + 40):
        t = k * dt
        xref = planner.get_state(t)
        uff = planner.get_effort(t)
        u = uff + np.asarray(K) @ np.asarray(erf(jnp.asarray(xref),
                                                 jnp.asarray(x)))
        u = np.asarray(boat.saturate(jnp.asarray(u)))
        x = np.asarray(dyn(jnp.asarray(x), jnp.asarray(u), dt))
        traj.append(x.copy())
    traj = np.asarray(traj)
    end_err = np.abs(np.asarray(prob["goal"])[:2] - traj[-1][:2])
    print(f"tracking: final position error = {end_err} m over {planner.T:.1f}s plan")

    # obstacle clearance check for the executed trajectory
    centers, radii = prob["obstacles"]
    d = np.linalg.norm(traj[:, None, :2] - np.asarray(centers)[None], axis=-1)
    clearance = (d - np.asarray(radii)[None]).min()
    print(f"tracking: min obstacle clearance = {clearance:.2f} m")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    ax = planner.visualize(0, 1, show=False)
    ax.plot(traj[:, 0], traj[:, 1], "--", lw=1.5, c="#3355cc", label="executed")
    for c, r in zip(np.asarray(centers), np.asarray(radii)):
        ax.add_patch(plt.Circle(c, r, fc="#223344", alpha=0.4))
    ax.legend(loc="best")
    plt.savefig(args.out, dpi=110, bbox_inches="tight")
    print(f"figure saved to {args.out}")
    return 0 if reached and clearance > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
