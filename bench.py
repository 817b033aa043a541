"""Benchmark: boat-demo tree expansions/s/chip vs the single-CPU numpy oracle.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

metric definition (BASELINE.json): tree expansions/s/chip on the Navigator
WAM-V boat demo under the ~1 s replan budget.  The reference publishes no
numbers (SURVEY.md section 6), so the baseline is the numpy oracle — a
faithful sequential re-implementation of the reference algorithm — measured
on one CPU core in this same run.  vs_baseline = TPU expansions/s / oracle
expansions/s (north star: >= 100x).

Extra diagnostics (p50 replan latency, goal rate) go to stderr.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_oracle(prob, budget_s=3.0):
    from lqrrt_tpu.oracle import numpy_planner as oracle
    import scipy.linalg  # noqa: F401  (oracle lqr built from jax model below)
    from lqrrt_tpu.models import boat as jboat
    import jax

    dyn_np, sat_np = oracle.boat_dynamics_factory()
    S, K = prob["lqr"](None, None)
    S = np.asarray(jax.device_get(S), np.float64)
    K = np.asarray(jax.device_get(K), np.float64)
    feas = oracle.make_circle_feasibility(*prob["obstacles"], margin=1.0)
    orc = oracle.NumpyOracle(
        dynamics=dyn_np, lqr=lambda x, u: (S, K), erf=oracle.boat_erf,
        is_feasible=feas, goal_buffer=prob["constraints"].goal_buffer,
        horizon=prob["horizon"], dt=prob["dt"], saturate=sat_np)
    reached, stats, _ = orc.plan(
        prob["x0"], prob["goal"], prob["sample_space"], goal_bias=0.2,
        seed=0, min_time=budget_s, max_time=budget_s)
    log(f"oracle (1 CPU core, sequential reference semantics): "
        f"{stats['expansions_per_s']:.0f} expansions/s, "
        f"nodes={stats['nodes']}, goal={reached}")
    return stats["expansions_per_s"]


def bench_tpu(prob, budget_s=1.0, batch=8192, capacity=32768, repeats=3):
    import lqrrt_tpu

    planner = lqrrt_tpu.Planner(
        prob["dynamics"], prob["lqr"], prob["constraints"],
        horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
        printing=False, batch_size=batch, capacity=capacity,
        wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], seed=0)
    # warm the jit cache (compile excluded from the timed budget); pruning
    # on so the shortcut-steer program compiles here, not in the p50 runs
    planner.update_plan(prob["x0"], prob["sample_space"], goal_bias=0.0,
                        specific_time=0.05, pruning=True)
    eps, lats, goals = [], [], 0
    for r in range(repeats):
        planner._key = __import__("jax").random.PRNGKey(100 + r)
        t0 = time.time()
        reached = planner.update_plan(
            prob["x0"], prob["sample_space"], goal_bias=0.0,
            specific_time=budget_s, pruning=False)
        lats.append(time.time() - t0)
        eps.append(planner.stats["expansions_per_s"])
        goals += int(reached)
        log(f"  tpu run {r}: {planner.stats['expansions_per_s']:.0f} exp/s, "
            f"{planner.stats['rounds']} rounds, nodes={planner.stats['nodes']}, "
            f"goal={reached}")
    # p50 replan latency with the anytime goal-biased configuration
    glats = []
    for r in range(repeats):
        planner._key = __import__("jax").random.PRNGKey(200 + r)
        t0 = time.time()
        planner.update_plan(prob["x0"], prob["sample_space"],
                            goal_bias=[0.3, 0.3, 0, 0, 0, 0])
        glats.append(time.time() - t0)
    log(f"tpu p50 replan latency (goal-biased, [0.5,1]s budget): "
        f"{np.median(glats):.3f}s")
    return float(np.median(eps)), float(np.median(glats))


def main():
    import jax
    from lqrrt_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".jax_cache"))
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    from lqrrt_tpu.models import boat
    t0 = time.time()
    prob = boat.default_problem()
    log(f"problem setup: {time.time()-t0:.1f}s")

    oracle_eps = bench_oracle(prob)
    tpu_eps, p50 = bench_tpu(prob)

    print(json.dumps({
        "metric": "boat_tree_expansions_per_s_per_chip",
        "value": round(tpu_eps, 1),
        "unit": "expansions/s",
        "vs_baseline": round(tpu_eps / max(oracle_eps, 1e-9), 2),
        "baseline_cpu_expansions_per_s": round(oracle_eps, 1),
        "p50_replan_latency_s": round(p50, 3),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
