"""Benchmark: boat-demo tree expansions/s/chip vs the single-CPU numpy oracle.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

metric definition (BASELINE.json): tree expansions/s/chip on the Navigator
WAM-V boat demo under the ~1 s replan budget.  The reference publishes no
numbers (SURVEY.md section 6), so the baseline is the numpy oracle — a
faithful sequential re-implementation of the reference algorithm — measured
on one CPU core in this same run.  vs_baseline = TPU expansions/s / oracle
expansions/s (north star: >= 100x).

Extra fields in the same JSON line:
  pallas_equiv_*        on-device Pallas-vs-jnp NN kernel equivalence at
                        bench shapes (SURVEY.md section 4 item 1)
  plan_duration_s_*     boat plan quality at 0.2 s vs 1.0 s anytime budgets
  refine_quality_ok     true iff the 1.0 s plan is STRICTLY shorter than the
                        0.2 s plan (anytime restarts must buy quality,
                        VERDICT round 2 item 1)
  quality_*             oracle-vs-TPU plan-quality ratios for boat, car and
                        quadrotor, averaged over seeds (golden parity,
                        SURVEY.md section 4 item 2)

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
    # warm EVERY dispatchable program (compile excluded from the timed
    # budget): grow chunk, restart-stash score, extraction, and the
    # shortcut-steer batch — so run 0 is within ~2x of steady state
    # (VERDICT round 2 weak #2: a lazily-compiled variant cost run 0 a 72x
    # slowdown in round 2)
    planner.warmup(prob["x0"], prob["sample_space"], goal_bias=0.0,
                   pruning=True)
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

    # plan quality vs anytime budget: anytime restarts (stash best tree,
    # reseed with chain planting, keep growing) must keep buying quality —
    # the 1.0 s plans must be strictly shorter than the 0.2 s plans ON
    # AVERAGE over fixed seeds (VERDICT round 2 item 1; SURVEY.md C2).
    # Round 5: 3-seed means — the flagship instance saturates within ~1% of
    # its 16.75 s floor (QUALITY_r05.json), so a single-seed strict
    # comparison flips sign on noise once a 0.2 s run lands on the floor.
    durs = {}
    for budget in (0.2, 1.0):
        vals = []
        for seed in (777, 101, 202):
            planner._key = __import__("jax").random.PRNGKey(seed)
            planner.update_plan(prob["x0"], prob["sample_space"],
                                goal_bias=[0.3, 0.3, 0, 0, 0, 0],
                                specific_time=budget, pruning=True)
            vals.append(float(planner.T))
        durs[budget] = round(float(np.mean(vals)), 3)
        log(f"  plan quality: budget {budget}s -> durations {vals} "
            f"(mean {durs[budget]:.2f}s)")
    return float(np.median(eps)), float(np.median(glats)), durs


def bench_pallas_equiv(n=6, wrap_dim=2, N=32768, B=8192, block=1024, seed=3):
    """On-device equivalence of the Pallas NN kernels vs the jnp path at
    bench shapes (SURVEY.md section 4 item 1; VERDICT round 1 item 5/6:
    the MXU HIGHEST path + cancellation centering had only been checked in
    interpret mode on CPU).

    Ties and fp noise can legitimately flip an argmin, so equivalence is
    adjudicated on COST: both paths' chosen nodes are re-scored in fp64
    numpy; pass = every Pallas choice within rtol of the jnp choice.
    """
    import jax
    import jax.numpy as jnp
    from lqrrt_tpu.core.nearest import make_nearest
    from lqrrt_tpu.ops.angles import make_erf
    from lqrrt_tpu.ops.pallas.nn_kernel import (make_nearest_const_pallas,
                                                make_nearest_pallas)

    interp = jax.devices()[0].platform != "tpu"
    erf = make_erf(n, angle_dims=(wrap_dim,))
    ref = jax.jit(make_nearest(erf, block=block))
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    scale = jnp.asarray([40.0, 40.0, np.pi, 3.0, 3.0, 1.0][:n])
    states = jax.random.uniform(ks[0], (N, n), minval=-1, maxval=1) * scale
    xrand = jax.random.uniform(ks[1], (B, n), minval=-1, maxval=1) * scale
    A = jax.random.normal(ks[2], (N, n, n)) * 0.3
    S_var = A @ jnp.swapaxes(A, 1, 2) + 2.0 * jnp.eye(n)
    S_const = jnp.broadcast_to(S_var[0], (N, n, n))
    size = jnp.asarray(N - 173, jnp.int32)  # uneven live prefix

    st64 = np.asarray(states, np.float64)
    xr64 = np.asarray(xrand, np.float64)

    def cost64(S64, ids):
        e = xr64 - st64[ids]
        e[:, wrap_dim] = np.mod(e[:, wrap_dim] + np.pi, 2 * np.pi) - np.pi
        return np.einsum("bi,bij,bj->b", e, S64[ids], e)

    def brute64(S64, rows):
        # true fp64 optimum over ALL live nodes for a candidate subsample —
        # anchors the jnp reference side so a shared systematic error in
        # both on-device paths cannot pass silently (ADVICE round 2)
        live = int(np.asarray(size))
        e = xr64[rows, None, :] - st64[None, :live, :]
        e[..., wrap_dim] = np.mod(e[..., wrap_dim] + np.pi,
                                  2 * np.pi) - np.pi
        return np.einsum("bni,nij,bnj->bn", e, S64[:live], e).min(axis=1)

    out = {}
    anchor_rows = np.arange(0, B, max(B // 256, 1))[:256]
    cases = [
        ("pallas", make_nearest_pallas(block=block, wrap_dim=wrap_dim,
                                       interpret=interp), S_var),
        ("pallas_const", make_nearest_const_pallas(block=block,
                                                   wrap_dim=wrap_dim,
                                                   interpret=interp), S_const),
    ]
    for name, fn, S in cases:
        S64 = np.asarray(S, np.float64)
        ids_r, _ = jax.device_get(ref(states, S, size, xrand))
        ids_p, _ = jax.device_get(jax.jit(fn)(states, S, size, xrand))
        c_r, c_p = cost64(S64, ids_r), cost64(S64, ids_p)
        id_match = float(np.mean(ids_r == ids_p))
        # Pallas choice must not be worse than the jnp choice beyond fp slop
        rel_excess = (c_p - c_r) / np.maximum(np.abs(c_r), 1e-6)
        worst = float(np.max(rel_excess))
        # two-sided anchor: the jnp reference itself must match the true
        # fp64 optimum on a candidate subsample (guards against a shared
        # systematic error passing the one-sided check, ADVICE round 2)
        c_star = brute64(S64, anchor_rows)
        ref_excess = float(np.max(
            (c_r[anchor_rows] - c_star) / np.maximum(np.abs(c_star), 1e-6)))
        ok = bool(worst <= 5e-3 and ref_excess <= 5e-3)
        out[f"pallas_equiv_{name}_ok"] = ok
        out[f"pallas_equiv_{name}_id_match"] = round(id_match, 4)
        out[f"pallas_equiv_{name}_ref_vs_fp64_excess"] = round(ref_excess, 6)
        log(f"pallas equiv [{name}]: id_match={id_match:.4f}, "
            f"worst_rel_cost_excess={worst:.2e}, "
            f"ref_vs_fp64_excess={ref_excess:.2e}, ok={ok}")
    return out


def _oracle_problem(name, goal_entry_trunc=False):
    """(oracle planner, jax problem dict, per-dim goal bias) for a model.

    ``goal_entry_trunc=True`` gives the oracle the same first-entry goal
    truncation the TPU planner uses, so quality ratios compare planners and
    not dt resolution (VERDICT r3 item 4)."""
    from lqrrt_tpu.oracle import numpy_planner as oracle

    if name == "boat":
        from lqrrt_tpu.models import boat as model
        import jax
        prob = model.default_problem()
        dyn_np, sat_np = oracle.boat_dynamics_factory()
        S, K = prob["lqr"](None, None)
        S = np.asarray(jax.device_get(S), np.float64)
        K = np.asarray(jax.device_get(K), np.float64)
        lqr_np = lambda x, u: (S, K)  # noqa: E731
        erf_np = oracle.boat_erf
        margin = 1.0
        bias = [0.3, 0.3, 0, 0, 0, 0]
    elif name == "car":
        from lqrrt_tpu.models import car as model
        prob = model.default_problem()
        dyn_np, sat_np, f_np = oracle.car_dynamics_factory()

        def x_map(x):
            v = x[3]
            x = x.copy()
            x[3] = (-0.8 if v < 0 else 0.8) if abs(v) < 0.8 else v
            return x

        lqr_np = oracle.make_scipy_relinearized_lqr(
            f_np, np.diag([1.0, 1.0, 0.5, 0.3]), np.diag([0.5, 2.0]),
            u_eq=np.zeros(2), x_map=x_map)
        erf_np = oracle.make_erf_np(angle_dims=(2,))
        margin = 0.5
        bias = [0.3, 0.3, 0, 0]
    elif name == "quadrotor":
        from lqrrt_tpu.models import quadrotor as model
        prob = model.default_problem()
        dyn_np, sat_np, f_np = oracle.quadrotor_dynamics_factory()
        lqr_np = oracle.make_scipy_relinearized_lqr(
            f_np,
            np.diag([1.0, 1.0, 1.0, 2.0, 2.0, 1.0, 0.3, 0.3, 0.3,
                     0.1, 0.1, 0.1]),
            np.diag([0.02, 2.0, 2.0, 2.0]), u_eq=np.zeros(4))
        erf_np = oracle.make_erf_np(angle_dims=(5,))
        margin = 0.3
        bias = [0.3, 0.3, 0.3] + [0.0] * 9
    else:
        raise ValueError(name)
    feas = oracle.make_circle_feasibility(*prob["obstacles"], margin=margin)
    orc = oracle.NumpyOracle(
        dynamics=dyn_np, lqr=lqr_np, erf=erf_np, is_feasible=feas,
        goal_buffer=prob["constraints"].goal_buffer,
        horizon=prob["horizon"], dt=prob["dt"], saturate=sat_np,
        goal_entry_trunc=goal_entry_trunc)
    return orc, prob, np.asarray(bias, np.float64)


def bench_quality(names=("boat", "car", "quadrotor"), tpu_budget=1.0):
    """Oracle-vs-TPU plan quality over multiple seeds (golden parity,
    SURVEY.md section 4 item 2; VERDICT round 2 item 9).  Ratio = TPU plan
    duration / oracle plan duration; both planners get the same problem,
    same per-dim goal bias, disjoint solver stacks end to end.  Reported:
    per-seed ratios + mean + spread, so the headline numbers carry their
    variance.

    Apples-to-apples (VERDICT r3 item 4): the oracle runs with the SAME
    first-entry goal truncation the TPU planner uses (goal_entry_trunc=True)
    so the ratio no longer includes the TPU side's free dt resolution.
    """
    import lqrrt_tpu

    # Oracle budgets: the sequential reference needs far longer than the TPU
    # planner to reach the goal at all.  The nonholonomic car gets 30 s and
    # seeds verified to give it a fighting chance (at 20 s / seed 7 it never
    # reached the goal, leaving the ratio unmeasured — VERDICT round 2 weak
    # #8).  Budgets sized so the oracle reaches the goal on most seeds even
    # when the host is having a slow session (oracle nodes/s varies ~2x run
    # to run; a too-tight budget collapses the measurable-ratio count).
    oracle_budget = {"boat": 8.0, "car": 24.0, "quadrotor": 24.0}
    seeds_10 = (7, 11, 23, 31, 47, 5, 13, 17, 29, 41)
    seeds = {"boat": seeds_10, "car": seeds_10, "quadrotor": seeds_10}
    out = {}
    for name in names:
        orc, prob, bias = _oracle_problem(name, goal_entry_trunc=True)
        ob = oracle_budget.get(name, 6.0)
        planner = lqrrt_tpu.Planner(
            prob["dynamics"], prob["lqr"], prob["constraints"],
            horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
            printing=False, batch_size=1024, capacity=4096,
            wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], seed=7)
        planner.warmup(prob["x0"], prob["sample_space"],
                       goal_bias=list(bias), pruning=False)  # untimed
        ratios, go, gt = [], 0, 0
        for seed in seeds.get(name, (7,)):
            reached_o, stats_o, _ = orc.plan(
                prob["x0"], prob["goal"], prob["sample_space"],
                goal_bias=bias, seed=seed, min_time=ob, max_time=ob)
            planner._key = __import__("jax").random.PRNGKey(seed)
            # pruning off: the oracle extracts its raw best branch, so the
            # fair duration comparison is the unsmoothed TPU branch
            reached_t = planner.update_plan(
                prob["x0"], prob["sample_space"], goal_bias=list(bias),
                specific_time=tpu_budget, pruning=False)
            dur_o = float(stats_o["plan_duration_s"])
            dur_t = float(planner.T)
            go += int(reached_o)
            gt += int(reached_t)
            ratio = (round(dur_t / dur_o, 3) if reached_o and reached_t
                     and dur_o > 0 else None)
            if ratio is not None:
                ratios.append(ratio)
            log(f"quality [{name}] seed {seed}: oracle {dur_o:.2f}s "
                f"(goal={reached_o}, {stats_o['nodes']} nodes in {ob}s) vs "
                f"tpu {dur_t:.2f}s (goal={reached_t}) -> ratio={ratio}")
        n = len(seeds.get(name, (7,)))
        out[f"quality_{name}_goal_oracle"] = f"{go}/{n}"
        out[f"quality_{name}_goal_tpu"] = f"{gt}/{n}"
        out[f"quality_{name}_duration_ratio"] = (
            round(float(np.mean(ratios)), 3) if ratios else None)
        out[f"quality_{name}_duration_ratio_seeds"] = ratios
        out[f"quality_{name}_duration_ratio_spread"] = (
            [round(float(np.min(ratios)), 3), round(float(np.max(ratios)), 3)]
            if ratios else None)
        log(f"quality [{name}]: mean ratio "
            f"{out[f'quality_{name}_duration_ratio']} over {len(ratios)} "
            f"measurable seeds, spread "
            f"{out[f'quality_{name}_duration_ratio_spread']} "
            f"(oracle goal {go}/{n}, tpu goal {gt}/{n})")
    return out


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

    extra = {}
    # NN-kernel equivalence gate BEFORE timing (VERDICT round 1 item 6)
    try:
        extra.update(bench_pallas_equiv())
    except Exception as e:  # never lose the headline metric to a gate bug
        log(f"pallas equiv check failed to run: {e!r}")
        extra["pallas_equiv_error"] = repr(e)

    oracle_eps = bench_oracle(prob)
    tpu_eps, p50, durs = bench_tpu(prob)
    extra["plan_duration_s_budget_0p2"] = round(durs[0.2], 3)
    extra["plan_duration_s_budget_1p0"] = round(durs[1.0], 3)
    # explicit pass/fail so a refinement regression cannot hide in identical
    # durations (ADVICE round 2; VERDICT round 2 item 1 "Done =" criterion)
    extra["refine_quality_ok"] = bool(durs[1.0] < durs[0.2] - 1e-3)
    log(f"refine quality gate (1.0s strictly shorter than 0.2s): "
        f"{extra['refine_quality_ok']}")

    try:
        extra.update(bench_quality())
    except Exception as e:
        log(f"quality parity failed to run: {e!r}")
        extra["quality_error"] = repr(e)

    print(json.dumps({
        "metric": "boat_tree_expansions_per_s_per_chip",
        "value": round(tpu_eps, 1),
        "unit": "expansions/s",
        "vs_baseline": round(tpu_eps / max(oracle_eps, 1e-9), 2),
        "baseline_cpu_expansions_per_s": round(oracle_eps, 1),
        "p50_replan_latency_s": round(p50, 3),
        "device": str(dev),
        **extra,
    }))


if __name__ == "__main__":
    main()
