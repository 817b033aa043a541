"""Phase-level timing of one expansion round at the bench operating point,
plus a device-utilization artifact (SURVEY.md section 5.1; VERDICT round 2
item 4): phase breakdown and achieved-FLOP/s vs the chip's peak for the NN
kernel and the steer scan.  Writes PROFILE_JSON (default PROFILE_r04.json at
the repo root) when run on a TPU.

Times (jitted separately, fenced): sample, nearest (pallas + jnp), steer,
endpoint LQR, commit, and the full fused round.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):  # env var alone is not honored here
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

# TPU v5e (v5 lite) peaks — public spec sheet numbers
V5E_PEAK_BF16 = 197e12        # FLOP/s
V5E_PEAK_HBM = 819e9          # bytes/s

from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from lqrrt_tpu.core.rounds import RoundSpec, make_expand, make_round, jit_round
from lqrrt_tpu.core.sampling import sample_batch
from lqrrt_tpu.core.steer import make_steer
from lqrrt_tpu.core.tree import init_tree
from lqrrt_tpu.models import boat

BATCH = int(os.environ.get("BATCH", 8192))
CAP = int(os.environ.get("CAP", 32768))


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    prob = boat.default_problem()
    H = int(round(prob["horizon"] / prob["dt"]))
    spec = RoundSpec(6, 3, BATCH, H, CAP, prob["dt"],
                     nn_block=min(2048, CAP), slack=BATCH)
    S0, K0 = prob["lqr"](None, None)
    tree = init_tree(CAP, H, 6, 3, jnp.asarray(prob["x0"]), S0, K0, 1e9,
                     False, slack=BATCH)
    key = jax.random.PRNGKey(0)
    goal = jnp.asarray(prob["goal"])
    ss = jnp.asarray(prob["sample_space"])
    gb = jnp.full((6,), 0.0)
    wrap_mask = np.zeros(6, bool); wrap_mask[2] = True

    rf = jit_round(make_round(spec, prob["dynamics"], prob["lqr"],
                              prob["erf"], prob["constraints"].is_feasible,
                              0.05, prob["constraints"].goal_buffer,
                              wrap_mask=wrap_mask,
                              saturate=prob["saturate"]))
    # grow the tree to ~half capacity so NN cost is representative
    t = tree
    for i in range(2):
        t = rf(t, jax.random.fold_in(key, i), goal, ss, gb, goal)
    t = jax.tree.map(lambda a: a.copy() if hasattr(a, "copy") else a, t)
    print("tree size for profiling:", int(t.size))

    # full round (non-donated copy each call would distort; donate via fresh)
    def run_round(tree_in, k):
        return rf(jax.tree.map(jnp.array, tree_in), k, goal, ss, gb, goal)
    # time full round w/o the copy using a non-donating jit
    # the production configuration: the auto-selected const-metric Pallas NN
    # (the boat's lqr is state-independent, detected by probing)
    from lqrrt_tpu.ops.pallas.nn_kernel import make_nearest_const_pallas
    nn_prod = make_nearest_const_pallas(block=spec.nn_block, wrap_dim=2)
    rf_nodon = jax.jit(make_round(spec, prob["dynamics"], prob["lqr"],
                                  prob["erf"], prob["constraints"].is_feasible,
                                  0.05, prob["constraints"].goal_buffer,
                                  wrap_mask=wrap_mask,
                                  saturate=prob["saturate"],
                                  nearest_fn=nn_prod))
    t_round = timeit(rf_nodon, t, key, goal, ss, gb, goal)
    print(f"full round:      {t_round*1e3:8.3f} ms  "
          f"({BATCH/t_round:,.0f} exp/s)  [production: pallas_const NN]")
    ph = {"round_ms": t_round * 1e3,
          "round_expansions_per_s": BATCH / t_round}

    # --- phases ---
    samp = jax.jit(lambda k: sample_batch(k, spec.batch, ss, gb, goal))
    ph["sample_ms"] = timeit(samp, key) * 1e3
    print(f"  sample:        {ph['sample_ms']:8.3f} ms")

    from lqrrt_tpu.core.nearest import make_nearest
    xrand = samp(key)
    nn_jnp = jax.jit(lambda st, S, sz, xr: make_nearest(
        prob["erf"], block=spec.nn_block)(st, S, sz, xr))
    ph["nearest_jnp_ms"] = timeit(nn_jnp, t.state, t.S, t.size, xrand) * 1e3
    print(f"  nearest (jnp): {ph['nearest_jnp_ms']:8.3f} ms")
    try:
        from lqrrt_tpu.ops.pallas.nn_kernel import (feature_dim,
                                                    make_nearest_pallas)
        nn_pl = jax.jit(lambda st, S, sz, xr: make_nearest_pallas(
            block=spec.nn_block, wrap_dim=2)(st, S, sz, xr))
        t_nn = timeit(nn_pl, t.state, t.S, t.size, xrand)
        ph["nearest_pallas_ms"] = t_nn * 1e3
        print(f"  nearest (pal): {t_nn*1e3:8.3f} ms")
        # achieved FLOP/s vs peak: same formula as the kernel's CostEstimate
        # (2 groups of (B,F)x(F,blk) MXU matmuls when the erf wraps an angle)
        N_nodes, n = CAP, 6
        flops = 2 * 2 * BATCH * N_nodes * feature_dim(n)
        achieved = flops / t_nn
        ph["nn_kernel_gflops"] = achieved / 1e9
        ph["nn_kernel_frac_of_v5e_bf16_peak"] = achieved / V5E_PEAK_BF16
        # bandwidth side (features + S diag + outputs, from the CostEstimate)
        F = feature_dim(n)
        nbytes = (2 * BATCH * F + (N_nodes // spec.nn_block) * N_nodes * F
                  + 2 * N_nodes) * 4 + BATCH * 8
        ph["nn_kernel_gbps"] = nbytes / t_nn / 1e9
        print(f"    NN kernel: {achieved/1e12:.2f} TFLOP/s "
              f"({100*achieved/V5E_PEAK_BF16:.1f}% of v5e bf16 peak), "
              f"{nbytes/t_nn/1e9:.0f} GB/s")
        # the const-metric VPU kernel (what the boat production path runs):
        # whitened-distance form, (2n+5)-ish flops per pair on the VPU
        nn_cp = jax.jit(lambda st, S, sz, xr: nn_prod(st, S, sz, xr))
        t_cn = timeit(nn_cp, t.state, t.S, t.size, xrand)
        ph["nearest_pallas_const_ms"] = t_cn * 1e3
        cflops = 3 * BATCH * N_nodes * (6 + 4)
        ph["nn_const_kernel_gflops"] = cflops / t_cn / 1e9
        print(f"  nearest (const): {t_cn*1e3:6.3f} ms "
              f"({cflops/t_cn/1e12:.2f} TFLOP/s VPU)")
    except Exception as e:
        print("  nearest (pal): FAILED", e)

    steer = make_steer(prob["dynamics"], prob["erf"],
                       prob["constraints"].is_feasible, H, prob["dt"], 0.05,
                       saturate=prob["saturate"], goal_buffer=prob[
                           "constraints"].goal_buffer, layout="tm")
    pids, _ = nn_jnp(t.state, t.S, t.size, xrand)
    x0 = t.state[pids]; Kp = t.K[pids]
    steer_j = jax.jit(steer)
    t_st = timeit(steer_j, x0, Kp, xrand, goal)
    ph["steer_ms"] = t_st * 1e3
    # steer FLOPs: per step u=Ke (2mn) + rk4 = 4 f evals (boat f ~ 90) +
    # state combos (~10n) + goal/tol tests (~6n) — ~550 flop/step/candidate
    st_flops = BATCH * H * 550
    ph["steer_gflops"] = st_flops / t_st / 1e9
    ph["steer_frac_of_v5e_bf16_peak"] = st_flops / t_st / V5E_PEAK_BF16
    print(f"  steer (H={H}): {t_st*1e3:8.3f} ms  "
          f"({st_flops/t_st/1e9:.1f} GFLOP/s — latency-bound tiny-tensor "
          f"scan, not MXU work)")

    res = steer_j(x0, Kp, xrand, goal)
    lqr_b = jax.jit(jax.vmap(prob["lqr"]))
    u_last = res.u_seq[-1, :, :].T              # time-major (H, m, B)
    ph["endpoint_lqr_ms"] = timeit(lqr_b, res.xnew, u_last) * 1e3
    print(f"  endpoint lqr:  {ph['endpoint_lqr_ms']:8.3f} ms")

    from lqrrt_tpu.core.commit import commit_batch_dense_all
    S_new, K_new = lqr_b(res.xnew, u_last)
    ing = jnp.zeros((BATCH,), bool)
    gc = jnp.zeros((BATCH,), jnp.float32)
    com = jax.jit(lambda tr: commit_batch_dense_all(
        jax.tree.map(jnp.array, tr), spec.dt, spec.capacity, pids, res.length,
        res.x_seq, res.u_seq, res.xnew, S_new, K_new, ing, gc))
    ph["commit_all_ms"] = timeit(com, t) * 1e3
    print(f"  commit(all):   {ph['commit_all_ms']:8.3f} ms   (incl tree copy)")

    # --- the PRODUCTION path: one fused-restart chunk cycle, isolated ---
    # (grow F rounds + on-device stash-compare + reseed; VERDICT r3 items
    # 1/5 — the isolated-vs-headline gap table)
    import lqrrt_tpu
    planner = lqrrt_tpu.Planner(
        prob["dynamics"], prob["lqr"], prob["constraints"],
        horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
        printing=False, batch_size=BATCH, capacity=CAP,
        wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], seed=0)
    chunk = planner._get_restart_chunk(None, 0)
    n_cycles, F = planner._restart_chunk_shape
    seedf = planner._get_seed_tree()
    gbuf = planner.constraints.goal_buffer
    cur = seedf(jnp.asarray(prob["x0"]), planner.goal, gbuf)
    best = seedf(jnp.asarray(prob["x0"]), planner.goal, gbuf)
    pool = jnp.zeros((256, 6))
    score = jnp.asarray(planner._RSCORE0, jnp.float32)
    out = chunk(cur, best, pool, score, key, 0, planner.goal, ss, gb,
                planner.goal)
    cur, best, pool, score, st_ = out
    jax.block_until_ready(st_)
    t0 = time.perf_counter()
    R = 10
    for i in range(R):
        cur, best, pool, score, st_ = chunk(
            cur, best, pool, score, key, i * n_cycles * F, planner.goal,
            ss, gb, planner.goal)
    jax.block_until_ready(st_)
    per_round = (time.perf_counter() - t0) / (R * n_cycles * F) * 1e3
    ph["restart_chunk_round_ms"] = per_round
    ph["restart_chunk_exp_per_s"] = BATCH / per_round * 1e3
    print(f"  fused-restart chunk: {per_round:8.3f} ms/round "
          f"({BATCH/per_round*1e3:,.0f} exp/s incl stash+reseed)")

    dev = jax.devices()[0]
    ph["device"] = str(dev)
    ph["batch"] = BATCH
    ph["capacity"] = CAP
    ph["horizon_steps"] = H
    ph["tree_size"] = int(t.size)
    if dev.platform == "tpu":
        out = os.environ.get("PROFILE_JSON", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PROFILE_r04.json"))
        with open(out, "w") as f:
            json.dump({k: (round(v, 4) if isinstance(v, float) else v)
                       for k, v in ph.items()}, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
