"""Round-5 phase profile with a SYNCHRONIZING harness (PROFILE_r05.json).

The round-4 profile timed phases as standalone dispatches with
block_until_ready, which does NOT synchronize on this backend (async
dispatch queue; only a device fetch does) — those numbers mixed enqueue
time, dispatch latency, and real compute.  Here every measurement is a
chained computation (iteration i+1 consumes iteration i's output) inside
donated jitted programs, timed across enough work that the one final fetch
(~20 ms tunnel round trip) is amortized:

* full grow round + fused-restart chunk: donated chunk chains (as before —
  those were already honest because the tree carry chains them)
* per-phase composed costs: knockout deltas inside the same 8-round chunk
  (drop one phase, keep the rest live through sinks)
* NN kernel: composed fori-loop at several live sizes

Writes PROFILE_JSON (default PROFILE_r05.json).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from lqrrt_tpu.core.commit import commit_batch_dense_all
from lqrrt_tpu.core.rounds import RoundSpec, make_round
from lqrrt_tpu.core.sampling import sample_batch
from lqrrt_tpu.core.steer import SteerResult, make_steer
from lqrrt_tpu.core.tree import init_tree
from lqrrt_tpu.models import boat
from lqrrt_tpu.ops.pallas.nn_kernel import make_nearest_const_pallas
from lqrrt_tpu.ops.angles import wrap_angle

V5E_PEAK_BF16 = 197e12
V5E_PEAK_HBM = 819e9

BATCH = int(os.environ.get("BATCH", 8192))
CAP = int(os.environ.get("CAP", 32768))
RPC, CHUNKS = 8, 8


def main():
    prob = boat.default_problem()
    H = int(round(prob["horizon"] / prob["dt"]))
    n, m = 6, 3
    wrap_mask = np.zeros(n, bool); wrap_mask[2] = True
    wm = jnp.asarray(wrap_mask)
    goal = jnp.asarray(prob["goal"])
    ss = jnp.asarray(prob["sample_space"])
    gb = jnp.full((n,), 0.0)
    S0, K0 = prob["lqr"](None, None)
    nn = make_nearest_const_pallas(block=2048, wrap_dim=2)
    spec = RoundSpec(n, m, BATCH, H, CAP, prob["dt"], nn_block=2048,
                     slack=BATCH, commit_all=True)
    ph = {}
    key = jax.random.PRNGKey(0)

    def fresh_tree():
        return init_tree(CAP, H, n, m, jnp.asarray(prob["x0"]), S0, K0,
                         1e9, False, slack=BATCH)

    lqr_b = jax.vmap(prob["lqr"])
    erf_goal = jax.vmap(prob["erf"], in_axes=(None, 0))
    gbuf = jnp.asarray(prob["constraints"].goal_buffer, jnp.float32)
    steer_tm = make_steer(prob["dynamics"], prob["erf"],
                          prob["constraints"].is_feasible, H, prob["dt"],
                          0.05, saturate=prob["saturate"],
                          goal_buffer=prob["constraints"].goal_buffer,
                          layout="tm")

    def make_variant(drop):
        def round_fn(tree, k):
            xrand = sample_batch(k, BATCH, ss, gb, goal)
            if drop == "nn":
                pids = (jnp.arange(BATCH, dtype=jnp.int32)
                        % jnp.maximum(tree.size, 1))
            else:
                pids, _ = nn(tree.state, tree.S, tree.size, xrand)
            x0 = tree.state[pids]
            K0g = tree.K[pids]
            if drop == "steer":
                res = SteerResult(
                    jnp.broadcast_to(x0.T[None], (H, n, BATCH)) * 1.0001,
                    jnp.zeros((H, m, BATCH)), jnp.zeros((H, BATCH), bool),
                    jnp.ones((BATCH,), jnp.int32), x0 + 0.01 * xrand,
                    jnp.zeros((BATCH,), bool), jnp.zeros((BATCH,), bool))
            else:
                res = steer_tm(x0, K0g, xrand, goal)
            u_last = jnp.take_along_axis(
                res.u_seq, jnp.broadcast_to(
                    jnp.maximum(res.length - 1, 0)[None, None, :],
                    (1,) + res.u_seq.shape[1:]), axis=0)[0].T
            S_new, K_new = lqr_b(res.xnew, u_last)
            xnew = jnp.where(wm, wrap_angle(res.xnew), res.xnew)
            x_seq = jnp.where(wm[None, :, None], wrap_angle(res.x_seq),
                              res.x_seq)
            e_goal = erf_goal(goal, xnew)
            gcost = jnp.einsum("bi,bij,bj->b", e_goal, S_new, e_goal)
            if drop == "commit":
                return tree._replace(
                    node_time=tree.node_time.at[0].add(
                        1e-12 * (jnp.sum(xnew) + jnp.sum(gcost)
                                 + jnp.sum(x_seq[0, 0])
                                 + jnp.sum(res.u_seq[0, 0])
                                 + jnp.sum(res.length.astype(jnp.float32))
                                 + jnp.sum(pids.astype(jnp.float32)))),
                    size=jnp.minimum(tree.size + BATCH,
                                     jnp.asarray(CAP, jnp.int32)))
            return commit_batch_dense_all(
                tree, spec.dt, spec.capacity, pids, res.length, x_seq,
                res.u_seq, xnew, S_new, K_new, res.in_goal, gcost)
        return round_fn

    def time_variant(drop):
        rf = make_variant(drop)

        def chunk(tree, base):
            def body(i, t):
                return rf(t, jax.random.fold_in(base, i))
            return jax.lax.fori_loop(0, RPC, body, tree)

        cf = jax.jit(chunk, donate_argnums=(0,))
        t = fresh_tree()
        for i in range(2):
            t = cf(t, jax.random.fold_in(key, i))
        _ = jax.device_get(t.size)
        t0 = time.perf_counter()
        for i in range(CHUNKS):
            t = cf(t, jax.random.fold_in(key, 100 + i))
        _ = jax.device_get(t.size)
        return (time.perf_counter() - t0) / (CHUNKS * RPC) * 1e3

    full = time_variant(None)
    ph["round_ms"] = full
    ph["round_expansions_per_s"] = BATCH / full * 1e3
    print(f"full grow round (at capacity): {full:7.3f} ms "
          f"({BATCH/full*1e3:,.0f} exp/s)", flush=True)
    for drop, label in (("commit", "commit"), ("steer", "steer"),
                        ("nn", "nearest")):
        dt_k = time_variant(drop)
        ph[f"{label}_composed_ms"] = max(full - dt_k, 0.0)
        print(f"  {label:8s} (knockout delta): "
              f"{ph[f'{label}_composed_ms']:6.3f} ms", flush=True)

    # --- NN kernel composed at several live sizes ---
    states = jax.random.normal(key, (CAP + BATCH, n)) * 10.0
    Sb = jnp.broadcast_to(S0, (CAP + BATCH, n, n))
    xrand = jax.random.normal(jax.random.fold_in(key, 1), (BATCH, n)) * 10.0
    REPS = 16

    def composed_nn(seed, size, xr):
        xr = xr + 1e-9 * seed.astype(jnp.float32)

        def body(i, xr):
            ids, cost = nn(states, Sb, size, xr)
            return xr + 1e-7 * cost[:, None]
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, xr))

    cj = jax.jit(composed_nn)
    for size in (8192, CAP // 2, CAP):
        sz = jnp.asarray(size, jnp.int32)
        out = cj(jnp.asarray(0, jnp.int32), sz, xrand)
        _ = jax.device_get(out)
        outer = 10
        t0 = time.perf_counter()
        for i in range(outer):
            out = cj(jnp.asarray(i + 1, jnp.int32), sz, xrand)
        _ = jax.device_get(out)
        ms = (time.perf_counter() - t0) / (outer * REPS) * 1e3
        ph[f"nn_kernel_ms_at_{size}"] = ms
        print(f"  NN kernel composed @ size={size}: {ms:6.3f} ms",
              flush=True)
    # achieved rates at full size: one K-stacked bf16 matmul + wrap/argmin
    t_nn = ph[f"nn_kernel_ms_at_{CAP}"] / 1e3
    F = 1 + n
    flops = 2 * BATCH * CAP * 6 * F          # stacked-K MXU flops
    ph["nn_kernel_mxu_gflops"] = flops / t_nn / 1e9
    ph["nn_kernel_frac_of_v5e_bf16_peak"] = flops / t_nn / V5E_PEAK_BF16

    # --- the PRODUCTION fused-restart chunk (donated carry chain) ---
    import lqrrt_tpu
    planner = lqrrt_tpu.Planner(
        prob["dynamics"], prob["lqr"], prob["constraints"],
        horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
        printing=False, batch_size=BATCH, capacity=CAP,
        wrap_dims=prob["wrap_dims"], saturate=prob["saturate"], seed=0)
    chunk = planner._get_restart_chunk(None, 0)
    n_cycles, Fc = planner._restart_chunk_shape
    seedf = planner._get_seed_tree()
    gbuf_p = planner.constraints.goal_buffer
    cur = seedf(jnp.asarray(prob["x0"]), planner.goal, gbuf_p)
    best = seedf(jnp.asarray(prob["x0"]), planner.goal, gbuf_p)
    pool = jnp.zeros((256, n))
    score = jnp.asarray(planner._RSCORE0, jnp.float32)
    out = chunk(cur, best, pool, score, key, 0, planner.goal, ss, gb,
                planner.goal)
    cur, best, pool, score, st_ = out
    _ = jax.device_get(st_)
    t0 = time.perf_counter()
    R = 14
    for i in range(R):
        cur, best, pool, score, st_ = chunk(
            cur, best, pool, score, key, i * n_cycles * Fc, planner.goal,
            ss, gb, planner.goal)
    _ = jax.device_get(st_)
    per_round = (time.perf_counter() - t0) / (R * n_cycles * Fc) * 1e3
    ph["restart_chunk_round_ms"] = per_round
    ph["restart_chunk_exp_per_s"] = BATCH / per_round * 1e3
    print(f"fused-restart chunk: {per_round:7.3f} ms/round "
          f"({BATCH/per_round*1e3:,.0f} exp/s incl stash+plant+reseed)",
          flush=True)

    dev = jax.devices()[0]
    ph["device"] = str(dev)
    ph["batch"] = BATCH
    ph["capacity"] = CAP
    ph["horizon_steps"] = H
    ph["harness"] = ("chained donated dispatches, device-fetch synced "
                     "(block_until_ready does not synchronize on this "
                     "backend)")
    if dev.platform == "tpu":
        out_p = os.environ.get("PROFILE_JSON", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PROFILE_r05.json"))
        with open(out_p, "w") as f:
            json.dump({k: (round(v, 4) if isinstance(v, float) else v)
                       for k, v in ph.items()}, f, indent=1)
        print(f"wrote {out_p}")


if __name__ == "__main__":
    main()
