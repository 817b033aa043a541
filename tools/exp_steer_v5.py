"""Round-5 steer-composition bisection with a VALID timing harness.

Round 4 established (with a partly async-polluted harness) that the fused
Pallas rollout kernel is fast standalone but ~300x-pessimized when composed
into the fused round.  This re-runs the key cells with chained, donated,
fetch-synced measurements, and adds the split-dispatch route: keep the kernel
a STANDALONE dispatch (its fast mode) and chain round phases as separate
async dispatches — the backend's deep dispatch queue hides per-dispatch
latency, so single-dispatch chunk fusion is not actually load-bearing.

Cells:
  scan_composed   : lax.scan steer inside an 8-iter fori_loop (baseline)
  k_param         : kernel, operands are jit entry params, chained dispatches
  k_small_carry   : kernel inside fori_loop, small carried operands only
  k_big_bystander : + a 150 MB carried buffer that does NOT feed the kernel
  k_gathered      : operands gathered from the big carried buffer (round
                    pattern; round-4 slow cell)
  k_split         : 3-dispatch round (prep -> kernel -> commit), donated
                    chain, sustained rate
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

from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from lqrrt_tpu.core.steer import make_steer
from lqrrt_tpu.models import boat
from steer_kernel_experimental import make_steer_pallas

B = 8192
N = 32768 + 8192
REPS = 8
results = {}


def main():
    prob = boat.default_problem()
    H = int(round(prob["horizon"] / prob["dt"]))
    n, m = 6, 3
    S0, K0 = prob["lqr"](None, None)
    key = jax.random.PRNGKey(0)
    interp = jax.devices()[0].platform != "tpu"

    steer_scan = make_steer(prob["dynamics"], prob["erf"],
                            prob["constraints"].is_feasible, H, prob["dt"],
                            0.05, saturate=prob["saturate"],
                            goal_buffer=prob["constraints"].goal_buffer,
                            layout="tm")
    steer_k = make_steer_pallas(prob["dynamics"], prob["erf"],
                                prob["constraints"].is_feasible, H,
                                prob["dt"], 0.05,
                                saturate=prob["saturate"],
                                goal_buffer=prob["constraints"].goal_buffer,
                                interpret=interp)

    goal = jnp.asarray(prob["goal"])
    x0 = jnp.tile(jnp.asarray(prob["x0"])[None], (B, 1))
    K = jnp.tile(K0[None], (B, 1, 1))
    tar = jax.random.normal(key, (B, n)) * 5.0
    big = jax.random.normal(jax.random.fold_in(key, 3), (H, n, N))  # ~98 MB

    def bench_loop(name, jfn, state, est_total_ms, inner=REPS):
        """state -> state chained donated dispatches; final fetch."""
        state = jax.tree.map(jnp.array, state)   # fresh buffers (donation)
        state = jfn(state)
        _ = jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
        outer = max(int(3000.0 / max(est_total_ms, 1.0)), 3)
        t0 = time.perf_counter()
        for _ in range(outer):
            state = jfn(state)
        _ = jax.device_get(jax.tree.leaves(state)[0].ravel()[0])
        ms = (time.perf_counter() - t0) / (outer * inner) * 1e3
        results[name] = round(ms, 4)
        print(f"{name:16s}: {ms:8.3f} ms/call  ({outer}x{inner})",
              flush=True)

    # --- scan composed (baseline) ---
    def scan_body(state):
        x0, K, tar = state

        def one(i, carry):
            x0, tr = carry
            res = steer_scan(x0, K, tr, goal)
            return res.xnew, tr + 1e-6
        x0n, tarn = jax.lax.fori_loop(0, REPS, one, (x0, tar))
        return x0n, K, tarn

    bench_loop("scan_composed", jax.jit(scan_body, donate_argnums=0),
               (x0, K, tar), est_total_ms=REPS * 1.6)

    # --- kernel, entry-param operands, chained dispatches ---
    def kp(state):
        x0, K, tar = state
        res = steer_k(x0, K, tar, goal)
        return res.xnew, K, tar + 1e-6

    bench_loop("k_param", jax.jit(kp, donate_argnums=0), (x0, K, tar),
               est_total_ms=1.0, inner=1)

    # --- kernel in fori_loop, small carry ---
    def ksc(state):
        x0, K, tar = state

        def one(i, carry):
            x0, tr = carry
            res = steer_k(x0, K, tr, goal)
            return res.xnew, tr + 1e-6
        x0n, tarn = jax.lax.fori_loop(0, REPS, one, (x0, tar))
        return x0n, K, tarn

    bench_loop("k_small_carry", jax.jit(ksc, donate_argnums=0),
               (x0, K, tar), est_total_ms=REPS * 1.0)

    # --- + big carried bystander ---
    def kbb(state):
        x0, K, tar, big = state

        def one(i, carry):
            x0, tr, bg = carry
            res = steer_k(x0, K, tr, goal)
            bg = bg.at[0, 0, 0].add(1e-9 * jnp.sum(res.length
                                                   .astype(jnp.float32)))
            return res.xnew, tr + 1e-6, bg
        x0n, tarn, bign = jax.lax.fori_loop(0, REPS, one, (x0, tar, big))
        return x0n, K, tarn, bign

    bench_loop("k_big_bystander", jax.jit(kbb, donate_argnums=0),
               (x0, K, tar, big), est_total_ms=REPS * 1.0)

    # --- operands gathered from big carried buffer (round pattern) ---
    pids0 = jax.random.randint(jax.random.fold_in(key, 4), (B,), 0, N)

    def kg(state):
        states_buf, K, tar = state

        def one(i, carry):
            sb, tr, p = carry
            x0g = sb[0, :, :].T[p]                      # (B, n) gather
            res = steer_k(x0g, K, tr, goal)
            sb = jax.lax.dynamic_update_slice(
                sb, res.x_seq[:, :, :1] * 1e-9, (0, 0, 0))
            return sb, tr + 1e-6, (p + 1) % N
        sb, tarn, _ = jax.lax.fori_loop(0, REPS, one,
                                        (states_buf, tar, pids0))
        return sb, K, tarn

    bench_loop("k_gathered", jax.jit(kg, donate_argnums=0),
               (big, K, tar), est_total_ms=REPS * 3.0)

    # --- split-dispatch: prep | kernel | commit as 3 chained dispatches ---
    def prep(state):
        bg, K, tar, p = state
        x0g = bg[0, :, :].T[p]
        return x0g, K, tar

    def commit(bg, res_xseq, res_len, tar, p):
        bg = jax.lax.dynamic_update_slice(bg, res_xseq * 1e-9, (0, 0, 0))
        return bg, tar + 1e-6, (p + 1) % N

    prep_j = jax.jit(prep)
    steer_j = jax.jit(lambda x0, K, tar: steer_k(x0, K, tar, goal),
                      donate_argnums=(0,))
    commit_j = jax.jit(commit, donate_argnums=(0,))

    bg, tr, p = big, tar, pids0
    # warm
    x0g, _, _ = prep_j((bg, K, tr, p))
    res = steer_j(x0g, K, tr)
    bg, tr, p = commit_j(bg, res.x_seq, res.length, tr, p)
    _ = jax.device_get(tr.ravel()[0])
    outer = 300
    t0 = time.perf_counter()
    for _ in range(outer):
        x0g, _, _ = prep_j((bg, K, tr, p))
        res = steer_j(x0g, K, tr)
        bg, tr, p = commit_j(bg, res.x_seq, res.length, tr, p)
    _ = jax.device_get(tr.ravel()[0])
    ms = (time.perf_counter() - t0) / outer * 1e3
    results["k_split"] = round(ms, 4)
    print(f"{'k_split':16s}: {ms:8.3f} ms/round (3 dispatches incl prep+commit)",
          flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_steer_v5.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
