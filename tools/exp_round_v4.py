"""Round-4 roofline experiment: steer carry layout x commit strategy.

Measures the PRODUCTION fused chunk (8 rounds per dispatch, donated tree,
const-metric Pallas NN — exactly the headline configuration) under four
variants:

    base      : steer layout "b"  + sorted dense commit   (round-3 shipping)
    bt        : steer layout "bt" + sorted dense commit
    all       : steer layout "b"  + sort/gather-free commit_all
    bt+all    : steer layout "bt" + commit_all

plus isolated steer timings (both layouts, unroll sweep) to attribute the
delta.  Rationale: the (B, n~6) scan carry pads lanes 6 -> 128 on TPU, so
every per-step elementwise op is ~16x padding; commit's argsort + reorder
gathers move ~30 MB/round (VERDICT r3 item 1, PROFILE_r03).

Run on the real TPU:  python tools/exp_round_v4.py
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

from lqrrt_tpu.core.rounds import RoundSpec, make_round
from lqrrt_tpu.core.steer import make_steer
from lqrrt_tpu.core.tree import init_tree
from lqrrt_tpu.models import boat
from lqrrt_tpu.ops.pallas.nn_kernel import make_nearest_const_pallas

BATCH = int(os.environ.get("BATCH", 8192))
CAP = int(os.environ.get("CAP", 32768))
RPC = 8
CHUNKS = int(os.environ.get("CHUNKS", 6))


def main():
    prob = boat.default_problem()
    H = int(round(prob["horizon"] / prob["dt"]))
    wrap_mask = np.zeros(6, bool); wrap_mask[2] = True
    goal = jnp.asarray(prob["goal"])
    ss = jnp.asarray(prob["sample_space"])
    gb = jnp.full((6,), 0.0)
    S0, K0 = prob["lqr"](None, None)
    interp = jax.devices()[0].platform != "tpu"
    nn = make_nearest_const_pallas(block=2048, wrap_dim=2, interpret=interp)
    results = {}

    def fresh_tree():
        return init_tree(CAP, H, 6, 3, jnp.asarray(prob["x0"]), S0, K0,
                         1e9, False, slack=BATCH)

    def time_chunk(name, spec):
        rf = make_round(spec, prob["dynamics"], prob["lqr"], prob["erf"],
                        prob["constraints"].is_feasible, 0.05,
                        prob["constraints"].goal_buffer, wrap_mask=wrap_mask,
                        saturate=prob["saturate"], nearest_fn=nn)

        def chunk(tree, base):
            def body(i, t):
                return rf(t, jax.random.fold_in(base, i), goal, ss, gb, goal)
            return jax.lax.fori_loop(0, RPC, body, tree)

        cf = jax.jit(chunk, donate_argnums=(0,))
        t = fresh_tree()
        key = jax.random.PRNGKey(0)
        # compile + saturate the tree (steady state: NN at full capacity)
        for i in range(2):
            t = cf(t, jax.random.fold_in(key, i))
        t.size.block_until_ready()
        t0 = time.perf_counter()
        for i in range(CHUNKS):
            t = cf(t, jax.random.fold_in(key, 100 + i))
        t.size.block_until_ready()
        dt_round = (time.perf_counter() - t0) / (CHUNKS * RPC)
        results[name] = dict(round_ms=dt_round * 1e3,
                             exp_per_s=BATCH / dt_round)
        print(f"{name:8s}: {dt_round*1e3:7.3f} ms/round  "
              f"({BATCH/dt_round:,.0f} exp/s)  size={int(t.size)}")

    # NOTE (post-experiment): the round-3 variants measured here drove the
    # layout decision; since then make_expand always uses the "tm"
    # time-major steer + time-major edge storage (core/tree.py), so "base"
    # now IS the tm round.  commit_all remains a real knob.
    base = RoundSpec(6, 3, BATCH, H, CAP, prob["dt"], nn_block=2048,
                     slack=BATCH)
    time_chunk("base", base)
    time_chunk("all", base._replace(commit_all=True))

    # + the fused Pallas rollout kernel (ops/pallas/steer_kernel.py)
    from steer_kernel_experimental import make_steer_pallas
    ksteer = make_steer_pallas(
        prob["dynamics"], prob["erf"], prob["constraints"].is_feasible,
        H, prob["dt"], 0.05, saturate=prob["saturate"],
        goal_buffer=prob["constraints"].goal_buffer, interpret=interp)

    def time_chunk_k(name, spec):
        rf = make_round(spec, prob["dynamics"], prob["lqr"], prob["erf"],
                        prob["constraints"].is_feasible, 0.05,
                        prob["constraints"].goal_buffer, wrap_mask=wrap_mask,
                        saturate=prob["saturate"], nearest_fn=nn,
                        steer_fn=ksteer)

        def chunk(tree, base_k):
            def body(i, t):
                return rf(t, jax.random.fold_in(base_k, i), goal, ss, gb,
                          goal)
            return jax.lax.fori_loop(0, RPC, body, tree)

        cf = jax.jit(chunk, donate_argnums=(0,))
        t = fresh_tree()
        key = jax.random.PRNGKey(0)
        for i in range(2):
            t = cf(t, jax.random.fold_in(key, i))
        t.size.block_until_ready()
        t0 = time.perf_counter()
        for i in range(CHUNKS):
            t = cf(t, jax.random.fold_in(key, 100 + i))
        t.size.block_until_ready()
        dt_round = (time.perf_counter() - t0) / (CHUNKS * RPC)
        results[name] = dict(round_ms=dt_round * 1e3,
                             exp_per_s=BATCH / dt_round)
        print(f"{name:12s}: {dt_round*1e3:7.3f} ms/round  "
              f"({BATCH/dt_round:,.0f} exp/s)  size={int(t.size)}")

    time_chunk_k("all+ksteer", base._replace(commit_all=True))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_round_v4.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print("wrote", out)


if __name__ == "__main__":
    main()
