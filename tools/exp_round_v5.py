"""Round-5 roofline attribution: what does each phase cost INSIDE the
production composed chunk, and is the commit's dynamic_update_slice paying an
unaligned-lane penalty?

Part 1 — phase knockouts: the production round (const-metric Pallas NN,
layout="tm" steer, commit_all) compiled as an 8-round fused chunk with one
phase at a time replaced by a cheap stand-in (results kept live via sinks so
XLA cannot DCE upstream work).  Standalone phase timings hide dispatch
overhead (~0.3 ms per dispatch on the tunnel) and cross-phase fusion; the
knockout delta is the honest composed cost.

Part 2 — commit alignment: commit_all lands each round's (H, ., B) block at
minor-dim offset ``size``; with a root at row 0 every start is ?1 (mod B) —
lane-UNALIGNED.  Times the identical compiled commit at start 1 vs 0 vs 8192
(same executable, different size operand) to expose the relayout penalty.

Run on the real TPU:  python tools/exp_round_v5.py
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
from lqrrt_tpu.core.rounds import RoundSpec, make_expand
from lqrrt_tpu.core.sampling import sample_batch
from lqrrt_tpu.core.steer import SteerResult
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
    n, m = 6, 3
    wrap_mask = np.zeros(n, bool); wrap_mask[2] = True
    goal = jnp.asarray(prob["goal"])
    ss = jnp.asarray(prob["sample_space"])
    gb = jnp.full((n,), 0.0)
    S0, K0 = prob["lqr"](None, None)
    interp = jax.devices()[0].platform != "tpu"
    nn = make_nearest_const_pallas(block=2048, wrap_dim=2, interpret=interp)
    spec = RoundSpec(n, m, BATCH, H, CAP, prob["dt"], nn_block=2048,
                     slack=BATCH, commit_all=True)
    results = {}

    def fresh_tree():
        return init_tree(CAP, H, n, m, jnp.asarray(prob["x0"]), S0, K0,
                         1e9, False, slack=BATCH)

    lqr_b = jax.vmap(prob["lqr"])
    erf_goal = jax.vmap(prob["erf"], in_axes=(None, 0))
    gbuf = jnp.asarray(prob["constraints"].goal_buffer, jnp.float32)

    from lqrrt_tpu.core.steer import make_steer
    from lqrrt_tpu.ops.angles import wrap_angle
    steer_tm = make_steer(prob["dynamics"], prob["erf"],
                          prob["constraints"].is_feasible, H, prob["dt"],
                          0.05, saturate=prob["saturate"],
                          goal_buffer=prob["constraints"].goal_buffer,
                          layout="tm")
    wm = jnp.asarray(wrap_mask)

    def make_variant(drop):
        """One production round, phases explicit, ``drop`` knocked out."""
        def round_fn(tree, key):
            if drop == "sample":
                xrand = jnp.broadcast_to(goal, (BATCH, n)) + 0.001
            else:
                xrand = sample_batch(key, BATCH, ss, gb, goal)
            if drop == "nn":
                pids = (jnp.arange(BATCH, dtype=jnp.int32)
                        % jnp.maximum(tree.size, 1))
            else:
                pids, _ = nn(tree.state, tree.S, tree.size, xrand)
            x0 = tree.state[pids]
            K0 = tree.K[pids]
            if drop == "steer":
                res = SteerResult(
                    jnp.broadcast_to(x0.T[None], (H, n, BATCH)) * 1.0001,
                    jnp.zeros((H, m, BATCH)),
                    jnp.zeros((H, BATCH), bool),
                    jnp.ones((BATCH,), jnp.int32),
                    x0 + 0.01 * xrand, jnp.zeros((BATCH,), bool),
                    jnp.zeros((BATCH,), bool))
            else:
                res = steer_tm(x0, K0, xrand, goal)
            if drop == "lqr":
                S_new, K_new = tree.S[pids], tree.K[pids]
            else:
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

    def time_variant(name, drop):
        rf = make_variant(drop)

        def chunk(tree, base):
            def body(i, t):
                return rf(t, jax.random.fold_in(base, i))
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
        results[name] = round(dt_round * 1e3, 4)
        print(f"{name:12s}: {dt_round*1e3:7.3f} ms/round  "
              f"({BATCH/dt_round:,.0f} exp/s)", flush=True)

    time_variant("full", None)
    time_variant("no_commit", "commit")
    time_variant("no_steer", "steer")
    time_variant("no_nn", "nn")
    time_variant("no_lqr", "lqr")
    time_variant("no_sample", "sample")

    # ---- Part 2: dus alignment ----
    t = fresh_tree()
    x_seq = jnp.zeros((H, n, BATCH))
    u_seq = jnp.zeros((H, m, BATCH))
    pids = jnp.zeros((BATCH,), jnp.int32)
    length = jnp.ones((BATCH,), jnp.int32)
    xnew = jnp.zeros((BATCH, n))
    S_new = jnp.zeros((BATCH, n, n))
    K_new = jnp.zeros((BATCH, m, n))
    ing = jnp.zeros((BATCH,), bool)
    gc = jnp.zeros((BATCH,), jnp.float32)

    com = jax.jit(
        lambda tr, sz: commit_batch_dense_all(
            tr._replace(size=sz), spec.dt, spec.capacity, pids, length,
            x_seq, u_seq, xnew, S_new, K_new, ing, gc),
        donate_argnums=(0,))

    for start in (1, 0, 128, 8192, 8193):
        sz = jnp.asarray(start, jnp.int32)
        tt = jax.tree.map(jnp.array, t)
        out = com(tt, sz)
        jax.block_until_ready(out.size)
        reps = 10
        ts = time.perf_counter()
        for _ in range(reps):
            out = com(out._replace(size=sz), sz)
        jax.block_until_ready(out.size)
        ms = (time.perf_counter() - ts) / reps * 1e3
        results[f"commit_start_{start}"] = round(ms, 4)
        print(f"commit @ start={start:5d}: {ms:7.3f} ms", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "exp_round_v5.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
