"""Ablation timing of the expansion round's phases INSIDE one jitted program.

Times full-round variants with pieces knocked out (results kept live through
a scalar sum so XLA cannot DCE them).  Isolates what actually dominates the
fused round, which per-phase standalone timings hide behind dispatch overhead.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from lqrrt_tpu.core.commit import commit_batch_dense
from lqrrt_tpu.core.rounds import RoundSpec
from lqrrt_tpu.core.sampling import sample_batch
from lqrrt_tpu.core.steer import make_steer
from lqrrt_tpu.core.tree import init_tree
from lqrrt_tpu.models import boat
from lqrrt_tpu.ops.pallas.nn_kernel import make_nearest_const_pallas

BATCH, CAP, H = 8192, 32768, 100


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
    spec = RoundSpec(6, 3, BATCH, H, CAP, prob["dt"], nn_block=1024,
                     slack=BATCH)
    S0, K0 = prob["lqr"](None, None)
    tree = init_tree(CAP, H, 6, 3, jnp.asarray(prob["x0"]), S0, K0, 1e9,
                     False, slack=BATCH)
    # pretend the tree is half full so NN scans a realistic live region
    tree = tree._replace(size=jnp.asarray(16384, jnp.int32))
    goal = jnp.asarray(prob["goal"])
    ss = jnp.asarray(prob["sample_space"])
    gb = jnp.zeros(6)
    key = jax.random.PRNGKey(0)
    nearest = make_nearest_const_pallas(block=1024, wrap_dim=2)
    steer = make_steer(prob["dynamics"], prob["erf"],
                       prob["constraints"].is_feasible, H, prob["dt"], 0.05,
                       saturate=prob["saturate"])
    lqr_b = jax.vmap(prob["lqr"])
    erf_goal = jax.vmap(prob["erf"], in_axes=(None, 0))
    gbuf = jnp.asarray(prob["constraints"].goal_buffer, jnp.float32)

    def variant(use_nn, do_steer, do_lqr, do_commit):
        def fn(tree, key):
            xrand = sample_batch(key, BATCH, ss, gb, goal)
            if use_nn:
                pids, _ = nearest(tree.state, tree.S, tree.size, xrand)
            else:
                pids = (jnp.arange(BATCH, dtype=jnp.int32)
                        % jnp.maximum(tree.size, 1))
            sink = jnp.sum(pids.astype(jnp.float32)) + jnp.sum(xrand)
            if do_steer:
                res = steer(tree.state[pids], tree.K[pids], xrand)
                sink = sink + jnp.sum(res.xnew) + jnp.sum(
                    res.length.astype(jnp.float32))
                if do_lqr:
                    u_last = jnp.take_along_axis(
                        res.u_seq,
                        jnp.maximum(res.length - 1, 0)[:, None, None],
                        axis=1)[:, 0, :]
                    S_new, K_new = lqr_b(res.xnew, u_last)
                    e_goal = erf_goal(goal, res.xnew)
                    in_goal = jnp.all(jnp.abs(e_goal) <= gbuf, axis=-1)
                    gcost = jnp.einsum("bi,bij,bj->b", e_goal, S_new, e_goal)
                    sink = sink + jnp.sum(gcost)
                    if do_commit:
                        out = commit_batch_dense(
                            tree, spec.dt, CAP, pids, res.length, res.x_seq,
                            res.u_seq, res.xnew, S_new, K_new, in_goal, gcost)
                        # keep size fixed so reps are comparable
                        return out._replace(size=tree.size), sink
            return tree, sink
        return jax.jit(fn)

    # goal-entry truncation ablation (VERDICT round 2 item 3): the fused
    # in-scan goal stop (core/steer.py goal_buffer=) vs the round-2 two-pass
    # form (plain steer + a second (B, H, n) erf sweep over the rollout)
    steer_fused = make_steer(prob["dynamics"], prob["erf"],
                             prob["constraints"].is_feasible, H, prob["dt"],
                             0.05, saturate=prob["saturate"],
                             goal_buffer=prob["constraints"].goal_buffer)
    erf_steps = jax.vmap(erf_goal, in_axes=(None, 0))

    def goal_variant(mode):
        def fn(tree, key):
            xrand = sample_batch(key, BATCH, ss, gb, goal)
            pids, _ = nearest(tree.state, tree.S, tree.size, xrand)
            if mode == "fused":
                res = steer_fused(tree.state[pids], tree.K[pids], xrand,
                                  goal)
                length, in_goal = res.length, res.in_goal
            else:
                res = steer(tree.state[pids], tree.K[pids], xrand)
                length, in_goal = res.length, None
                if mode == "sweep":
                    steps = jnp.arange(H)[None, :]
                    hit = jnp.all(jnp.abs(erf_steps(goal, res.x_seq))
                                  <= gbuf, axis=-1) & (steps
                                                       < length[:, None])
                    any_hit = jnp.any(hit, axis=-1)
                    first = jnp.argmax(hit, axis=-1).astype(length.dtype)
                    length = jnp.where(any_hit, first + 1, length)
                    in_goal = any_hit
            sink = jnp.sum(res.xnew) + jnp.sum(length.astype(jnp.float32))
            if in_goal is not None:
                sink = sink + jnp.sum(in_goal)
            return sink
        return jax.jit(fn)

    cases = [
        ("sample only           ", variant(False, False, False, False)),
        ("+ NN                  ", variant(True, False, False, False)),
        ("+ steer (no NN)       ", variant(False, True, False, False)),
        ("+ steer + lqr (no NN) ", variant(False, True, True, False)),
        ("full minus commit     ", variant(True, True, True, False)),
        ("FULL                  ", variant(True, True, True, True)),
        ("NN+steer no goal test ", goal_variant("none")),
        ("NN+steer 2-pass sweep ", goal_variant("sweep")),
        ("NN+steer fused gstop  ", goal_variant("fused")),
    ]
    for name, fn in cases:
        print(f"{name}: {timeit(fn, tree, key)*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
