"""Phase-level timing of one expansion round at the bench operating point.

Times (jitted separately, fenced): sample, nearest (pallas + jnp), steer,
endpoint LQR, goal test, commit, and the full fused round.  Diagnostics only;
not part of the package.
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
    rf_nodon = jax.jit(make_round(spec, prob["dynamics"], prob["lqr"],
                                  prob["erf"], prob["constraints"].is_feasible,
                                  0.05, prob["constraints"].goal_buffer,
                                  wrap_mask=wrap_mask,
                                  saturate=prob["saturate"]))
    t_round = timeit(rf_nodon, t, key, goal, ss, gb, goal)
    print(f"full round:      {t_round*1e3:8.3f} ms  "
          f"({BATCH/t_round:,.0f} exp/s)")

    # --- phases ---
    samp = jax.jit(lambda k: sample_batch(k, spec.batch, ss, gb, goal))
    print(f"  sample:        {timeit(samp, key)*1e3:8.3f} ms")

    from lqrrt_tpu.core.nearest import make_nearest
    xrand = samp(key)
    nn_jnp = jax.jit(lambda st, S, sz, xr: make_nearest(
        prob["erf"], block=spec.nn_block)(st, S, sz, xr))
    print(f"  nearest (jnp): {timeit(nn_jnp, t.state, t.S, t.size, xrand)*1e3:8.3f} ms")
    try:
        from lqrrt_tpu.ops.pallas.nn_kernel import make_nearest_pallas
        nn_pl = jax.jit(lambda st, S, sz, xr: make_nearest_pallas(
            block=spec.nn_block, wrap_dim=2)(st, S, sz, xr))
        print(f"  nearest (pal): {timeit(nn_pl, t.state, t.S, t.size, xrand)*1e3:8.3f} ms")
    except Exception as e:
        print("  nearest (pal): FAILED", e)

    steer = make_steer(prob["dynamics"], prob["erf"],
                       prob["constraints"].is_feasible, H, prob["dt"], 0.05,
                       saturate=prob["saturate"])
    pids, _ = nn_jnp(t.state, t.S, t.size, xrand)
    x0 = t.state[pids]; Kp = t.K[pids]
    steer_j = jax.jit(steer)
    print(f"  steer (H={H}): {timeit(steer_j, x0, Kp, xrand)*1e3:8.3f} ms")

    res = steer_j(x0, Kp, xrand)
    lqr_b = jax.jit(jax.vmap(prob["lqr"]))
    u_last = res.u_seq[:, -1, :]
    print(f"  endpoint lqr:  {timeit(lqr_b, res.xnew, u_last)*1e3:8.3f} ms")

    from lqrrt_tpu.core.commit import commit_batch_dense
    S_new, K_new = lqr_b(res.xnew, u_last)
    ing = jnp.zeros((BATCH,), bool)
    gc = jnp.zeros((BATCH,), jnp.float32)
    com = jax.jit(lambda tr: commit_batch_dense(
        jax.tree.map(jnp.array, tr), spec.dt, spec.capacity, pids, res.length,
        res.x_seq, res.u_seq, res.xnew, S_new, K_new, ing, gc))
    print(f"  commit(dense): {timeit(com, t)*1e3:8.3f} ms   (incl tree copy)")


if __name__ == "__main__":
    main()
