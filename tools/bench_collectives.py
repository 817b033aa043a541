"""P2 best-edge collective comparison: "gather" vs "topk" (SURVEY.md 2.4 P2,
round-1 review item 5 — "measure both ... and record the comm-volume math").

Comm volume per round per device, B = global batch, H = horizon steps,
n/m = state/control dims, k = topk, float32:

  gather: the full candidate pytree is all-gathered.  Dominant terms are the
          rollout buffers:  B*H*(n+m)*4  bytes  (+ B*(n + n^2 + m*n + 4)*4
          for endpoints/metrics — small next to the H factor).
  topk:   one (B,) float score all-gather (B*4 bytes) + a psum of k
          zero-masked winner rows: k*H*(n+m)*4 dominant.  Ratio of dominant
          terms = B / (2k)  (the psum moves each row ~twice in a reduction).

At the bench shape (B = 8192, H = 100, n = 6, m = 3, k = 1024):
  gather ~ 29.5 MB/round/device; topk ~ 7.4 MB -> 4x less traffic, and the
  reduction shrinks linearly with k (k = 256 -> 16x).

Timings below run on whatever devices exist.  On the 8-device VIRTUAL CPU
mesh (one socket) they are smoke checks of the mechanism, not hardware
numbers — the tool exists so a real multi-chip run can produce them with no
new code:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           JAX_PLATFORMS=cpu python tools/bench_collectives.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# site config pins jax_platforms; the env var alone is not honored (see
# tests/conftest.py) — re-assert it so the virtual-CPU invocation works
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax
    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def comm_bytes(B, H, n, m, k=None):
    per_cand = (H * (n + m) + n + n * n + m * n + 4) * 4
    if k is None:
        return B * per_cand
    return B * 4 + 2 * k * per_cand


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--horizon-steps", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lqrrt_tpu.core.rounds import RoundSpec
    from lqrrt_tpu.core.tree import init_tree
    from lqrrt_tpu.models import boat
    from lqrrt_tpu.parallel import mesh as meshlib
    from lqrrt_tpu.parallel.sharded import make_sharded_round, replicate_tree

    n_dev = jax.device_count()
    mesh = meshlib.make_mesh(n_dev)
    prob = boat.default_problem()
    B = args.batch_per_device * n_dev
    H = args.horizon_steps
    spec = RoundSpec(6, 3, B, H, args.capacity, prob["dt"],
                     nn_block=min(1024, args.capacity))
    S0, K0 = prob["lqr"](None, None)
    wrap_mask = np.zeros(6, bool)
    wrap_mask[2] = True

    goal = jnp.asarray(prob["goal"])
    ss = jnp.asarray(prob["sample_space"])
    gb = jnp.full((6,), 0.2)

    for collective, k in (("gather", None), ("topk", B // 8),
                          ("topk", B // 32)):
        rf = jax.jit(make_sharded_round(
            spec, mesh, prob["dynamics"], prob["lqr"], prob["erf"],
            prob["constraints"].is_feasible, 0.05,
            prob["constraints"].goal_buffer, wrap_mask=wrap_mask,
            saturate=prob["saturate"], collective=collective, topk=k),
            donate_argnums=(0,))

        def run(reps):
            tree = replicate_tree(
                init_tree(args.capacity, H, 6, 3, jnp.asarray(prob["x0"]),
                          S0, K0, 1e9, False), mesh)
            t0 = time.perf_counter()
            for r in range(reps):
                tree = rf(tree, jax.random.fold_in(jax.random.PRNGKey(0), r),
                          goal, ss, gb, goal)
            jax.block_until_ready(tree.size)
            return time.perf_counter() - t0, int(tree.size)

        run(2)  # compile + warm
        elapsed, size = min(run(args.rounds) for _ in range(2))
        print(json.dumps({
            "collective": collective, "topk": k, "devices": n_dev,
            "global_batch": B,
            "round_ms": round(1e3 * elapsed / args.rounds, 2),
            "expansions_per_s": round(B * args.rounds / elapsed),
            "tree_size_after": size,
            "comm_bytes_per_round_per_device": comm_bytes(B, H, 6, 3, k),
            "platform": jax.devices()[0].platform,
        }), flush=True)


if __name__ == "__main__":
    main()
