"""Micro-evidence for the (..., n=6) minor-dim padding hypothesis.

XLA:TPU tiles the two minor dims of every array to (8 sublanes, 128 lanes);
an array whose MINOR dim is n=6 is physically padded 6 -> 128 (~21x bytes),
so every elementwise touch / copy / dynamic_update_slice of (B, H, 6) edge
data moves ~21x the logical bytes.  (H, n, B) puts the batch in lanes and
pads only n: 6 -> 8 sublanes (1.33x).

Measures, on the real chip:
 1. elementwise op bandwidth on (B, H, 6) vs (H, 6, B)     [padding factor]
 2. dynamic_update_slice commit write: (B,H,n)->(N,H,n) vs (H,n,B)->(H,n,N)
    at lane-aligned and misaligned starts
 3. steer scan: with vs without the final transpose back to (B, H, n),
    and H scaling (50 vs 100) to see per-step overhead vs bandwidth
"""
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

from lqrrt_tpu.core.steer import make_steer, _make_steer_bt
from lqrrt_tpu.models import boat

B, H, n, N = 8192, 100, 6, 40960


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.PRNGKey(0)
    logical_mb = B * H * n * 4 / 2**20

    # 1. elementwise bandwidth by layout
    for shape, name in (((B, H, n), "BHn (n minor)"),
                        ((H, n, B), "HnB (B minor)"),
                        ((B, H, 128), "BH128 (dense lanes)")):
        x = jax.random.normal(key, shape)
        f = jax.jit(lambda a: a * 1.000001 + 0.5)
        ms = timeit(f, x)
        mb = np.prod(shape) * 4 / 2**20
        print(f"elementwise {name:18s}: {ms:7.3f} ms  "
              f"({2*mb/1024/(ms/1e3):6.1f} GB/s logical, {mb:.0f} MB)")

    # 2. commit-write dus by layout
    blk_bhn = jax.random.normal(key, (B, H, n))
    dst_bhn = jnp.zeros((N, H, n))
    blk_hnb = jax.random.normal(key, (H, n, B))
    dst_hnb = jnp.zeros((H, n, N))

    def dus_bhn(dst, blk, s):
        return jax.lax.dynamic_update_slice(dst, blk, (s, 0, 0))

    def dus_hnb(dst, blk, s):
        return jax.lax.dynamic_update_slice(dst, blk, (0, 0, s))

    for name, f, dst, blk, s in (
            ("dus (B,H,n)->row", dus_bhn, dst_bhn, blk_bhn, 8192),
            ("dus (B,H,n)->row+1", dus_bhn, dst_bhn, blk_bhn, 8193),
            ("dus (H,n,B)->lane aligned", dus_hnb, dst_hnb, blk_hnb, 8192),
            ("dus (H,n,B)->lane misalig", dus_hnb, dst_hnb, blk_hnb, 8193)):
        jf = jax.jit(f, donate_argnums=(0,))
        # donate dst so the write is in-place like the production commit
        d = jnp.array(dst)
        d = jf(d, blk, jnp.asarray(s, jnp.int32))
        jax.block_until_ready(d)
        t0 = time.perf_counter()
        for _ in range(20):
            d = jf(d, blk, jnp.asarray(s, jnp.int32))
        jax.block_until_ready(d)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{name:28s}: {ms:7.3f} ms  "
              f"({logical_mb/1024/(ms/1e3):6.1f} GB/s logical write)")

    # 3. steer with/without exit transpose, H scaling
    prob = boat.default_problem()
    tol = jnp.asarray(0.05, jnp.float32)
    gbuf = jnp.asarray(prob["constraints"].goal_buffer, jnp.float32)
    S0, K0 = prob["lqr"](None, None)
    x0 = jnp.tile(jnp.asarray(prob["x0"])[None], (B, 1))
    Kb = jnp.tile(K0[None], (B, 1, 1))
    ss = jnp.asarray(prob["sample_space"])
    xtar = jax.random.uniform(key, (B, n), minval=ss[:, 0], maxval=ss[:, 1])
    goal = jnp.asarray(prob["goal"])

    for Hs in (50, 100):
        st = jax.jit(make_steer(prob["dynamics"], prob["erf"],
                                prob["constraints"].is_feasible, Hs, 0.05,
                                0.05, saturate=prob["saturate"],
                                goal_buffer=gbuf, layout="bt"))
        ms = timeit(st, x0, Kb, xtar, goal)
        print(f"steer bt H={Hs:3d} (with transpose): {ms:7.3f} ms")

    # raw bt steer without the exit transpose: outputs stay (H, n, B)
    raw = _make_steer_bt(prob["dynamics"], prob["erf"],
                         prob["constraints"].is_feasible, H, 0.05, tol,
                         False, prob["saturate"], 4, gbuf)

    def steer_raw(x0_, K_, xtar_, goal_):
        # replicate _make_steer_bt's body minus the transposes by calling
        # it and re-transposing is self-defeating; instead time the scan
        # via a jitted closure that returns the UNtransposed sums
        r = raw(x0_, K_, xtar_, goal_)
        return r.length, r.xnew       # forces the scan, skips using x_seq

    # NOTE: XLA dead-code-eliminates the ys stacking if x_seq is unused, so
    # this bound is "scan compute only, no output materialization"
    ms = timeit(jax.jit(steer_raw), x0, Kb, xtar, goal)
    print(f"steer bt H=100 scan-only (x_seq DCE'd): {ms:7.3f} ms")

    # and materializing but NOT transposing: reduce over (H, n, B) output
    from lqrrt_tpu.core.steer import SteerResult  # noqa: F401

    def steer_mat(x0_, K_, xtar_, goal_):
        r = raw(x0_, K_, xtar_, goal_)
        return r.x_seq, r.u_seq, r.length

    ms = timeit(jax.jit(steer_mat), x0, Kb, xtar, goal)
    print(f"steer bt H=100 materialize+transpose: {ms:7.3f} ms")

    # isolated transpose cost (H, n, B) -> (B, H, n) and the reverse
    xs = jax.random.normal(key, (H, n, B))
    ms = timeit(jax.jit(lambda a: jnp.transpose(a, (2, 0, 1))), xs)
    print(f"transpose (H,n,B)->(B,H,n): {ms:7.3f} ms")
    xb = jax.random.normal(key, (B, H, n))
    ms = timeit(jax.jit(lambda a: jnp.transpose(a, (1, 2, 0))), xb)
    print(f"transpose (B,H,n)->(H,n,B): {ms:7.3f} ms")


if __name__ == "__main__":
    main()
