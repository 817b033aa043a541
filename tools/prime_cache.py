"""Prime the persistent compile cache with every hot program and self-check
for pessimized compiler draws.

The axon backend occasionally compiles an HLO into a ~100x-slower executable
(observed on the vmapped batched CARE: ~400 ms vs ~0.05 ms for the same
program; root cause unresolved), and the persistent cache then freezes the
bad draw.  This tool compiles the bench-critical programs one model at a
time, measures a short replan, and WARNS when a model's round throughput is
far below its known-good envelope — the cue to `rm -rf .jax_cache` and
re-prime.

  python tools/prime_cache.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import lqrrt_tpu
from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache"))

# (model module name, per-dim goal bias, bench shapes, known-good floor
# for expansions/s on a TPU v5e — half an order of magnitude of slack)
_CASES = [
    ("boat", [0.3, 0.3, 0, 0, 0, 0], dict(batch_size=8192, capacity=32768),
     200_000),
    ("boat", [0.3, 0.3, 0, 0, 0, 0], dict(batch_size=1024, capacity=4096),
     100_000),
    # car/quadrotor floors assume the LU-free Gauss-Jordan Riccati
    # (ops/riccati.py inv_logdet_gj): the LU path used to draw ~15x slower
    ("car", [0.3, 0.3, 0, 0], dict(batch_size=1024, capacity=4096), 30_000),
    ("quadrotor", [0.3, 0.3, 0.3] + [0.0] * 9,
     dict(batch_size=1024, capacity=4096), 15_000),
]


def main():
    import importlib
    ok = True
    for name, bias, shapes, floor in _CASES:
        model = importlib.import_module(f"lqrrt_tpu.models.{name}")
        prob = model.default_problem()
        t0 = time.time()
        p = lqrrt_tpu.Planner(
            prob["dynamics"], prob["lqr"], prob["constraints"],
            horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
            printing=False, wrap_dims=prob["wrap_dims"],
            saturate=prob["saturate"], seed=0, **shapes)
        p.warmup(prob["x0"], prob["sample_space"], goal_bias=bias,
                 pruning=True)
        compile_s = time.time() - t0
        p.update_plan(prob["x0"], prob["sample_space"], goal_bias=bias,
                      specific_time=0.3, pruning=False)
        eps = p.stats["expansions_per_s"]
        flag = ""
        if jax.devices()[0].platform == "tpu" and eps < floor:
            flag = ("  << PESSIMIZED DRAW? expected >= "
                    f"{floor:,} — consider rm -rf .jax_cache and re-prime")
            ok = False
        print(f"{name} {shapes}: compile {compile_s:.0f}s, "
              f"{eps:,.0f} exp/s{flag}", flush=True)
    print("prime_cache:", "OK" if ok else "SUSPECT ENTRIES — see above")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
