"""Round-5 equivalence check: the aliased Pallas block-column writer
(ops/pallas/write_kernel.py) vs the plain dynamic_update_slice commit.

Runs 3 full production rounds (B=8192, cap=32768, root_pad=512) with
lane_block=0 and lane_block=512 from the same seed and asserts the entire
tree pytree is BIT-EQUAL.  Measured on TPU v5e 2026-08-22: bit-equal,
sizes 25088/25088, |edge_x| sums identical.  Run on the TPU:

  python tools/exp_writer_equiv_r5.py
"""
import os
import sys

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
from lqrrt_tpu.core.tree import init_tree
from lqrrt_tpu.models import boat
from lqrrt_tpu.ops.pallas.nn_kernel import make_nearest_const_pallas

BATCH, CAP = 8192, 32768


def main():
    prob = boat.default_problem()
    H = int(round(prob["horizon"] / prob["dt"]))
    wrap_mask = np.zeros(6, bool); wrap_mask[2] = True
    goal = jnp.asarray(prob["goal"])
    ss = jnp.asarray(prob["sample_space"])
    gb = jnp.full((6,), 0.0)
    S0, K0 = prob["lqr"](None, None)
    nn = make_nearest_const_pallas(block=2048, wrap_dim=2)
    outs = {}
    for lb in (0, 512):
        spec = RoundSpec(6, 3, BATCH, H, CAP, prob["dt"], nn_block=2048,
                         slack=BATCH, commit_all=True, lane_block=lb)
        rf = jax.jit(make_round(
            spec, prob["dynamics"], prob["lqr"], prob["erf"],
            prob["constraints"].is_feasible, 0.05,
            prob["constraints"].goal_buffer, wrap_mask=wrap_mask,
            saturate=prob["saturate"], nearest_fn=nn))
        t = init_tree(CAP, H, 6, 3, jnp.asarray(prob["x0"]), S0, K0, 1e9,
                      False, slack=BATCH, root_pad=512)
        for i in range(3):
            t = rf(t, jax.random.fold_in(jax.random.PRNGKey(5), i), goal,
                   ss, gb, goal)
        outs[lb] = jax.device_get(t)
    same = all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(outs[0]),
                               jax.tree.leaves(outs[512])))
    print("writer vs dus bit-equal over 3 rounds:", same)
    assert same
    return 0


if __name__ == "__main__":
    sys.exit(main())
