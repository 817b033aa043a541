"""Multi-device expansion rounds via shard_map (P1/P2 of SURVEY.md 2.4).

Strategy (BASELINE.json north star: "shard sample batches ... per host,
reducing best-candidate edges via collectives"):

* The tree is REPLICATED on every device (it is the read-hot structure: every
  candidate's NN scan reads all of it; replication turns the scan into pure
  local compute with zero communication).
* The candidate batch is SHARDED over the "dp" mesh axis: each device draws
  its own fold of the round key, runs nearest+steer+Riccati on batch/n_dev
  candidates (the expensive part), then the per-candidate results are
  all-gathered over ICI and every device commits the identical full batch.
  The commit is O(batch) scatter work — negligible next to steering — and
  keeping it replicated means the tree never needs a collective scatter.
* Determinism: the gathered batch is identical on all devices, so the
  replicated trees stay bit-identical round after round.

The all_gather of candidate edges IS the best-edge collective (P2): every
device contributes its locally-best feasible edges and receives everyone
else's.  Communication volume per round = the candidate rollout buffers
(batch x H x (n+m) floats), which amortizes perfectly with batch size.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.commit import commit_batch
from ..core.rounds import RoundSpec, make_expand
from ..core.sampling import sample_batch
from ..core.tree import TreeArrays

try:  # jax >= 0.8 moved shard_map to the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_sharded_round(spec: RoundSpec, mesh: Mesh, dynamics: Callable,
                       lqr: Callable, erf: Callable, is_feasible: Callable,
                       error_tol, goal_buffer, wrap_mask=None,
                       saturate: Callable | None = None,
                       nearest_fn: Callable | None = None,
                       axis: str = "dp") -> Callable:
    """Build the multi-device round: same signature and semantics as the
    single-chip round, tree replicated, candidate batch sharded over ``axis``.

    spec.batch is the GLOBAL batch; it must divide by the mesh axis size.
    ``nearest_fn`` (e.g. the Pallas NN kernel) runs per device on the local
    candidate shard against the replicated tree.
    """
    n_dev = mesh.shape[axis]
    if spec.batch % n_dev != 0:
        raise ValueError(f"batch {spec.batch} not divisible by mesh axis "
                         f"{axis}={n_dev}")
    local_b = spec.batch // n_dev
    expand = make_expand(spec, dynamics, lqr, erf, is_feasible, error_tol,
                         goal_buffer, wrap_mask=wrap_mask, saturate=saturate,
                         nearest_fn=nearest_fn)

    rep = P()

    def round_body(tree: TreeArrays, key, goal, sample_space, goal_bias,
                   bias_target) -> TreeArrays:
        # per-device key fold -> independent sample shard (P1)
        idx = jax.lax.axis_index(axis)
        key_i = jax.random.fold_in(key, idx)
        xrand = sample_batch(key_i, local_b, sample_space, goal_bias,
                             bias_target)

        cand = expand(tree, xrand, goal)         # local compute, no comms

        # best-edge collective (P2): gather the full candidate batch over ICI
        cand_full = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True), cand)

        # replicated commit: identical on every device, tree stays replicated
        return commit_batch(tree, spec.dt, cand_full.pids, cand_full.length,
                            cand_full.x_seq, cand_full.u_seq, cand_full.xnew,
                            cand_full.S_new, cand_full.K_new,
                            cand_full.in_goal, cand_full.gcost)

    # a single P() acts as a prefix spec for each whole argument pytree
    sharded = shard_map(
        round_body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep),
        out_specs=rep,
        check_vma=False)
    return sharded


def jit_sharded_round(round_fn: Callable, mesh: Mesh) -> Callable:
    return jax.jit(round_fn, donate_argnums=(0,))


def replicate_tree(tree: TreeArrays, mesh: Mesh) -> TreeArrays:
    """Place every tree leaf replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
