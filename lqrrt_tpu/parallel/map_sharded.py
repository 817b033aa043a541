"""P3: obstacle/occupancy-map sharding with collective feasibility reduction
(SURVEY.md section 2.4: "occupancy grids split per host, collision verdicts
reduced"; BASELINE north star: "shard ... obstacle maps per host").

When the world map is too large for one device's HBM (harbor-scale occupancy
at centimeter resolution), the grid is split ROW-WISE across a "map" mesh
axis.  Every device plans the identical candidate batch; collision verdicts
for whole rollout batches are computed against the local slab and OR-reduced
with one psum per round (BASELINE: "collision-checks whole rollout batches
... in one pass").

Design: steering rolls out with only the cheap local predicates (control
limits etc.); the sharded grid then truncates each rollout at its first
occupied step.  This is exact, not an approximation: a rollout's state
sequence does not depend on feasibility (infeasibility only truncates), so
post-hoc truncation commits the identical edge the reference's in-loop check
would — with ONE collective per round instead of one per rollout step.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.commit import commit_batch, commit_batch_dense
from ..core.rounds import RoundSpec, make_expand
from ..core.sampling import sample_batch
from ..core.tree import TreeArrays

try:  # jax >= 0.8 moved shard_map to the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


class ShardedGrid:
    """Row-sharded occupancy grid: device d of the "map" axis holds rows
    [d*rows_per, (d+1)*rows_per) of the (H, W) grid."""

    def __init__(self, occ, origin, resolution: float, n_shards: int,
                 pos_dims=(0, 1)):
        occ = np.asarray(occ) != 0
        H, W = occ.shape
        rows_per = -(-H // n_shards)
        pad = rows_per * n_shards - H
        if pad:
            occ = np.pad(occ, ((0, pad), (0, 0)), constant_values=True)
        self.occ_sharded = occ.reshape(n_shards, rows_per, W)  # leading=shard
        self.origin = np.asarray(origin, np.float32)
        self.resolution = float(resolution)
        self.H, self.W = H, W
        self.rows_per = rows_per
        self.n_shards = n_shards
        self.pos_dims = np.asarray(list(pos_dims))

    def occupied_local(self, p, slab, shard_idx):
        """Occupied-verdict of positions p (..., 2) against ONE slab
        (rows_per, W); points outside the slab's rows contribute False
        (their verdict comes from the owning shard via the reduction)."""
        cell = jnp.floor((p - self.origin) / self.resolution).astype(jnp.int32)
        cx, cy = cell[..., 0], cell[..., 1]
        row0 = shard_idx * self.rows_per
        ly = cy - row0
        in_slab = (ly >= 0) & (ly < self.rows_per) & (cx >= 0) & (cx < self.W)
        occ = slab[jnp.clip(ly, 0, self.rows_per - 1),
                   jnp.clip(cx, 0, self.W - 1)]
        local = jnp.where(in_slab, occ, False)
        # whole-map OOB is conservative-occupied; identical on every shard,
        # OR'd in AFTER the reduction (see occupied_global)
        oob = ((cx < 0) | (cx >= self.W) | (cy < 0) | (cy >= self.H))
        return local, oob


def make_map_sharded_round(spec: RoundSpec, mesh: Mesh, grid: ShardedGrid,
                           dynamics: Callable, lqr: Callable, erf: Callable,
                           local_feasible: Callable, error_tol, goal_buffer,
                           wrap_mask=None, saturate: Callable | None = None,
                           nearest_fn: Callable | None = None,
                           axis: str = "map") -> Callable:
    """Round with the occupancy map sharded over ``axis``: candidates and
    tree replicated, ONE psum of slab verdicts truncates the rollout batch.

    ``local_feasible`` holds everything that is NOT the sharded map (control
    limits, analytic obstacles); pass a constant-True predicate if none.
    """
    n_dev = mesh.shape[axis]
    assert grid.n_shards == n_dev, (grid.n_shards, n_dev)
    expand = make_expand(spec, dynamics, lqr, erf, local_feasible, error_tol,
                         goal_buffer, wrap_mask=wrap_mask, saturate=saturate,
                         nearest_fn=nearest_fn)
    lqr_batch = jax.vmap(lqr)
    erf_goal = jax.vmap(erf, in_axes=(None, 0))
    goal_buffer = jnp.asarray(goal_buffer, jnp.float32)
    pos_dims = tuple(int(d) for d in grid.pos_dims)

    def round_body(tree: TreeArrays, slab, key, goal, sample_space,
                   goal_bias, bias_target) -> TreeArrays:
        # identical candidates on every device (no per-device key fold): the
        # map axis parallelizes the WORLD, not the batch
        xrand = sample_batch(key, spec.batch, sample_space, goal_bias,
                             bias_target)
        c = expand(tree, xrand, goal)

        # ---- sharded collision pass over the whole rollout batch (P3) ----
        p = c.x_seq[..., pos_dims]                       # (B, H, 2)
        shard_idx = jax.lax.axis_index(axis)
        local, oob = grid.occupied_local(p, slab[0], shard_idx)
        occupied = (jax.lax.psum(local.astype(jnp.int32), axis) > 0) | oob

        # truncate each rollout at its first occupied step (exactness: see
        # module docstring)
        H = spec.horizon_steps
        any_occ = jnp.any(occupied, axis=1)
        first = jnp.where(any_occ, jnp.argmax(occupied, axis=1), H)
        length = jnp.minimum(c.length, first.astype(jnp.int32))
        x0 = tree.state[c.pids]
        last = jnp.maximum(length - 1, 0)
        xland = jnp.take_along_axis(c.x_seq, last[:, None, None],
                                    axis=1)[:, 0, :]
        xnew = jnp.where((length >= 1)[:, None], xland, x0)
        u_last = jnp.take_along_axis(c.u_seq, last[:, None, None],
                                     axis=1)[:, 0, :]
        S_new, K_new = lqr_batch(xnew, u_last)
        e_goal = erf_goal(goal, xnew)
        in_goal = jnp.all(jnp.abs(e_goal) <= goal_buffer, axis=-1)
        gcost = jnp.einsum("bi,bij,bj->b", e_goal, S_new, e_goal)

        commit = (commit_batch_dense if spec.slack >= spec.batch
                  else lambda t, dt, _lim, *a: commit_batch(t, dt, *a))
        return commit(tree, spec.dt, spec.capacity, c.pids, length, c.x_seq,
                      c.u_seq, xnew, S_new, K_new, in_goal, gcost)

    rep = P()
    return shard_map(
        round_body, mesh=mesh,
        in_specs=(rep, P(axis), rep, rep, rep, rep, rep),
        out_specs=rep,
        check_vma=False)
