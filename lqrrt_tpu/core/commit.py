"""Masked compacting batch-commit of steered candidates into the SoA tree.

Factored out of the round so both the single-chip round (core/rounds.py) and
the multi-device sharded round (parallel/sharded.py) insert candidates through
the exact same code path (SURVEY.md section 7: "commit the surviving best
edges into preallocated tree arrays").

Two implementations with identical semantics:

* ``commit_batch`` — masked scatter (`.at[slot].set(..., mode="drop")`).
  General, but TPU scatters serialize per index: ~2.5 ms for a 1024-row
  commit, the single most expensive phase of a round.
* ``commit_batch_dense`` — stable-sort candidates valid-first, gather into a
  contiguous block, ONE dynamic_update_slice at row ``size``.  Vectorized
  writes, no scatter.  Requires the tree arrays to carry ``slack >= batch``
  spare rows past the logical ``limit`` (init_tree(slack=...)) so the
  B-row slice starting at size <= limit never lands out of bounds; spare/
  overflow rows are never counted in ``size`` and always get overwritten by
  the next commit before they could become live.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .tree import TreeArrays


def commit_batch(tree: TreeArrays, dt: float, pids, length, x_seq, u_seq,
                 xnew, S_new, K_new, in_goal, gcost) -> TreeArrays:
    """Insert every candidate with a non-empty rollout (reference semantics:
    "if rollout nonempty: tree.add_node", SURVEY.md section 3.2).

    Candidates that would overflow capacity are dropped via scatter-drop
    indexing; ``size`` saturates at capacity.  All inputs are batch-leading.
    """
    N = tree.capacity
    valid = length >= 1
    offs = jnp.cumsum(valid) - 1
    pos = tree.size + offs
    ok = valid & (pos < N)
    slot = jnp.where(ok, pos, N).astype(jnp.int32)     # N => dropped
    drop = dict(mode="drop")

    node_time = tree.node_time[pids] + length.astype(jnp.float32) * dt
    new_size = tree.size + jnp.sum(ok, dtype=jnp.int32)

    return tree._replace(
        state=tree.state.at[slot].set(xnew, **drop),
        S=tree.S.at[slot].set(S_new, **drop),
        K=tree.K.at[slot].set(K_new, **drop),
        parent=tree.parent.at[slot].set(pids.astype(jnp.int32), **drop),
        edge_x=tree.edge_x.at[slot].set(x_seq, **drop),
        edge_u=tree.edge_u.at[slot].set(u_seq, **drop),
        edge_len=tree.edge_len.at[slot].set(length, **drop),
        node_time=tree.node_time.at[slot].set(node_time, **drop),
        in_goal=tree.in_goal.at[slot].set(in_goal, **drop),
        goal_cost=tree.goal_cost.at[slot].set(gcost, **drop),
        size=new_size,
        goal_found=tree.goal_found | jnp.any(in_goal & ok),
    )


def commit_batch_dense(tree: TreeArrays, dt: float, limit: int, pids, length,
                       x_seq, u_seq, xnew, S_new, K_new, in_goal,
                       gcost) -> TreeArrays:
    """Scatter-free commit (see module docstring).  ``limit`` is the logical
    capacity; tree arrays must be allocated with >= batch rows of slack."""
    B = pids.shape[0]
    valid = length >= 1
    # stable sort, valid candidates first; gathers keep the block contiguous
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    n_valid = jnp.sum(valid, dtype=jnp.int32)
    start = jnp.minimum(tree.size, jnp.asarray(limit, jnp.int32))
    rank = jnp.arange(B, dtype=jnp.int32)
    committed = (rank < n_valid) & (start + rank < limit)

    pids_s = pids.astype(jnp.int32)[order]
    length_s = length[order]
    in_goal_s = in_goal[order]
    node_time = tree.node_time[pids_s] + length_s.astype(jnp.float32) * dt

    def dus(a, block):
        idx = (start,) + (jnp.asarray(0, jnp.int32),) * (a.ndim - 1)
        return jax.lax.dynamic_update_slice(a, block, idx)

    new_size = jnp.minimum(tree.size + n_valid,
                           jnp.asarray(limit, jnp.int32))
    return tree._replace(
        state=dus(tree.state, xnew[order]),
        S=dus(tree.S, S_new[order]),
        K=dus(tree.K, K_new[order]),
        parent=dus(tree.parent, pids_s),
        edge_x=dus(tree.edge_x, x_seq[order]),
        edge_u=dus(tree.edge_u, u_seq[order]),
        edge_len=dus(tree.edge_len, length_s),
        node_time=dus(tree.node_time, node_time),
        in_goal=dus(tree.in_goal, in_goal_s),
        goal_cost=dus(tree.goal_cost, gcost[order]),
        size=new_size,
        goal_found=tree.goal_found | jnp.any(in_goal_s & committed),
    )
