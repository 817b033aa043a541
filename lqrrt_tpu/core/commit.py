"""Masked compacting batch-commit of steered candidates into the SoA tree.

Factored out of the round so both the single-chip round (core/rounds.py) and
the multi-device sharded round (parallel/sharded.py) insert candidates through
the exact same code path (SURVEY.md section 7: "commit the surviving best
edges into preallocated tree arrays").
"""
from __future__ import annotations

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
