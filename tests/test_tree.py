"""Host Tree (reference-parity API) and device TreeArrays unit tests."""
import numpy as np
import jax.numpy as jnp

from lqrrt_tpu.tree import Tree
from lqrrt_tpu.core.tree import best_node, init_tree


def _mk_host_tree():
    t = Tree(np.zeros(2), (np.eye(2), np.ones((1, 2))))
    # chain 0 -> 1 -> 2, plus branch 0 -> 3
    t.add_node(0, [1.0, 0.0], (np.eye(2), np.ones((1, 2))),
               x_seq=[[0.5, 0.0], [1.0, 0.0]], u_seq=[[0.1], [0.1]])
    t.add_node(1, [2.0, 0.0], (np.eye(2), np.ones((1, 2))),
               x_seq=[[1.5, 0.0], [2.0, 0.0]], u_seq=[[0.2], [0.2]])
    t.add_node(0, [0.0, 1.0], (np.eye(2), np.ones((1, 2))),
               x_seq=[[0.0, 1.0]], u_seq=[[0.3]])
    return t


def test_host_tree_climb():
    t = _mk_host_tree()
    assert t.climb(2) == [0, 1, 2]
    assert t.climb(3) == [0, 3]
    assert t.climb(0) == [0]
    assert t.size == 4


def test_host_tree_trajectory():
    t = _mk_host_tree()
    xs, us = t.trajectory(t.climb(2))
    np.testing.assert_allclose(xs, [[0.5, 0], [1, 0], [1.5, 0], [2, 0]])
    np.testing.assert_allclose(us, [[0.1], [0.1], [0.2], [0.2]])


def test_host_tree_bad_parent():
    t = _mk_host_tree()
    import pytest
    with pytest.raises(IndexError):
        t.add_node(99, [0, 0], None, [[0, 0]], [[0]])


def test_init_tree_and_best_node():
    x0 = jnp.zeros(2)
    tree = init_tree(capacity=8, horizon_steps=4, nstates=2, ncontrols=1,
                     x0=x0, S0=jnp.eye(2), K0=jnp.ones((1, 2)),
                     goal_cost0=5.0, in_goal0=False)
    assert int(tree.size) == 1
    assert int(best_node(tree)) == 0
    # add a fake better node by hand
    tree = tree._replace(
        state=tree.state.at[1].set(jnp.array([1.0, 1.0])),
        goal_cost=tree.goal_cost.at[1].set(0.5),
        parent=tree.parent.at[1].set(0),
        size=jnp.asarray(2),
    )
    assert int(best_node(tree)) == 1
    # goal nodes beat cost heuristic; min node_time among them wins
    tree = tree._replace(
        in_goal=tree.in_goal.at[0].set(True),
        node_time=tree.node_time.at[0].set(3.0),
        goal_found=jnp.asarray(True),
    )
    assert int(best_node(tree)) == 0


def test_valid_mask():
    tree = init_tree(capacity=8, horizon_steps=2, nstates=2, ncontrols=1,
                     x0=jnp.zeros(2), S0=jnp.eye(2), K0=jnp.ones((1, 2)),
                     goal_cost0=1.0, in_goal0=False)
    np.testing.assert_array_equal(np.asarray(tree.valid_mask()),
                                  [True] + [False] * 7)
