"""Scenario parallelism (P4): many independent planner instances at once.

The BASELINE.json "pod-scale fleet replanning" config: 1k simultaneous boat
scenarios sharded across devices/hosts.  Each scenario owns its own
fixed-capacity tree; the expansion round is vmapped over the scenario axis and
the scenario axis is sharded over the mesh — pure data parallelism with zero
cross-scenario communication, so scaling is limited only by HBM capacity.

All scenarios share the same model (dynamics/lqr/erf/feasibility); start
states, goals, sample spaces, and PRNG streams are per-scenario.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.rounds import RoundSpec, make_round
from ..core.tree import TreeArrays, best_node, init_tree


class FleetPlanner:
    """Batched fleet of planners over a (optionally sharded) scenario axis.

    Compared to the host Planner facade this is a throughput-oriented API:
    one ``plan(...)`` call grows all scenario trees for a fixed number of
    rounds (or until a wall-clock budget) and returns per-scenario results.
    """

    def __init__(self, dynamics: Callable, lqr: Callable, erf: Callable,
                 is_feasible: Callable, goal_buffer, horizon: float,
                 dt: float = 0.05, error_tol=0.05, *,
                 n_scenarios: int, batch_size: int = 256,
                 capacity: int = 4096, nn_block: int = 1024,
                 saturate: Optional[Callable] = None, wrap_dims=(),
                 mesh: Optional[Mesh] = None, axis: str = "scenario",
                 seed: int = 0):
        self.n_scenarios = int(n_scenarios)
        self.dt = float(dt)
        self.horizon_steps = max(int(round(horizon / dt)), 1)
        self.nstates = None  # resolved at plan() from x0 shape
        self.goal_buffer = np.asarray(goal_buffer, np.float32)
        self.mesh = mesh
        self.axis = axis
        self._key = jax.random.PRNGKey(seed)
        self.spec = RoundSpec(
            nstates=-1, ncontrols=-1, batch=int(batch_size),
            horizon_steps=self.horizon_steps, capacity=int(capacity),
            dt=self.dt, nn_block=int(nn_block))
        wrap_mask = None
        self._mk = dict(dynamics=dynamics, lqr=lqr, erf=erf,
                        is_feasible=is_feasible, error_tol=error_tol,
                        saturate=saturate, wrap_dims=tuple(wrap_dims))
        self._vplan = None
        self._lqr = lqr
        self._erf = erf
        self.trees: Optional[TreeArrays] = None  # scenario-leading pytree

    def _build(self, nstates: int, ncontrols: int):
        blk = min(self.spec.nn_block, self.spec.capacity)
        slack = -(-self.spec.batch // blk) * blk  # dense-commit spare rows
        self.spec = self.spec._replace(nstates=nstates, ncontrols=ncontrols,
                                       slack=slack)
        wrap_mask = None
        if self._mk["wrap_dims"]:
            wrap_mask = np.zeros(nstates, bool)
            wrap_mask[list(self._mk["wrap_dims"])] = True
        round_fn = make_round(
            self.spec, self._mk["dynamics"], self._mk["lqr"], self._mk["erf"],
            self._mk["is_feasible"], self._mk["error_tol"], self.goal_buffer,
            wrap_mask=wrap_mask, saturate=self._mk["saturate"])
        vround = jax.vmap(round_fn, in_axes=(0, 0, 0, 0, None, 0))
        S = self.n_scenarios

        # All rounds fused into ONE dispatch (lax.fori_loop with a traced
        # trip count compiles once for any round count): per-round host
        # dispatch would be latency-bound on remote/pod deployments.
        def run(trees, base, nrounds, goals, sample_spaces, goal_bias):
            def body(r, ts):
                keys = jax.random.split(jax.random.fold_in(base, r), S)
                return vround(ts, keys, goals, sample_spaces, goal_bias,
                              goals)
            return jax.lax.fori_loop(0, nrounds, body, trees)

        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.axis))
            rep = NamedSharding(self.mesh, P())
            tree_sh = jax.tree.map(lambda _: sh, _tree_proto())
            self._vplan = jax.jit(
                run, donate_argnums=(0,),
                in_shardings=(tree_sh, rep, rep, sh, sh, rep),
                out_shardings=tree_sh)
        else:
            self._vplan = jax.jit(run, donate_argnums=(0,))
        # vmapped seeding
        def seed_one(x0, goal):
            S0, K0 = self._mk["lqr"](x0, jnp.zeros(ncontrols))
            e0 = self._mk["erf"](goal, x0)
            in_goal0 = jnp.all(jnp.abs(e0) <= self.goal_buffer)
            g0 = e0 @ S0 @ e0
            return init_tree(self.spec.capacity, self.spec.horizon_steps,
                             nstates, ncontrols, x0, S0, K0, g0, in_goal0,
                             slack=self.spec.slack)
        self._vseed = jax.jit(jax.vmap(seed_one))

    def plan(self, x0s, goals, sample_spaces, goal_bias, rounds: int = 10):
        """Grow all scenario trees for ``rounds`` rounds; returns stats dict.

        x0s: (S, n); goals: (S, n); sample_spaces: (S, n, 2) or (n, 2)
        shared; goal_bias: (n,) shared.
        """
        x0s = jnp.asarray(x0s, jnp.float32)
        goals = jnp.asarray(goals, jnp.float32)
        S_, n = x0s.shape
        assert S_ == self.n_scenarios
        sample_spaces = jnp.asarray(sample_spaces, jnp.float32)
        if sample_spaces.ndim == 2:
            sample_spaces = jnp.broadcast_to(sample_spaces[None],
                                             (S_, n, 2))
        goal_bias = jnp.asarray(goal_bias, jnp.float32)
        if goal_bias.ndim == 0:
            goal_bias = jnp.full((n,), goal_bias)

        if self._vplan is None or self.spec.nstates != n:
            self._build(n, self._infer_ncontrols(x0s[0]))

        trees = self._vseed(x0s, goals)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.axis))
            trees = jax.tree.map(lambda x: jax.device_put(x, sh), trees)
        self._key, base = jax.random.split(self._key)
        trees = self._vplan(trees, base, jnp.asarray(rounds, jnp.int32),
                            goals, sample_spaces, goal_bias)
        trees.size.block_until_ready()
        self.trees = trees
        return dict(
            sizes=np.asarray(trees.size),
            goal_found=np.asarray(trees.goal_found),
            expansions=rounds * self.spec.batch * self.n_scenarios,
        )

    def _infer_ncontrols(self, x0):
        # read K's leading dim from one lqr evaluation
        _, K0 = self._mk["lqr"](jnp.asarray(x0), None)
        return int(np.asarray(K0).shape[0])

    def best_nodes(self):
        return np.asarray(jax.jit(jax.vmap(best_node))(self.trees))

    def extract_plan(self, scenario: int):
        """Host-side plan extraction for one scenario (climb + concat)."""
        t = jax.tree.map(lambda x: x[scenario], self.trees)
        best = int(best_node(t))
        parent = np.asarray(t.parent)
        chain = []
        i = best
        while i != -1:
            chain.append(i)
            i = int(parent[i])
        chain = chain[::-1]
        ids = jnp.asarray(chain, jnp.int32)
        edge_x = np.asarray(t.edge_x[ids])
        edge_len = np.asarray(t.edge_len[ids])
        xs = [np.asarray(t.state[chain[0]])[None]]
        for k in range(1, len(chain)):
            xs.append(edge_x[k][: int(edge_len[k])])
        return np.concatenate(xs, 0)


def _tree_proto():
    """Structure-only TreeArrays pytree for sharding prefix maps."""
    return TreeArrays(*[0] * len(TreeArrays._fields))
