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

import time
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
                 seed: int = 0, ncontrols: Optional[int] = None,
                 sys_time: Callable = None):
        self.n_scenarios = int(n_scenarios)
        self.dt = float(dt)
        self.horizon_steps = max(int(round(horizon / dt)), 1)
        self.nstates = None  # resolved at plan() from x0 shape
        self.ncontrols = None if ncontrols is None else int(ncontrols)
        self.goal_buffer = np.asarray(goal_buffer, np.float32)
        self.mesh = mesh
        self.axis = axis
        self._key = jax.random.PRNGKey(seed)
        self.sys_time = sys_time if sys_time is not None else time.time
        self.spec = RoundSpec(
            nstates=-1, ncontrols=-1, batch=int(batch_size),
            horizon_steps=self.horizon_steps, capacity=int(capacity),
            dt=self.dt, nn_block=int(nn_block))
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

    def plan(self, x0s, goals, sample_spaces, goal_bias, rounds: int = 10,
             max_time: Optional[float] = None, rounds_per_chunk: int = 8):
        """Grow all scenario trees; returns stats dict.

        x0s: (S, n); goals: (S, n); sample_spaces: (S, n, 2) or (n, 2)
        shared; goal_bias: (n,) shared.

        Budget semantics (anytime, like Planner.update_plan): with
        ``max_time=None``, exactly ``rounds`` rounds run as ONE device
        dispatch.  With ``max_time`` set, chunks of ``rounds_per_chunk``
        rounds are dispatched until the wall clock (``sys_time``) budget
        expires or ``rounds`` is reached, whichever comes first; the nrounds
        argument is traced, so every chunk reuses one compiled program.
        Per-scenario time-to-first-goal is recorded at chunk granularity.
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
            m = (self.ncontrols if self.ncontrols is not None
                 else self._infer_ncontrols(x0s[0]))
            self._build(n, m)

        trees = self._vseed(x0s, goals)
        if self.mesh is not None:
            sh = NamedSharding(self.mesh, P(self.axis))
            trees = jax.tree.map(lambda x: jax.device_put(x, sh), trees)
        self._key, base = jax.random.split(self._key)
        t0 = self.sys_time()
        goal_time = np.full(S_, np.nan, np.float32)
        if max_time is None:
            trees = self._vplan(trees, base, jnp.asarray(rounds, jnp.int32),
                                goals, sample_spaces, goal_bias)
            done = rounds
        else:
            done = 0
            while done < rounds and self.sys_time() - t0 < max_time:
                nr = min(rounds_per_chunk, rounds - done)
                trees = self._vplan(trees, jax.random.fold_in(base, done),
                                    jnp.asarray(nr, jnp.int32),
                                    goals, sample_spaces, goal_bias)
                done += nr
                found = np.asarray(trees.goal_found)
                now = self.sys_time() - t0
                goal_time = np.where(np.isnan(goal_time) & found,
                                     np.float32(now), goal_time)
        trees.size.block_until_ready()
        elapsed = self.sys_time() - t0
        self.trees = trees
        found = np.asarray(trees.goal_found)
        if max_time is None:
            goal_time = np.where(found, np.float32(elapsed), goal_time)
        expansions = done * self.spec.batch * self.n_scenarios
        return dict(
            sizes=np.asarray(trees.size),
            goal_found=found,
            rounds=done,
            elapsed_s=elapsed,
            expansions=expansions,
            expansions_per_s=expansions / max(elapsed, 1e-9),
            goal_time_s=goal_time,
        )

    def _infer_ncontrols(self, x0):
        # Read K's leading dim from one lqr evaluation.  Re-linearized lqr
        # callbacks that use ``u`` (e.g. the car model without u_eq) cannot
        # be probed with u=None — those callers must pass ncontrols=.
        try:
            _, K0 = self._mk["lqr"](jnp.asarray(x0), None)
        except Exception as e:
            raise ValueError(
                "could not infer ncontrols by probing lqr(x0, None) — the "
                "lqr callback appears to use its u argument; pass "
                "ncontrols= to FleetPlanner explicitly") from e
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
