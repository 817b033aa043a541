"""Planner facade — API parity with the reference's lqrrt/planner.py.

Reference public surface (SURVEY.md C1-C13, lqrrt/planner.py): __init__,
update_plan, get_state, get_effort, set_goal, kill_update, unkill, visualize,
with constructor params (dynamics, lqr, constraints, horizon, dt=0.05, FPR=0,
error_tol=0.05, erf=subtract, min_time=0.5, max_time=1, max_nodes=1e5,
goal0=None, sys_time=time.time, printing=True).  [Reference mount was empty at
survey time; citations follow SURVEY.md's provenance convention.]

TPU re-architecture: the sequential grow loop becomes a host loop over jitted
expansion *rounds* (core/rounds.py) on a fixed-capacity device tree, giving
anytime/preemption semantics at round granularity (SURVEY.md sections 3.4, 7).
User callbacks (dynamics, lqr, erf, is_feasible, xrand_gen) must be
jax-traceable; the framework vmaps them across the candidate batch.

TPU-specific knobs are keyword-only extras: batch_size (candidates per round),
capacity (tree array size), wrap_dims (angle dims wrapped in node storage),
nn_block (NN scan tile), seed (PRNG).

FPR note: the reference's FPR parameter semantics could not be verified
(SURVEY.md section 3.1 [LOW]); here FPR in [0, 1] is implemented as
fraction-of-plan-retention — that fraction of each round's sample batch is
drawn from the previous committed plan's states, warm-starting replans.
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constraints import Constraints
from .core.rounds import RoundSpec, make_round
from .core.steer import make_steer
from .core.tree import TreeArrays, best_node, init_tree
from .core.sampling import normalize_goal_bias
from .tree import Tree

_FPR_PLAN_LEN = 256   # resampled previous-plan states kept for FPR biasing
_PRUNE_BATCH = 64     # batched shortcut attempts per pruning step


class Planner:
    def __init__(self, dynamics: Callable, lqr: Callable,
                 constraints: Constraints, horizon: float, dt: float = 0.05,
                 FPR: float = 0.0, error_tol=0.05, erf: Callable = jnp.subtract,
                 min_time: float = 0.5, max_time: float = 1.0,
                 max_nodes: int = int(1e5), goal0=None,
                 sys_time: Callable = time.time, printing: bool = True, *,
                 batch_size: int = 512, capacity: Optional[int] = None,
                 wrap_dims=(), nn_block: int = 1024, seed: int = 0,
                 saturate: Optional[Callable] = None):
        if horizon <= 0 or dt <= 0:
            raise ValueError("horizon and dt must be positive")
        self.dynamics = dynamics
        self.lqr = lqr
        self.constraints = constraints
        self.horizon = float(horizon)
        self.dt = float(dt)
        self.FPR = float(FPR)
        self.error_tol = error_tol
        self.erf = erf
        self.saturate = saturate
        self.min_time = float(min_time)
        self.max_time = float(max_time)
        self.max_nodes = int(max_nodes)
        self.sys_time = sys_time
        self.printing = printing

        self.nstates = constraints.nstates
        self.ncontrols = constraints.ncontrols
        self.horizon_steps = max(int(round(self.horizon / self.dt)), 1)
        self.batch_size = int(batch_size)
        self.nn_block = int(nn_block)
        if capacity is None:
            capacity = min(self.max_nodes, 32768)
        # capacity rounded up to a multiple of the NN block for clean tiling
        blk = min(self.nn_block, capacity)
        self.capacity = -(-int(capacity) // blk) * blk
        self.wrap_dims = tuple(wrap_dims)

        self._key = jax.random.PRNGKey(seed)
        self._round_cache = {}
        self._killed = False
        self.tree: Optional[Tree] = None           # host snapshot (lazy)
        self._device_tree: Optional[TreeArrays] = None
        self.x_seq = None                          # committed plan states (P, n)
        self.u_seq = None                          # committed plan efforts (P-1, m)
        self.T = 0.0                               # plan duration (s)
        self.plan_reached_goal = False
        self.goal = None
        self.stats = {}

        # batched steer used by pruning / finish_on_goal (compiled lazily)
        self._steer_jit = None
        self._seed_jit = None

        if goal0 is not None:
            self.set_goal(goal0)

    # ------------------------------------------------------------------ setup

    def set_goal(self, goal):
        """Store the goal state (reference Planner.set_goal)."""
        goal = jnp.asarray(goal, jnp.float32)
        if goal.shape != (self.nstates,):
            raise ValueError(f"goal must have shape ({self.nstates},)")
        self.goal = goal

    def kill_update(self):
        """Preempt a running update_plan (reference C10); takes effect at the
        next round boundary (SURVEY.md section 3.4)."""
        self._killed = True

    def unkill(self):
        self._killed = False

    # ------------------------------------------------------------- jit plumbing

    def _get_round(self, xrand_gen, n_fpr: int):
        key = (self.constraints._feasibility_version, id(xrand_gen), n_fpr)
        if key not in self._round_cache:
            spec = RoundSpec(
                nstates=self.nstates, ncontrols=self.ncontrols,
                batch=self.batch_size, horizon_steps=self.horizon_steps,
                capacity=self.capacity, dt=self.dt, nn_block=self.nn_block)
            wrap_mask = None
            if self.wrap_dims:
                wrap_mask = np.zeros(self.nstates, bool)
                wrap_mask[list(self.wrap_dims)] = True
            base = make_round(spec, self.dynamics, self.lqr, self.erf,
                              self.constraints.is_feasible, self.error_tol,
                              self.constraints.goal_buffer, wrap_mask=wrap_mask,
                              xrand_gen=xrand_gen, saturate=self.saturate)
            if n_fpr > 0:
                def with_fpr(tree, key, goal, sample_space, goal_bias,
                             bias_target, prev_plan):
                    def gen(k, B):
                        from .core.sampling import sample_batch
                        k1, k2 = jax.random.split(k)
                        fresh = sample_batch(k1, B - n_fpr, sample_space,
                                             goal_bias, bias_target)
                        rows = jax.random.randint(k2, (n_fpr,), 0,
                                                  prev_plan.shape[0])
                        return jnp.concatenate([prev_plan[rows], fresh], 0)
                    spec2 = spec
                    fn = make_round(spec2, self.dynamics, self.lqr, self.erf,
                                    self.constraints.is_feasible,
                                    self.error_tol,
                                    self.constraints.goal_buffer,
                                    wrap_mask=wrap_mask, xrand_gen=gen,
                                    saturate=self.saturate)
                    return fn(tree, key, goal, sample_space, goal_bias,
                              bias_target)
                fn = jax.jit(with_fpr, donate_argnums=(0,))
            else:
                fn = jax.jit(base, donate_argnums=(0,))
            self._round_cache[key] = fn
        return self._round_cache[key]

    def _get_seed(self):
        """Jitted seed computation: one compiled program instead of an eager
        per-op dispatch storm (a CARE-based lqr callback run eagerly on a
        remote TPU backend costs minutes in per-op compiles)."""
        if self._seed_jit is None:
            def seed(x0, goal, goal_buffer):
                S0, K0 = self.lqr(x0, jnp.zeros(self.ncontrols))
                e0 = self.erf(goal, x0)
                in_goal0 = jnp.all(jnp.abs(e0) <= goal_buffer)
                g0 = e0 @ S0 @ e0
                return S0, K0, in_goal0, g0
            self._seed_jit = jax.jit(seed)
        return self._seed_jit

    def _get_steer(self):
        if self._steer_jit is None:
            steer = make_steer(self.dynamics, self.erf,
                               self.constraints.is_feasible,
                               self.horizon_steps, self.dt, self.error_tol,
                               saturate=self.saturate)
            self._steer_jit = jax.jit(steer)
        return self._steer_jit

    # ------------------------------------------------------------ update_plan

    def update_plan(self, x0, sample_space, goal_bias=0, guide=None,
                    xrand_gen: Callable = None, pruning: bool = True,
                    finish_on_goal: bool = False,
                    specific_time: Optional[float] = None) -> bool:
        """Grow a tree from x0 until the time budget expires, then commit the
        best branch as the current plan (reference C2/C7, SURVEY.md 3.2).

        Returns True iff the tree reached the goal region.
        """
        if self.goal is None:
            raise RuntimeError("goal not set; call set_goal or pass goal0")
        self.unkill()
        x0 = jnp.asarray(x0, jnp.float32)
        if x0.shape != (self.nstates,):
            raise ValueError(f"x0 must have shape ({self.nstates},)")
        sample_space = jnp.asarray(sample_space, jnp.float32).reshape(
            self.nstates, 2)
        goal_bias = normalize_goal_bias(goal_bias, self.nstates)
        bias_target = self.goal if guide is None else jnp.asarray(
            guide, jnp.float32)

        if specific_time is not None:
            t_min = t_max = float(specific_time)
        else:
            t_min, t_max = self.min_time, self.max_time

        # FPR warm-start pool from the previous committed plan.  With no
        # previous plan yet, a straight-line x0->goal ramp stands in, so the
        # FPR>0 configuration always compiles exactly ONE round variant
        # (n_fpr is a trace-time constant).
        n_fpr = 0
        prev_plan = None
        if self.FPR > 0.0:
            n_fpr = max(int(round(self.FPR * self.batch_size)), 1)
            if self.x_seq is not None and len(self.x_seq) > 1:
                idx = np.linspace(0, len(self.x_seq) - 1, _FPR_PLAN_LEN)
                pool = np.asarray(self.x_seq)[idx.astype(int)]
            else:
                pool = np.linspace(np.asarray(x0), np.asarray(self.goal),
                                   _FPR_PLAN_LEN, dtype=np.float32)
            prev_plan = jnp.asarray(pool, jnp.float32)

        round_fn = self._get_round(xrand_gen, n_fpr)

        # seed the tree at x0 (reference: Tree(seed_state=x0, seed_lqr=...))
        S0, K0, in_goal0, gcost0 = self._get_seed()(
            x0, self.goal, self.constraints.goal_buffer)
        tree = init_tree(self.capacity, self.horizon_steps, self.nstates,
                         self.ncontrols, x0, S0, K0, gcost0, in_goal0)

        self._key, base = jax.random.split(self._key)
        t0 = self.sys_time()
        rounds = 0
        node_cap = min(self.max_nodes, self.capacity)
        if self.printing:
            print(f"[lqrrt] planning: budget [{t_min}, {t_max}]s, "
                  f"batch {self.batch_size}, capacity {self.capacity}")
        while True:
            elapsed = self.sys_time() - t0
            if self._killed:
                if self.printing:
                    print("[lqrrt] killed; salvaging best-so-far")
                break
            size = int(tree.size)
            goal_found = bool(tree.goal_found)
            if size >= node_cap:
                break
            if elapsed >= t_max:
                break
            if goal_found and elapsed >= t_min:
                break
            key = jax.random.fold_in(base, rounds)
            args = [tree, key, self.goal, sample_space, goal_bias, bias_target]
            if n_fpr > 0:
                args.append(prev_plan)
            tree = round_fn(*args)
            rounds += 1
        # make sure the last round finished before timing
        tree.size.block_until_ready()
        elapsed = self.sys_time() - t0

        self._device_tree = tree
        self.tree = None  # host snapshot invalidated; rebuilt lazily

        goal_reached = bool(tree.goal_found)
        best = int(best_node(tree))
        x_seq, u_seq = self._extract(tree, best)

        if pruning and len(x_seq) > 2:
            x_seq, u_seq = self._prune(tree, best, x_seq, u_seq)
        if finish_on_goal and goal_reached:
            x_seq, u_seq = self._finish_on_goal(x_seq, u_seq)

        self.x_seq = np.asarray(x_seq, np.float32)
        self.u_seq = np.asarray(u_seq, np.float32)
        self.T = self.dt * (len(self.x_seq) - 1)
        self.plan_reached_goal = goal_reached
        self.stats = dict(
            nodes=int(tree.size), rounds=rounds, elapsed_s=elapsed,
            expansions=rounds * self.batch_size,
            expansions_per_s=rounds * self.batch_size / max(elapsed, 1e-9),
            goal_found=goal_reached, plan_steps=len(self.x_seq))
        if self.printing:
            print(f"[lqrrt] done: {self.stats['nodes']} nodes, "
                  f"{rounds} rounds in {elapsed:.3f}s "
                  f"({self.stats['expansions_per_s']:.0f} expansions/s), "
                  f"goal={'yes' if goal_reached else 'no'}")
        return goal_reached

    # ------------------------------------------------- extraction & smoothing

    def _extract(self, tree: TreeArrays, best: int):
        """Climb best -> root and concatenate trimmed edge rollouts
        (reference tree.climb + tree.trajectory, SURVEY.md C7/C8)."""
        parent = np.asarray(tree.parent)
        chain = []
        ID = best
        while ID != -1:
            chain.append(ID)
            ID = int(parent[ID])
        chain = chain[::-1]
        self._last_chain = chain
        # single gather + transfer for the chain's edges
        ids = jnp.asarray(chain, jnp.int32)
        edge_x = np.asarray(tree.edge_x[ids])
        edge_u = np.asarray(tree.edge_u[ids])
        edge_len = np.asarray(tree.edge_len[ids])
        root_state = np.asarray(tree.state[chain[0]])
        xs = [root_state[None, :]]
        us = []
        for i in range(1, len(chain)):
            ln = int(edge_len[i])
            xs.append(edge_x[i][:ln])
            us.append(edge_u[i][:ln])
        x_seq = np.concatenate(xs, axis=0)
        u_seq = (np.concatenate(us, axis=0) if us
                 else np.zeros((0, self.ncontrols), np.float32))
        return x_seq, u_seq

    def _chain_states_gains(self, tree: TreeArrays):
        chain = self._last_chain
        ids = jnp.asarray(chain, jnp.int32)
        return (np.asarray(tree.state[ids]), np.asarray(tree.K[ids]), chain)

    def _prune(self, tree: TreeArrays, best: int, x_seq, u_seq):
        """Greedy shortcut pass: re-steer between non-adjacent chain nodes and
        drop intermediates (reference pruning=True behavior, SURVEY.md C7).

        Batched: from node i, one jitted steer batch attempts connections to
        up to _PRUNE_BATCH downstream chain nodes at once.
        """
        states, gains, chain = self._chain_states_gains(tree)
        L = len(chain)
        if L <= 2:
            return x_seq, u_seq
        steer = self._get_steer()
        PB = _PRUNE_BATCH
        segs_x, segs_u = [], []
        i = 0
        while i < L - 1:
            # candidate targets: chain[i+2 ...], padded to PB with chain[i+1]
            tgt_ids = list(range(i + 2, min(L, i + 2 + PB)))
            n_t = len(tgt_ids)
            if n_t == 0:
                # adjacent edge only: keep original rollout
                segs_x.append(self._edge_of(tree, chain[i + 1]))
                i += 1
                continue
            targets = np.zeros((PB, self.nstates), np.float32)
            targets[:n_t] = states[tgt_ids]
            targets[n_t:] = states[i + 1]
            res = steer(jnp.tile(jnp.asarray(states[i])[None, :], (PB, 1)),
                        jnp.tile(jnp.asarray(gains[i])[None], (PB, 1, 1)),
                        jnp.asarray(targets))
            reached = np.asarray(res.reached)[:n_t]
            if reached.any():
                j_rel = int(np.max(np.nonzero(reached)[0]))
                j = tgt_ids[j_rel]
                ln = int(np.asarray(res.length)[j_rel])
                segs_x.append((np.asarray(res.x_seq)[j_rel][:ln],
                               np.asarray(res.u_seq)[j_rel][:ln]))
                i = j
            else:
                segs_x.append(self._edge_of(tree, chain[i + 1]))
                i += 1
        xs = [states[0][None, :]]
        us = []
        for sx, su in segs_x:
            xs.append(sx)
            us.append(su)
        x_new = np.concatenate(xs, axis=0)
        u_new = (np.concatenate(us, axis=0) if us
                 else np.zeros((0, self.ncontrols), np.float32))
        # only accept if it actually shortens the plan
        if len(x_new) < len(x_seq):
            return x_new, u_new
        return x_seq, u_seq

    def _edge_of(self, tree: TreeArrays, node_id: int):
        ln = int(tree.edge_len[node_id])
        return (np.asarray(tree.edge_x[node_id])[:ln],
                np.asarray(tree.edge_u[node_id])[:ln])

    def _finish_on_goal(self, x_seq, u_seq):
        """Attempt an exact terminal connection to the goal (reference
        finish_on_goal=True / _steer(..., force_arrive=True), SURVEY.md C7)."""
        steer = self._get_steer()
        PB = _PRUNE_BATCH
        x_end = jnp.tile(jnp.asarray(x_seq[-1])[None, :], (PB, 1))
        Sg, Kg, _, _ = self._get_seed()(jnp.asarray(x_seq[-1]), self.goal,
                                        self.constraints.goal_buffer)
        res = steer(x_end, jnp.tile(Kg[None], (PB, 1, 1)),
                    jnp.tile(self.goal[None, :], (PB, 1)))
        if bool(np.asarray(res.reached)[0]):
            ln = int(np.asarray(res.length)[0])
            x_seq = np.concatenate([x_seq, np.asarray(res.x_seq)[0][:ln]], 0)
            u_seq = np.concatenate(
                [u_seq, np.asarray(res.u_seq)[0][:ln]], 0) if len(u_seq) else \
                np.asarray(res.u_seq)[0][:ln]
        return x_seq, u_seq

    # --------------------------------------------------- controller-facing API

    def get_state(self, t: float):
        """Plan state at time t (s, relative to plan start), linear
        interpolation, endpoint hold outside [0, T] (reference C11)."""
        if self.x_seq is None:
            raise RuntimeError("no plan committed; call update_plan first")
        return self._interp(self.x_seq, t)

    def get_effort(self, t: float):
        """Plan effort at time t; zero-order hold per dt sample, endpoint hold
        outside the plan (reference C11)."""
        if self.u_seq is None:
            raise RuntimeError("no plan committed; call update_plan first")
        if len(self.u_seq) == 0:
            return np.zeros(self.ncontrols, np.float32)
        i = int(np.clip(np.floor(t / self.dt), 0, len(self.u_seq) - 1))
        return self.u_seq[i]

    def _interp(self, seq, t: float):
        tau = np.clip(t / self.dt, 0.0, len(seq) - 1)
        i = int(np.floor(tau))
        j = min(i + 1, len(seq) - 1)
        a = tau - i
        return (1.0 - a) * seq[i] + a * seq[j]

    # ------------------------------------------------------------------ extras

    def get_tree(self) -> Tree:
        """Host snapshot of the last planning tree (reference-compatible)."""
        if self.tree is None:
            if self._device_tree is None:
                raise RuntimeError("no tree; call update_plan first")
            self.tree = Tree.from_device_arrays(self._device_tree)
        return self.tree

    def visualize(self, dx: int = 0, dy: int = 1, ax=None, show: bool = True):
        """matplotlib plot of tree + plan projected on dims (dx, dy)
        (reference C12)."""
        from .viz import visualize_planner
        return visualize_planner(self, dx, dy, ax=ax, show=show)
