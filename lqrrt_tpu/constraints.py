"""Problem specification record — API parity with the reference Constraints.

Reference: lqrrt/constraints.py (~L1-80) class Constraints holding nstates,
ncontrols, goal_buffer, search_buffer, and the user is_feasible(x, u)
predicate, with a setter to swap the feasibility function at runtime for
dynamic obstacle updates (SURVEY.md C9).  [Reference mount was empty at survey
time — citations are to the public repo per SURVEY.md's provenance warning.]

TPU deltas: buffers are stored as jnp arrays; ``is_feasible`` must be
jax-traceable on a single (x, u) pair — the planner vmaps it across
(batch x rollout-step).  Swapping the feasibility function invalidates the
planner's compiled round (it retriggers a trace), which the Planner handles
automatically.
"""
from __future__ import annotations

from typing import Callable

import numpy as np


class Constraints:
    def __init__(self, nstates: int, ncontrols: int, goal_buffer,
                 search_buffer=None, is_feasible: Callable = None):
        self.nstates = int(nstates)
        self.ncontrols = int(ncontrols)
        # numpy storage: backend-neutral; jit embeds these as constants
        self.goal_buffer = np.asarray(goal_buffer, np.float32)
        if self.goal_buffer.shape != (self.nstates,):
            raise ValueError(
                f"goal_buffer must have shape ({self.nstates},), got {self.goal_buffer.shape}")
        if search_buffer is None:
            search_buffer = np.zeros((self.nstates, 2), np.float32)
        self.search_buffer = np.asarray(search_buffer, np.float32).reshape(self.nstates, 2)
        if is_feasible is None:
            import jax.numpy as jnp
            is_feasible = lambda x, u: jnp.bool_(True)
        self.set_feasibility_function(is_feasible)

    def set_feasibility_function(self, is_feasible: Callable):
        """Swap the feasibility predicate (dynamic obstacle updates,
        reference lqrrt/constraints.py set_feasibility_function [MED])."""
        if not callable(is_feasible):
            raise ValueError("is_feasible must be callable (x, u) -> bool")
        self.is_feasible = is_feasible
        # monotonically bumped so the Planner knows to re-trace its round
        self._feasibility_version = getattr(self, "_feasibility_version", -1) + 1
