"""Vectorized feasibility / collision primitives.

The reference delegates feasibility entirely to a user ``is_feasible(x, u)``
predicate that encodes collision + actuation limits (SURVEY.md C9); its demos
use circular obstacles, and the WAM-V deployment used an occupancy grid
(SURVEY.md D3).  Here both are first-class, fully batched components
(BASELINE.json: "constraint/collision checks -> masked batch kernels").

All predicates take a single (x, u) and return a boolean scalar; the planner
vmaps them over (batch, rollout-step).  Combinators let users compose them.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax.numpy as jnp

Feasibility = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def all_of(*preds: Feasibility) -> Feasibility:
    """Conjunction of feasibility predicates."""
    def is_feasible(x, u):
        ok = jnp.bool_(True)
        for p in preds:
            ok = jnp.logical_and(ok, p(x, u))
        return ok
    return is_feasible


def circles_free(centers, radii, pos_dims: Sequence[int] = (0, 1),
                 margin: float = 0.0) -> Feasibility:
    """Feasible iff position is outside every circular obstacle.

    centers: (K, 2) array, radii: (K,) array.  The classic lqRRT demo
    obstacle model (SURVEY.md D1/D3).
    """
    # numpy constants (see angles.make_erf note on remote-backend closures)
    centers = np.asarray(centers, np.float32).reshape(-1, 2)
    radii = np.asarray(radii, np.float32).reshape(-1)
    # static python ints: x[d] per dim instead of an advanced-index gather —
    # gathers don't lower inside the Pallas rollout kernel (Mosaic), and the
    # stack form is identical semantics everywhere else
    dims = tuple(int(d) for d in pos_dims)

    def is_feasible(x, u):
        del u
        p = jnp.stack([x[d] for d in dims])
        d2 = jnp.sum((centers - p) ** 2, axis=-1)
        return jnp.all(d2 > (radii + margin) ** 2)

    return is_feasible


def control_limits(umin, umax) -> Feasibility:
    """Feasible iff u is inside the box [umin, umax] (actuation saturation).

    In the reference, effort limits live inside the user is_feasible
    (SURVEY.md C5 note on saturation).
    """
    umin = np.asarray(umin, np.float32)
    umax = np.asarray(umax, np.float32)

    def is_feasible(x, u):
        del x
        return jnp.all((u >= umin) & (u <= umax))

    return is_feasible


def state_box(xmin, xmax, dims: Sequence[int] | None = None) -> Feasibility:
    """Feasible iff selected state dims stay inside a box (workspace bounds)."""
    xmin = np.asarray(xmin, np.float32)
    xmax = np.asarray(xmax, np.float32)
    sel = None if dims is None else tuple(int(d) for d in dims)

    def is_feasible(x, u):
        del u
        # static per-dim indexing (no gather — Pallas-kernel traceable)
        xs = x if sel is None else jnp.stack([x[d] for d in sel])
        return jnp.all((xs >= xmin) & (xs <= xmax))

    return is_feasible


class OccupancyGrid:
    """Dense 2-D occupancy grid with a world->cell transform.

    The deployment-grade obstacle model for the boat (SURVEY.md D3:
    "occupancy-grid (deployment) feasibility").  ``occ`` is (H, W) with
    nonzero = occupied; ``origin`` is the world coordinate of cell (0, 0);
    ``resolution`` is meters per cell.  Lookup is a gather — cheap and
    vmap-friendly; out-of-bounds cells are treated as occupied (conservative).
    """

    def __init__(self, occ, origin, resolution: float,
                 pos_dims: Sequence[int] = (0, 1)):
        self.occ = np.asarray(occ) != 0
        self.origin = np.asarray(origin, np.float32)
        self.resolution = float(resolution)
        self.pos_dims = np.asarray(list(pos_dims))

    def occupied(self, p):
        """True if world position p (..., 2) falls in an occupied or OOB cell."""
        cell = jnp.floor((p - self.origin) / self.resolution).astype(jnp.int32)
        H, W = self.occ.shape  # noqa: N806
        cx, cy = cell[..., 0], cell[..., 1]
        inb = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        # row = y cell, col = x cell; clip for safe gather, mask OOB after.
        occ = jnp.asarray(self.occ)[jnp.clip(cy, 0, H - 1),
                                    jnp.clip(cx, 0, W - 1)]
        return jnp.where(inb, occ, True)

    def is_feasible(self, x, u):
        del u
        return jnp.logical_not(self.occupied(x[self.pos_dims]))

    def feasibility(self, footprint_radius: float = 0.0,
                    n_ring: int = 8) -> Feasibility:
        """Return an is_feasible predicate, optionally inflating by a circular
        footprint sampled at ``n_ring`` boundary points."""
        if footprint_radius <= 0.0:
            return self.is_feasible
        ang = np.linspace(0.0, 2.0 * np.pi, n_ring, endpoint=False,
                          dtype=np.float32)
        ring = footprint_radius * np.stack([np.cos(ang), np.sin(ang)], -1)

        def is_feasible(x, u):
            del u
            p = x[self.pos_dims]
            pts = jnp.concatenate([p[None, :], p[None, :] + ring], axis=0)
            return jnp.logical_not(jnp.any(self.occupied(pts)))

        return is_feasible


# ---------------------------------------------------------------- data-driven
# 3-arg predicates for Constraints(feasibility_data=...): the obstacle field
# is a pytree of arrays threaded through the compiled planner round as a
# traced argument, so moving obstacles update with ZERO recompiles
# (Constraints.set_feasibility_data; reference C9 "dynamic obstacle updates").


def circles_free_data(pos_dims: Sequence[int] = (0, 1),
                      margin: float = 0.0) -> Callable:
    """is_feasible(x, u, data) over a dynamic circle field.

    data = {"centers": (K, 2), "radii": (K,)}; K is fixed (shape changes
    recompile), pad unused slots with radius < 0 to deactivate them.
    """
    pos_dims = np.asarray(list(pos_dims))
    m = float(margin)

    def is_feasible(x, u, data):
        del u
        p = x[pos_dims]
        centers = jnp.asarray(data["centers"], jnp.float32)
        radii = jnp.asarray(data["radii"], jnp.float32)
        d2 = jnp.sum((centers - p) ** 2, axis=-1)
        hit = (radii >= 0.0) & (d2 <= (radii + m) ** 2)
        return jnp.logical_not(jnp.any(hit))

    return is_feasible


def grid_free_data(origin, resolution: float,
                   pos_dims: Sequence[int] = (0, 1)) -> Callable:
    """is_feasible(x, u, occ) over a dynamic occupancy grid.

    ``occ`` (the feasibility_data) is an (H, W) array, nonzero = occupied,
    with the fixed world transform (origin, resolution); refreshed grids of
    the same shape update with zero recompiles.  Out-of-bounds = occupied.
    """
    origin = np.asarray(origin, np.float32)
    res = float(resolution)
    pos_dims = np.asarray(list(pos_dims))

    def is_feasible(x, u, occ):
        del u
        p = x[pos_dims]
        occ = jnp.asarray(occ) != 0
        H, W = occ.shape  # noqa: N806
        cell = jnp.floor((p - origin) / res).astype(jnp.int32)
        cx, cy = cell[0], cell[1]
        inb = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        hit = occ[jnp.clip(cy, 0, H - 1), jnp.clip(cx, 0, W - 1)]
        return jnp.logical_not(jnp.where(inb, hit, True))

    return is_feasible
