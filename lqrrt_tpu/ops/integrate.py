"""Fixed-step ODE integrators for dynamics rollouts.

The reference integrates dynamics with a user-supplied discrete step
``xnext = dynamics(x, u, dt)`` (SURVEY.md C5, lqrrt/planner.py ~L340-420).
Here we provide the standard explicit integrators used to *build* such a
discrete step from a continuous-time model ``f(x, u) -> xdot``, so that model
definitions stay in continuous time (which is also what the CARE-based LQR
needs for linearization).

Everything is pure JAX and safe under jit / vmap / scan.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def euler_step(f: Dynamics, x: jnp.ndarray, u: jnp.ndarray, dt) -> jnp.ndarray:
    """One explicit-Euler step of ``xdot = f(x, u)``."""
    return x + dt * f(x, u)


def rk4_step(f: Dynamics, x: jnp.ndarray, u: jnp.ndarray, dt) -> jnp.ndarray:
    """One classic Runge-Kutta-4 step of ``xdot = f(x, u)`` (zero-order-hold u)."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def discretize(f: Dynamics, method: str = "rk4") -> Callable:
    """Build a discrete step ``dynamics(x, u, dt) -> xnext`` from continuous f.

    The returned callable has the reference's dynamics signature
    (SURVEY.md L0 user callbacks) and is jit/vmap-safe.
    """
    if method == "euler":
        return lambda x, u, dt: euler_step(f, x, u, dt)
    if method == "rk4":
        return lambda x, u, dt: rk4_step(f, x, u, dt)
    raise ValueError(f"unknown integrator {method!r}")
