"""Pallas fused NN kernel vs the jnp blocked-scan path (interpret mode).

The kernel's bilinear-feature matmul formulation and wrap-shift selection
must reproduce the LQR metric argmin of core.nearest exactly (up to fp
associativity); SURVEY.md section 4 test strategy: "argmin-NN vs brute
force".
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lqrrt_tpu.core.nearest import make_nearest
from lqrrt_tpu.ops.angles import make_erf
from lqrrt_tpu.ops.pallas.nn_kernel import nearest_pallas

N, n, B = 256, 6, 16


def _random_tree(seed, wrap_dim=None):
    rng = np.random.default_rng(seed)
    states = rng.uniform(-5, 5, (N, n)).astype(np.float32)
    if wrap_dim is not None:
        states[:, wrap_dim] = rng.uniform(-np.pi, np.pi, N)
    A = rng.normal(size=(N, n, n)).astype(np.float32)
    S = np.einsum("nij,nkj->nik", A, A) + 0.1 * np.eye(n, dtype=np.float32)
    xrand = rng.uniform(-5, 5, (B, n)).astype(np.float32)
    if wrap_dim is not None:
        xrand[:, wrap_dim] = rng.uniform(-np.pi, np.pi, B)
    return jnp.asarray(states), jnp.asarray(S), jnp.asarray(xrand)


@pytest.mark.parametrize("size", [1, 7, N])
def test_pallas_matches_jnp_affine(size):
    states, S, xrand = _random_tree(0)
    erf = make_erf(n)
    ids_ref, cost_ref = make_nearest(erf, block=64)(
        states, S, jnp.asarray(size), xrand)
    ids, cost = nearest_pallas(states, S, jnp.asarray(size), xrand,
                               block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(cost_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_pallas_matches_jnp_wrapped():
    states, S, xrand = _random_tree(1, wrap_dim=2)
    erf = make_erf(n, angle_dims=(2,))
    ids_ref, cost_ref = make_nearest(erf, block=64)(
        states, S, jnp.asarray(N), xrand)
    ids, cost = nearest_pallas(states, S, jnp.asarray(N), xrand,
                               block=64, wrap_dim=2, interpret=True)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(cost_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_wrap_selection_prefers_short_way_around():
    """A node just across the -pi/pi seam must be 'near' under the metric."""
    states = np.zeros((8, n), np.float32)
    states[0, 2] = np.pi - 0.05          # just below the seam
    states[1, 2] = 1.0                   # far in angle
    S = np.tile(np.eye(n, dtype=np.float32), (8, 1, 1))
    xrand = np.zeros((8, n), np.float32)
    xrand[:, 2] = -np.pi + 0.05          # just above the seam
    ids, cost = nearest_pallas(jnp.asarray(states), jnp.asarray(S),
                               jnp.asarray(2), jnp.asarray(xrand),
                               block=8, wrap_dim=2, interpret=True)
    assert int(ids[0]) == 0              # 0.1 rad around the seam beats 1 rad
    np.testing.assert_allclose(float(cost[0]), 0.1 ** 2, rtol=1e-3)


def test_planner_pallas_impl_runs_end_to_end():
    """nn_impl='pallas' (interpret on CPU) plans the double integrator."""
    from lqrrt_tpu.models import double_integrator as di
    import lqrrt_tpu

    prob = di.default_problem()
    planner = lqrrt_tpu.Planner(
        prob["dynamics"], prob["lqr"], prob["constraints"],
        horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
        printing=False, batch_size=32, capacity=512, nn_block=128,
        saturate=prob.get("saturate"), nn_impl="pallas", seed=3)
    # generous budget: planning ends deterministically at the capacity cap
    reached = planner.update_plan(prob["x0"], prob["sample_space"],
                                  goal_bias=0.2, specific_time=60.0)
    assert reached
    assert planner.x_seq.shape[1] == prob["constraints"].nstates


def _const_S_tree(seed, wrap_dim=None):
    rng = np.random.default_rng(seed)
    states = rng.uniform(-5, 5, (N, n)).astype(np.float32)
    A = rng.normal(size=(n, n)).astype(np.float32)
    S1 = (A @ A.T + 0.1 * np.eye(n)).astype(np.float32)
    S = np.tile(S1, (N, 1, 1))
    xrand = rng.uniform(-5, 5, (B, n)).astype(np.float32)
    if wrap_dim is not None:
        states[:, wrap_dim] = rng.uniform(-np.pi, np.pi, N)
        xrand[:, wrap_dim] = rng.uniform(-np.pi, np.pi, B)
    return jnp.asarray(states), jnp.asarray(S), jnp.asarray(xrand)


@pytest.mark.parametrize("size", [1, 7, N])
@pytest.mark.parametrize("wrap_dim", [None, 2])
def test_pallas_const_matches_jnp(size, wrap_dim):
    """The constant-S whitened-distance kernel vs the general jnp path."""
    from lqrrt_tpu.ops.pallas.nn_kernel import nearest_const_pallas

    states, S, xrand = _const_S_tree(7, wrap_dim=wrap_dim)
    erf = make_erf(n, angle_dims=(wrap_dim,) if wrap_dim is not None else ())
    ids_ref, cost_ref = make_nearest(erf, block=64)(
        states, S, jnp.asarray(size), xrand)
    ids, cost = nearest_const_pallas(states, S, jnp.asarray(size), xrand,
                                     block=64, wrap_dim=wrap_dim,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(cost_ref),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))


def test_pallas_const_wrap_seam():
    from lqrrt_tpu.ops.pallas.nn_kernel import nearest_const_pallas

    states = np.zeros((8, n), np.float32)
    states[0, 2] = np.pi - 0.05
    states[1, 2] = 1.0
    S = np.tile(np.eye(n, dtype=np.float32), (8, 1, 1))
    xrand = np.zeros((8, n), np.float32)
    xrand[:, 2] = -np.pi + 0.05
    ids, cost = nearest_const_pallas(jnp.asarray(states), jnp.asarray(S),
                                     jnp.asarray(2), jnp.asarray(xrand),
                                     block=8, wrap_dim=2, interpret=True)
    assert int(ids[0]) == 0
    np.testing.assert_allclose(float(cost[0]), 0.1 ** 2, rtol=1e-3)


def test_planner_autodetects_constant_lqr():
    """nn_impl='auto' probes the user lqr: constant -> const kernel; the
    re-linearized car lqr -> general kernel.  (Forced pallas on CPU via
    nn_impl strings keeps this test hardware-independent.)"""
    from lqrrt_tpu.models import car, double_integrator as di
    import lqrrt_tpu

    prob = di.default_problem()
    p1 = lqrrt_tpu.Planner(
        prob["dynamics"], prob["lqr"], prob["constraints"],
        horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
        printing=False, batch_size=32, capacity=512, nn_block=128,
        nn_impl="pallas_const", seed=5)
    reached = p1.update_plan(prob["x0"], prob["sample_space"],
                             goal_bias=0.2, specific_time=60.0)
    assert reached and p1.nn_selected == "pallas_const"
    assert p1._lqr_is_constant()

    cprob = car.default_problem()
    p2 = lqrrt_tpu.Planner(
        cprob["dynamics"], cprob["lqr"], cprob["constraints"],
        horizon=cprob["horizon"], dt=cprob["dt"], goal0=cprob["goal"],
        printing=False, batch_size=8, capacity=128, nn_block=128,
        wrap_dims=cprob["wrap_dims"], erf=cprob["erf"],
        saturate=cprob.get("saturate"), nn_impl="pallas", seed=5)
    assert not p2._lqr_is_constant()
    p2._nearest_override()
    assert p2.nn_selected == "pallas"


def test_pallas_multi_tile_candidates():
    """B > 1024 exercises the 2-D grid's candidate-tile axis (nb_B > 1)."""
    rng = np.random.default_rng(4)
    N2, B2 = 128, 2048
    states = jnp.asarray(rng.uniform(-3, 3, (N2, n)).astype(np.float32))
    A = rng.normal(size=(N2, n, n)).astype(np.float32)
    S = jnp.asarray(np.einsum("nij,nkj->nik", A, A)
                    + 0.1 * np.eye(n, dtype=np.float32))
    xr = jnp.asarray(rng.uniform(-3, 3, (B2, n)).astype(np.float32))
    erf = make_erf(n)
    ids_ref, cost_ref = make_nearest(erf, block=128)(
        states, S, jnp.asarray(100), xr)
    ids, cost = nearest_pallas(states, S, jnp.asarray(100), xr,
                               block=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_ref))
    np.testing.assert_allclose(np.asarray(cost), np.asarray(cost_ref),
                               rtol=1e-4, atol=1e-3)
