"""Interpret-mode equivalence of the fused Pallas rollout kernel vs the
lax.scan steer (ops/pallas/steer_kernel.py; hardware equivalence is gated in
bench.py like the NN kernels)."""
import numpy as np
import jax
import jax.numpy as jnp

from lqrrt_tpu.core.steer import make_steer
from lqrrt_tpu.ops.pallas.steer_kernel import make_steer_pallas


def _check(prob, H, B, Bt, key, with_goal=True, tol=0.05):
    kw = dict(saturate=prob.get("saturate"))
    if with_goal:
        kw["goal_buffer"] = prob["constraints"].goal_buffer
    mkargs = (prob["dynamics"], prob["erf"],
              prob["constraints"].is_feasible, H, prob["dt"], tol)
    ref = jax.jit(make_steer(*mkargs, layout="tm", **kw))
    pal = jax.jit(make_steer_pallas(*mkargs, batch_tile=Bt, interpret=True,
                                    **kw))
    n = prob["constraints"].nstates
    ss = jnp.asarray(prob["sample_space"])
    x0 = jax.random.uniform(key, (B, n), minval=-1.0, maxval=1.0)
    S0, K0 = prob["lqr"](jnp.zeros(n), jnp.zeros(
        prob["constraints"].ncontrols))
    Kb = jnp.tile(K0[None], (B, 1, 1))
    xtar = jax.random.uniform(jax.random.fold_in(key, 1), (B, n),
                              minval=ss[:, 0], maxval=ss[:, 1])
    goal = jnp.asarray(prob["goal"])
    args = (x0, Kb, xtar) + ((goal,) if with_goal else ())
    ra, rb = ref(*args), pal(*args)
    for f in ("mask", "length", "reached", "in_goal"):
        np.testing.assert_array_equal(np.asarray(getattr(ra, f)),
                                      np.asarray(getattr(rb, f)), err_msg=f)
    for f in ("x_seq", "u_seq", "xnew"):
        np.testing.assert_allclose(np.asarray(getattr(ra, f)),
                                   np.asarray(getattr(rb, f)),
                                   rtol=1e-5, atol=1e-4, err_msg=f)
    assert int(np.asarray(rb.length).max()) > 0   # something actually rolled


def test_pallas_steer_matches_scan_boat():
    from lqrrt_tpu.models import boat
    _check(boat.default_problem(), H=40, B=128, Bt=64,
           key=jax.random.PRNGKey(0))


def test_pallas_steer_matches_scan_boat_no_goal():
    from lqrrt_tpu.models import boat
    _check(boat.default_problem(), H=30, B=64, Bt=64,
           key=jax.random.PRNGKey(1), with_goal=False)


def test_pallas_steer_matches_scan_double_integrator():
    from lqrrt_tpu.models import double_integrator as di
    _check(di.default_problem(), H=50, B=64, Bt=32,
           key=jax.random.PRNGKey(2))


def test_pallas_steer_uneven_batch_falls_back_to_gcd_tile():
    """A batch not divisible by batch_tile silently uses the largest
    dividing tile (gcd) — the refine round's half batches and mesh local
    batches need not match the configured tile."""
    from lqrrt_tpu.models import boat
    prob = boat.default_problem()
    pal = jax.jit(make_steer_pallas(
        prob["dynamics"], prob["erf"], prob["constraints"].is_feasible,
        10, 0.05, 0.05, batch_tile=64, interpret=True))
    out = pal(jnp.zeros((96, 6)), jnp.zeros((96, 3, 6)),
              jnp.ones((96, 6)))
    assert out.x_seq.shape == (10, 6, 96)


def test_planner_e2e_with_forced_pallas_steer():
    """Full update_plan with steer_impl='pallas' (interpret mode on CPU):
    the kernel-backed round must plan end-to-end and reach the goal."""
    import lqrrt_tpu
    from lqrrt_tpu.models import double_integrator as di

    prob = di.default_problem()
    p = lqrrt_tpu.Planner(
        prob["dynamics"], prob["lqr"], prob["constraints"],
        horizon=prob["horizon"], dt=prob["dt"], goal0=prob["goal"],
        printing=False, batch_size=64, capacity=256, nn_block=128,
        saturate=prob["saturate"], seed=7, steer_impl="pallas")
    reached = p.update_plan(prob["x0"], prob["sample_space"], goal_bias=0.2,
                            pruning=False, specific_time=2.0)
    assert p.steer_selected == "pallas"
    assert reached
    e = np.abs(np.asarray(prob["goal"]) - p.x_seq[-1])
    assert np.all(e <= np.asarray(prob["constraints"].goal_buffer) + 1e-5)


def test_pallas_tree_gather_steer_matches_scan():
    """make_steer_pallas_tree (in-kernel one-hot parent gather; whole tree
    buffers as operands) must match gathering outside + the scan steer."""
    from lqrrt_tpu.models import boat
    from lqrrt_tpu.ops.pallas.steer_kernel import make_steer_pallas_tree

    prob = boat.default_problem()
    H, N, B = 30, 256, 64
    kw = dict(saturate=prob["saturate"],
              goal_buffer=prob["constraints"].goal_buffer)
    mkargs = (prob["dynamics"], prob["erf"],
              prob["constraints"].is_feasible, H, 0.05, 0.05)
    ref = jax.jit(make_steer(*mkargs, layout="tm", **kw))
    tre = jax.jit(make_steer_pallas_tree(*mkargs, batch_tile=32,
                                         node_block=64, interpret=True,
                                         **kw))
    key = jax.random.PRNGKey(0)
    states = jax.random.uniform(key, (N, 6), minval=-2, maxval=2)
    _, K0 = prob["lqr"](None, None)
    Ks = jnp.tile(K0[None], (N, 1, 1)) * (
        1 + 0.01 * jax.random.normal(key, (N, 1, 1)))
    pids = jax.random.randint(jax.random.fold_in(key, 1), (B,), 0, N)
    ss = jnp.asarray(prob["sample_space"])
    xtar = jax.random.uniform(jax.random.fold_in(key, 2), (B, 6),
                              minval=ss[:, 0], maxval=ss[:, 1])
    goal = jnp.asarray(prob["goal"])
    ra = ref(states[pids], Ks[pids], xtar, goal)
    rb = tre(states, Ks, pids, xtar, goal)
    for f in ("mask", "length", "reached", "in_goal"):
        np.testing.assert_array_equal(np.asarray(getattr(ra, f)),
                                      np.asarray(getattr(rb, f)), err_msg=f)
    for f in ("x_seq", "u_seq", "xnew"):
        np.testing.assert_allclose(np.asarray(getattr(ra, f)),
                                   np.asarray(getattr(rb, f)),
                                   rtol=1e-5, atol=1e-4, err_msg=f)
