"""Batched Riccati / CARE / DARE solvers and LQR policy construction.

In the reference, solving the continuous algebraic Riccati equation is the
*user's* job: the demos call ``scipy.linalg.solve_continuous_are`` and hand the
resulting ``(S, K)`` to the planner via the ``lqr(x, u)`` callback
(SURVEY.md section 0 and C5).  On TPU we promote the Riccati solve to a
first-class, batched, jit-able framework component so that re-linearized LQR
policies can be computed for thousands of tree nodes per expansion round
(BASELINE.json north_star: "solves the per-node LQR (CARE/Riccati iteration)
... as vmapped kernels").

Algorithms (all fixed iteration count -> static shapes, safe under jit/vmap):

* ``solve_care`` - matrix sign-function iteration on the Hamiltonian matrix
  with determinant scaling.  Quadratically convergent; 2n x 2n inverses only
  (n <= 12 for every shipped model), trivially batched with vmap.
* ``solve_dare`` - structure-preserving doubling algorithm (SDA).
* ``care_lqr`` / ``dare_lqr`` - convenience wrappers returning ``(S, K)`` in
  the reference's lqr-callback format.
* ``linearize`` - continuous-time (A, B) Jacobians of a dynamics model at
  (x, u), via jax.jacfwd.
* ``make_constant_lqr`` / ``make_relinearized_lqr`` - factories producing the
  ``lqr(x, u) -> (S, K)`` user callback (SURVEY.md L0) either precomputed
  (LTI, like the reference demos) or re-solved at every node (nonlinear).
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# Quadratic convergence reaches fp32 machine-eps in ~8-12 iterations with
# determinant scaling; 16 keeps margin for stiff systems while halving the
# cost of the occasional pessimized-executable compiler draw this program
# can hit on the axon backend (observed: the same HLO nondeterministically
# compiles to a ~400 ms or ~0.05 ms executable at batch 1024).
_SIGN_ITERS = 16


def _highest_precision(fn):
    """Run fn with full-fp32 matmuls.

    On TPU the default fp32 matmul uses bf16 MXU passes, which costs ~3 digits
    of accuracy — unacceptable inside a quadratically convergent Riccati
    iteration on tiny (<=24x24) matrices where the FLOPs are free anyway.
    """
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


def _matrix_sign(H: Array, iters: int = _SIGN_ITERS) -> Array:
    """Matrix sign function via scaled Newton iteration Z <- (cZ + (cZ)^-1)/2.

    Determinant scaling c = |det Z|^(-1/dim) accelerates early convergence.
    Fixed trip count keeps the loop jit-friendly (SURVEY.md section 7,
    "compiler-friendly control flow").
    """
    dim = H.shape[-1]

    def body(Z, _):
        sign, logdet = jnp.linalg.slogdet(Z)
        # |det Z|^(-1/dim); clamp to avoid inf/0 scale blowups on
        # near-singular iterates.
        c = jnp.exp(jnp.clip(-logdet / dim, -20.0, 20.0))
        cZ = c * Z
        Zn = 0.5 * (cZ + jnp.linalg.inv(cZ))
        return Zn, None

    Z, _ = jax.lax.scan(body, H, None, length=iters)
    return Z


@_highest_precision
def solve_care(A: Array, B: Array, Q: Array, R: Array) -> Array:
    """Solve A'P + PA - P B R^-1 B' P + Q = 0 for the stabilizing P.

    Matrix-sign method: build the Hamiltonian H = [[A, -G], [-Q, -A']] with
    G = B R^-1 B'; the stable invariant subspace of H is the graph of P, and
    sign(H) acts as -I on it.  Writing sign(H) = [[S11, S12], [S21, S22]],
    every stable vector [x; Px] satisfies (S11 + I) x + S12 P x = 0 and
    S21 x + (S22 + I) P x = 0, so P solves the stacked least-squares system
    [S12; S22 + I] P = -[S11 + I; S21].

    Batched over leading axes with vmap.  Replaces the reference demos' use of
    scipy.linalg.solve_continuous_are (SURVEY.md section 0).
    """
    n = A.shape[-1]
    G = B @ jnp.linalg.solve(R, B.T)
    H = jnp.block([[A, -G], [-Q, -A.T]])
    S = _matrix_sign(H)
    S11, S12 = S[:n, :n], S[:n, n:]
    S21, S22 = S[n:, :n], S[n:, n:]
    I = jnp.eye(n, dtype=A.dtype)
    M = jnp.concatenate([S12, S22 + I], axis=0)         # (2n, n)
    rhs = -jnp.concatenate([S11 + I, S21], axis=0)      # (2n, n)
    # Normal equations: M is well-conditioned for stabilizable/detectable
    # systems, and n is tiny, so this is both fast and accurate enough.
    P = jnp.linalg.solve(M.T @ M, M.T @ rhs)
    return 0.5 * (P + P.T)  # symmetrize


_DOUBLING_ITERS = 30


@_highest_precision
def solve_dare(A: Array, B: Array, Q: Array, R: Array) -> Array:
    """Solve A'PA - P - A'PB (R + B'PB)^-1 B'PA + Q = 0 (discrete CARE).

    Structure-preserving doubling algorithm (SDA):
        A_{k+1} = A_k (I + G_k H_k)^-1 A_k
        G_{k+1} = G_k + A_k (I + G_k H_k)^-1 G_k A_k'
        H_{k+1} = H_k + A_k' H_k (I + G_k H_k)^-1 A_k
    with A_0 = A, G_0 = B R^-1 B', H_0 = Q; H_k -> P quadratically.
    """
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    G0 = B @ jnp.linalg.solve(R, B.T)

    def body(carry, _):
        Ak, Gk, Hk = carry
        W = jnp.linalg.inv(I + Gk @ Hk)
        An = Ak @ W @ Ak
        Gn = Gk + Ak @ W @ Gk @ Ak.T
        Hn = Hk + Ak.T @ Hk @ W @ Ak
        return (An, Gn, Hn), None

    (_, _, H), _ = jax.lax.scan(body, (A, G0, Q), None, length=_DOUBLING_ITERS)
    return 0.5 * (H + H.T)


def care_lqr(A: Array, B: Array, Q: Array, R: Array) -> Tuple[Array, Array]:
    """Continuous-time LQR: returns (S, K) with K = R^-1 B' S.

    Matches the (S, K) contract of the reference's lqr(x, u) callback
    (SURVEY.md section 0: "S = cost-to-go matrix, K = feedback gain").
    """
    S = solve_care(A, B, Q, R)
    K = jnp.linalg.solve(R, B.T @ S)
    return S, K


def dare_lqr(A: Array, B: Array, Q: Array, R: Array) -> Tuple[Array, Array]:
    """Discrete-time LQR: returns (S, K) with K = (R + B'SB)^-1 B'SA."""
    S = solve_dare(A, B, Q, R)
    K = jnp.linalg.solve(R + B.T @ S @ B, B.T @ S @ A)
    return S, K


def linearize(f: Callable, x: Array, u: Array) -> Tuple[Array, Array]:
    """Continuous-time Jacobians A = df/dx, B = df/du at (x, u)."""
    A = jax.jacfwd(f, argnums=0)(x, u)
    B = jax.jacfwd(f, argnums=1)(x, u)
    return A, B


def _cpu_device():
    """CPU device for eager setup-time solves, or None if unavailable.

    Eagerly executing the sign iteration on a TPU backend dispatches ~60 tiny
    LU/inverse kernels one by one — tens of seconds of compile+dispatch for a
    6x6 problem.  Setup-time CARE is host-side work; run it on the CPU
    backend and let jit move the resulting (S, K) constants to the TPU.
    """
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def care_lqr_host(A, B, Q, R) -> Tuple[Array, Array]:
    """Eager (setup-time) CARE + gain on the CPU backend.

    Inputs stay host numpy until inside the CPU-device scope: a jnp.asarray
    outside it would commit each operand to the DEFAULT backend (a remotely
    attached TPU pays a tunnel round trip per put, and the CPU jit then pays
    cross-backend device-to-host transfers to get them back — observed as
    minutes of setup time on slow tunnels).
    """
    import numpy as _np
    dev = _cpu_device()
    args = [_np.asarray(x, _np.float32) for x in (A, B, Q, R)]
    if dev is None:
        return care_lqr(*[jnp.asarray(a) for a in args])
    with jax.default_device(dev):
        S, K = jax.jit(care_lqr)(*args)
        return jax.device_get(S), jax.device_get(K)


def lqr_setup(f: Callable, x_eq, u_eq, Q, R) -> Tuple[Array, Array]:
    """Setup-time linearize + CARE + gain, compiled as ONE program on CPU.

    Eager jacfwd + sign iteration would dispatch hundreds of tiny ops; over a
    remote TPU attachment each eager op can pay a fresh executable compile,
    turning a 6x6 setup solve into minutes.  One jitted CPU program avoids
    the whole class of problem.
    """
    import numpy as _np
    dev = _cpu_device()
    # numpy args: committing operands to a remote default backend here costs
    # tunnel round trips plus cross-backend transfers (see care_lqr_host)
    args = [_np.asarray(v, _np.float32) for v in (x_eq, u_eq, Q, R)]

    def prog(x, u, Q, R):
        A, B = linearize(f, x, u)
        return care_lqr(A, B, Q, R)

    if dev is None:
        return prog(*[jnp.asarray(a) for a in args])
    with jax.default_device(dev):
        S, K = jax.jit(prog)(*args)
        return jax.device_get(S), jax.device_get(K)


def make_constant_lqr(A: Array, B: Array, Q: Array, R: Array) -> Callable:
    """Precompute one (S, K) and return an lqr(x, u) callback that serves it.

    This is the LTI pattern of the reference demos: CARE solved once up front,
    every node shares the same policy (SURVEY.md D1/D3 notes).
    """
    S, K = care_lqr_host(A, B, Q, R)
    S, K = jnp.asarray(S), jnp.asarray(K)

    def lqr(x, u):
        del x, u
        return S, K

    return lqr


def make_relinearized_lqr(f: Callable, Q: Array, R: Array,
                          u_eq: Array | None = None,
                          x_map: Callable | None = None) -> Callable:
    """Return an lqr(x, u) callback that re-linearizes f and re-solves CARE.

    Fully traceable, so the planner can vmap it over every freshly committed
    node in an expansion round (the "batched Riccati" component of
    BASELINE.json's north star).  ``u_eq`` optionally fixes the control
    linearization point (e.g. hover thrust for the quadrotor).

    ``x_map`` optionally transforms the state into the linearization *point*
    (e.g. flooring a speed so a kinematic car stays stabilizable at rest).
    Crucially the map is applied outside the differentiation — the Jacobians
    are taken of f itself at x_map(x), so no couplings are zeroed out the way
    a clamp inside f would zero them.
    """
    Q = jnp.asarray(Q, jnp.float32)
    R = jnp.asarray(R, jnp.float32)

    def lqr(x, u):
        xlin = x if x_map is None else x_map(x)
        ulin = u if u_eq is None else jnp.asarray(u_eq, jnp.float32)
        A, B = linearize(f, xlin, ulin)
        return care_lqr(A, B, Q, R)

    return lqr
