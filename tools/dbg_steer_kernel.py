"""Bisect which part of the rollout kernel Mosaic rejects (remote_compile
returns an opaque HTTP 500).  Stages add one body feature at a time."""
import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from lqrrt_tpu.models import boat

H, n, m, B, Bt = 100, 6, 3, 1024, 256
prob = boat.default_problem()
dynT = jax.vmap(lambda x, u: prob["dynamics"](x, u, 0.05),
                in_axes=(-1, -1), out_axes=-1)
erfT = jax.vmap(prob["erf"], in_axes=(-1, -1), out_axes=-1)
feasT = jax.vmap(prob["constraints"].is_feasible, in_axes=(-1, -1))
satT = jax.vmap(prob["saturate"], in_axes=-1, out_axes=-1)


def hoist(fun, *ex):
    closed = jax.make_jaxpr(fun)(*ex)
    jaxpr, cs = closed.jaxpr, closed.consts
    n_args = len(ex)

    def pure(*ac):
        out = jax.core.eval_jaxpr(jaxpr, ac[n_args:], *ac[:n_args])
        return tuple(out) if len(out) > 1 else out[0]
    return pure, [jnp.asarray(c) for c in cs]


def run_stage(name, body_fn, n_extra_carry=0):
    """body_fn(x, K, tar) -> (x_out, aux...) traced; wrapped in the kernel
    scaffold: fori_loop over H, per-step store, 1-D outputs."""
    ex = (jnp.zeros((n, Bt)), jnp.zeros((m, n, Bt)), jnp.zeros((n, Bt)))
    pure, consts = hoist(body_fn, *ex)
    const_in = [jnp.atleast_1d(c).astype(
        jnp.int32 if c.dtype == jnp.bool_ else c.dtype) for c in consts]
    cdt = [c.dtype for c in consts]
    cshape = [jnp.asarray(c).shape for c in consts]

    def kernel(x0_ref, K_ref, tar_ref, *refs):
        cref = refs[:len(const_in)]
        xs_ref, len_ref = refs[len(const_in):]
        cs = [r[:].astype(d) if d == jnp.bool_ else r[:]
              for r, d in zip(cref, cdt)]
        cs = [c.reshape(s) for c, s in zip(cs, cshape)]
        x0 = x0_ref[:]
        K = K_ref[:]
        tar = tar_ref[:]

        def step(h, carry):
            x, length = carry
            out = pure(x, K, tar, *cs)
            x_out = out[0] if isinstance(out, tuple) else out
            inc = (out[1] if isinstance(out, tuple) and len(out) > 1
                   else jnp.ones((Bt,), jnp.int32))
            xs_ref[pl.ds(h, 1)] = x_out[None]
            return x_out, length + inc

        x, length = jax.lax.fori_loop(
            0, H, step, (x0, jnp.zeros((Bt,), jnp.int32)))
        len_ref[:] = length

    try:
        out = pl.pallas_call(
            kernel,
            grid=(B // Bt,),
            in_specs=[
                pl.BlockSpec((n, Bt), lambda i: (0, i)),
                pl.BlockSpec((m, n, Bt), lambda i: (0, 0, i)),
                pl.BlockSpec((n, Bt), lambda i: (0, i)),
            ] + [pl.BlockSpec(c.shape, functools.partial(
                lambda nd, i: (0,) * nd, c.ndim)) for c in const_in],
            out_specs=(
                pl.BlockSpec((H, n, Bt), lambda i: (0, 0, i)),
                pl.BlockSpec((Bt,), lambda i: (i,)),
            ),
            out_shape=(jax.ShapeDtypeStruct((H, n, B), jnp.float32),
                       jax.ShapeDtypeStruct((B,), jnp.int32)),
        )(jnp.ones((n, B)), jnp.ones((m, n, B)), jnp.ones((n, B)), *const_in)
        jax.block_until_ready(out)
        print(f"{name}: OK")
        return True
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return False


# stage 1: identity
run_stage("identity", lambda x, K, tar: x * 1.000001)
# stage 2: erf
run_stage("erf", lambda x, K, tar: x + 0.001 * erfT(tar, x))
# stage 3: K matvec
def s3(x, K, tar):
    e = erfT(tar, x)
    u = K[:, 0, :] * e[0][None]
    for j in range(1, n):
        u = u + K[:, j, :] * e[j][None]
    return x + 0.001 * u.sum(axis=0)[None]
run_stage("matvec", s3)
# stage 4: saturate + dynamics
def s4(x, K, tar):
    e = erfT(tar, x)
    u = K[:, 0, :] * e[0][None]
    for j in range(1, n):
        u = u + K[:, j, :] * e[j][None]
    return dynT(x, satT(u))
run_stage("dynamics", s4)
# stage 5: + feasibility verdict driving a select
def s5(x, K, tar):
    e = erfT(tar, x)
    u = K[:, 0, :] * e[0][None]
    for j in range(1, n):
        u = u + K[:, j, :] * e[j][None]
    xn = dynT(x, satT(u))
    feas = feasT(xn, u)
    return jnp.where(feas[None, :], xn, x), feas.astype(jnp.int32)
run_stage("feasibility", s5)
# stage 6: + norm convergence + goal box
gbuf = np.asarray(prob["constraints"].goal_buffer, np.float32)
erfgT = jax.vmap(prob["erf"], in_axes=(None, -1), out_axes=-1)
goal = np.asarray(prob["goal"], np.float32)
def s6(x, K, tar):
    e = erfT(tar, x)
    arrived = jnp.sum(e * e, axis=0) <= 0.0025
    u = K[:, 0, :] * e[0][None]
    for j in range(1, n):
        u = u + K[:, j, :] * e[j][None]
    xn = dynT(x, satT(u))
    feas = feasT(xn, u)
    hit = jnp.all(jnp.abs(erfgT(jnp.asarray(goal), xn)) <= gbuf[:, None],
                  axis=0)
    ok = feas & ~arrived & ~hit
    return jnp.where(ok[None, :], xn, x), ok.astype(jnp.int32)
run_stage("full", s6)
