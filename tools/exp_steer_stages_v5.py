"""Round-5: WHERE does the rollout kernel's 22.5 ms go?  (The round-4
"0.07 ms standalone" was an async-harness artifact — the kernel is uniformly
~22.5 ms, ~60x its compute roofline.)

Times the same kernel scaffold (PrefetchScalarGridSpec, VMEM blocks, H-step
fori_loop with per-step ds stores) with progressively richer step bodies,
chained + fetch-synced.
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lqrrt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

from lqrrt_tpu.models import boat

H, n, m, B, Bt = 100, 6, 3, 8192, 512
prob = boat.default_problem()
dt = prob["dt"]
dynT = jax.vmap(lambda x, u: prob["dynamics"](x, u, dt),
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
    return pure, [np.asarray(c) for c in cs]


def build(body_fn, store=True, store_u=True):
    """body_fn(x, K, tar) traced on (n,Bt)/(m,n,Bt)/(n,Bt) -> (x_out, u)."""
    ex = (jnp.zeros((n, Bt)), jnp.zeros((m, n, Bt)), jnp.zeros((n, Bt)))
    pure, consts = hoist(body_fn, *ex)

    def kernel(s_ref, x0_ref, K_ref, tar_ref, xs_ref, us_ref, len_ref):
        del s_ref
        x0 = x0_ref[:]
        one = x0[0, 0] * 0.0 + 1.0

        def embed(arr):
            a = np.asarray(arr)
            flat = [jnp.float32(float(v)) * one
                    for v in a.astype(np.float64).ravel().tolist()]
            out = jnp.stack(flat).reshape(a.shape)
            if a.dtype == np.bool_:
                return out > 0.5
            return out.astype(jnp.asarray(a).dtype)

        cs = [embed(c) for c in consts]
        K_t = K_ref[:]
        tar_t = tar_ref[:]

        def step(h, carry):
            x, length = carry
            out = pure(x, K_t, tar_t, *cs)
            x_out, u = out
            if store:
                xs_ref[pl.ds(h, 1)] = x_out[None]
                if store_u:
                    us_ref[pl.ds(h, 1)] = u[None]
            return x_out, length + jnp.ones((1, Bt), jnp.int32)

        x, length = jax.lax.fori_loop(
            0, H, step, (x0, jnp.zeros((1, Bt), jnp.int32)))
        len_ref[:] = length
        if not store:
            xs_ref[pl.ds(0, 1)] = x[None]
            us_ref[pl.ds(0, 1)] = (x[:m] * 0.0)[None]

    nb = B // Bt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((n, Bt), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, n, Bt), lambda i, s: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, Bt), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((H, n, Bt), lambda i, s: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, m, Bt), lambda i, s: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bt), lambda i, s: (0, i),
                         memory_space=pltpu.VMEM),
        ),
    )

    def steer(x0T, KT, tarT):
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((H, n, B), jnp.float32),
                jax.ShapeDtypeStruct((H, m, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.int32),
            ))(jnp.zeros((1,), jnp.int32), x0T, KT, tarT)
    return steer


def bench(name, steer):
    key = jax.random.PRNGKey(0)
    x0T = jax.random.normal(key, (n, B))
    KT = jax.random.normal(jax.random.fold_in(key, 1), (m, n, B)) * 0.1
    tarT = jax.random.normal(jax.random.fold_in(key, 2), (n, B)) * 5.0

    def fn(state):
        x0T, tarT = state
        xs, us, ln = steer(x0T, KT, tarT)
        return xs[0] * 0.99 + x0T * 0.01, tarT + 1e-6

    jfn = jax.jit(fn, donate_argnums=0)
    try:
        st = (x0T, tarT)
        st = jfn(st)
        _ = jax.device_get(st[0].ravel()[0])
        outer = 50
        t0 = time.perf_counter()
        for _ in range(outer):
            st = jfn(st)
        _ = jax.device_get(st[0].ravel()[0])
        ms = (time.perf_counter() - t0) / outer * 1e3
        print(f"{name:24s}: {ms:8.3f} ms", flush=True)
    except Exception as e:
        print(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:150]}",
              flush=True)


# --- stage bodies ---
def s_identity(x, K, tar):
    return x * 1.000001, x[:m] * 0.5


def s_erf(x, K, tar):
    e = erfT(tar, x)
    return x + 0.001 * e, e[:m]


def s_matvec(x, K, tar):
    e = erfT(tar, x)
    u = K[:, 0, :] * e[0][None, :]
    for j in range(1, n):
        u = u + K[:, j, :] * e[j][None, :]
    return x + 0.001 * e, u


def s_sat(x, K, tar):
    e = erfT(tar, x)
    u = K[:, 0, :] * e[0][None, :]
    for j in range(1, n):
        u = u + K[:, j, :] * e[j][None, :]
    u = satT(u)
    return x + 0.001 * e, u


def s_dyn(x, K, tar):
    e = erfT(tar, x)
    u = K[:, 0, :] * e[0][None, :]
    for j in range(1, n):
        u = u + K[:, j, :] * e[j][None, :]
    u = satT(u)
    xn = dynT(x, u)
    return xn, u


def s_full(x, K, tar):
    e = erfT(tar, x)
    arrived = jnp.sum(e * e, axis=0, keepdims=True) <= 0.0025
    u = K[:, 0, :] * e[0][None, :]
    for j in range(1, n):
        u = u + K[:, j, :] * e[j][None, :]
    u = satT(u)
    xn = dynT(x, u)
    feas = feasT(xn, u)[None, :]
    ok = jnp.logical_and(feas, jnp.logical_not(arrived))
    return jnp.where(ok, xn, x), u


if __name__ == "__main__":
    bench("identity", build(s_identity))
    bench("identity_nostore", build(s_identity, store=False))
    bench("erf", build(s_erf))
    bench("matvec", build(s_matvec))
    bench("saturate", build(s_sat))
    bench("dynamics", build(s_dyn))
    bench("full", build(s_full))


# --- round-5b: bisect INSIDE dynamics ---
def s_sin(x, K, tar):
    return x + 0.001 * jnp.sin(x), x[:m] * 0.5


def s_sincos8(x, K, tar):
    acc = x
    for _ in range(4):
        acc = acc + 0.001 * jnp.sin(acc[2:3]) + 0.001 * jnp.cos(acc[2:3])
    return acc, x[:m] * 0.5


def _f_lin(xb, ub):
    # batched rows, no trig: kinematics with identity rotation
    nu = xb[3:]
    pdot = jnp.concatenate([nu[0:1], nu[1:2], nu[2:3]])
    drag = jnp.asarray([[30.], [60.], [60.]]) * nu
    nudot = jnp.asarray([[1/350.], [1/400.], [1/400.]]) * (ub - drag)
    return jnp.concatenate([pdot, nudot])


def s_rk4_lin(x, K, tar):
    u = x[:m] * 0.1

    def fl(xb):
        return _f_lin(xb, u)
    k1 = fl(x); k2 = fl(x + 0.025 * k1)
    k3 = fl(x + 0.025 * k2); k4 = fl(x + 0.05 * k3)
    return x + (0.05 / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), u


def s_euler_full(x, K, tar):
    u = x[:m] * 0.1
    fb = jax.vmap(lambda xx, uu: prob_f(xx, uu), in_axes=(-1, -1),
                  out_axes=-1)
    return x + 0.05 * fb(x, u), u


def s_rk4_trig_nostack(x, K, tar):
    # full trig + coriolis + quad drag, but assembled via concatenate of
    # row slices (no jnp.stack of scalars)
    u = x[:m] * 0.1

    def fb(xb):
        psi = xb[2:3]
        nu = xb[3:]
        c, s = jnp.cos(psi), jnp.sin(psi)
        pdot = jnp.concatenate([c * nu[0:1] - s * nu[1:2],
                                s * nu[0:1] + c * nu[1:2],
                                nu[2:3]])
        cor = jnp.concatenate([400.0 * nu[1:2] * nu[2:3],
                               -350.0 * nu[0:1] * nu[2:3],
                               -50.0 * nu[0:1] * nu[1:2]])
        drag = (jnp.asarray([[30.], [60.], [60.]]) * nu
                + jnp.asarray([[60.], [120.], [120.]]) * nu * jnp.abs(nu))
        nudot = jnp.asarray([[1/350.], [1/400.], [1/400.]]) * (u + cor - drag)
        return jnp.concatenate([pdot, nudot])

    k1 = fb(x); k2 = fb(x + 0.025 * k1)
    k3 = fb(x + 0.025 * k2); k4 = fb(x + 0.05 * k3)
    return x + (0.05 / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), u


if os.environ.get("STAGE2"):
    from lqrrt_tpu.models.boat import f as prob_f
    bench("sin_whole", build(s_sin))
    bench("sincos8_row", build(s_sincos8))
    bench("rk4_lin_rows", build(s_rk4_lin))
    bench("euler_full", build(s_euler_full))
    bench("rk4_trig_rows", build(s_rk4_trig_nostack))
