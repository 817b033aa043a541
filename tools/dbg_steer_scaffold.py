"""Scaffold bisection: which kernel-structure element does Mosaic reject?"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
from jax.experimental import pallas as pl

H, n, B, Bt = 100, 6, 1024, 256


def attempt(name, kernel, in_specs, out_specs, out_shape, args):
    try:
        out = pl.pallas_call(kernel, grid=(B // Bt,), in_specs=in_specs,
                             out_specs=out_specs, out_shape=out_shape)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}")


x = jnp.ones((n, B))

# A: plain 2D copy
attempt("A 2d-copy",
        lambda xr, yr: yr.__setitem__(slice(None), xr[:] * 2.0),
        [pl.BlockSpec((n, Bt), lambda i: (0, i))],
        pl.BlockSpec((n, Bt), lambda i: (0, i)),
        jax.ShapeDtypeStruct((n, B), jnp.float32), (x,))

# B: 3D output, static full write
def kB(xr, yr):
    yr[:] = jnp.broadcast_to(xr[:][None], (H, n, Bt))
attempt("B 3d-static-write", kB,
        [pl.BlockSpec((n, Bt), lambda i: (0, i))],
        pl.BlockSpec((H, n, Bt), lambda i: (0, 0, i)),
        jax.ShapeDtypeStruct((H, n, B), jnp.float32), (x,))

# C: 3D output, fori_loop dynamic ds store
def kC(xr, yr):
    x0 = xr[:]

    def body(h, c):
        yr[pl.ds(h, 1)] = (c * 1.01)[None]
        return c * 1.01
    jax.lax.fori_loop(0, H, body, x0)
attempt("C fori-ds-store", kC,
        [pl.BlockSpec((n, Bt), lambda i: (0, i))],
        pl.BlockSpec((H, n, Bt), lambda i: (0, 0, i)),
        jax.ShapeDtypeStruct((H, n, B), jnp.float32), (x,))

# D: 1-D output block
def kD(xr, yr):
    yr[:] = jnp.sum(xr[:], axis=0)
attempt("D 1d-output", kD,
        [pl.BlockSpec((n, Bt), lambda i: (0, i))],
        pl.BlockSpec((Bt,), lambda i: (i,)),
        jax.ShapeDtypeStruct((B,), jnp.float32), (x,))

# E: 1-D int32 output + bool carry in fori
def kE(xr, yr):
    x0 = xr[:]

    def body(h, carry):
        c, done = carry
        done = done | (jnp.sum(c, axis=0) > 1e9)
        return c * 1.01, done
    _, done = jax.lax.fori_loop(
        0, H, body, (x0, jnp.zeros((Bt,), bool)))
    yr[:] = done.astype(jnp.int32)
attempt("E bool-carry-1d-int-out", kE,
        [pl.BlockSpec((n, Bt), lambda i: (0, i))],
        pl.BlockSpec((Bt,), lambda i: (i,)),
        jax.ShapeDtypeStruct((B,), jnp.int32), (x,))

# F: 1-D float input block (like the goal vector)
g = jnp.ones((n,))
def kF(gr, xr, yr):
    yr[:] = xr[:] + gr[:][:, None]
attempt("F 1d-input", kF,
        [pl.BlockSpec((n,), lambda i: (0,)),
         pl.BlockSpec((n, Bt), lambda i: (0, i))],
        pl.BlockSpec((n, Bt), lambda i: (0, i)),
        jax.ShapeDtypeStruct((n, B), jnp.float32), (g, x))

# G: 2-D replicated const input (like hoisted (7,2) centers)
c2 = jnp.ones((7, 2))
def kG(cr, xr, yr):
    yr[:] = xr[:] + jnp.sum(cr[:])
attempt("G 2d-const-input", kG,
        [pl.BlockSpec((7, 2), lambda i: (0, 0)),
         pl.BlockSpec((n, Bt), lambda i: (0, i))],
        pl.BlockSpec((n, Bt), lambda i: (0, i)),
        jax.ShapeDtypeStruct((n, B), jnp.float32), (c2, x))
