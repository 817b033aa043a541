"""Aliased block-column writer: dst[..., start:start+B] = src without the
full-buffer copy XLA's dynamic-update-slice pays.

On this backend a dus on a loop-carried buffer compiles to a copy of the
WHOLE destination (measured round 5: 0.35 ms for a 20 MB block into the
98 MB edge buffer — ~7x the write cost; scan ys stacking and top-level
donated dus are no better).  This kernel writes only the B columns through
``input_output_aliases``: the destination rides in as an ANY-space operand
(never read), each grid step writes one (.., LB) lane block at a
scalar-prefetched block offset, and all unwritten blocks keep the aliased
input's bytes.  Measured: 0.26 ms for the same write — the residual over
the ~0.05 ms roofline is the while-carry ping-pong this backend still
inserts, but the dus's extra copy pass is gone.

Constraint: ``start`` must be a multiple of ``lane_block`` (the caller
guarantees it via root padding — core/tree.init_tree(root_pad=...)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def block_column_write(dst, src, start, lane_block: int = 512,
                       interpret: bool = False):
    """dst[:, :, start:start+B] = src for 3-D (A, C, N) dst with (A, C, B)
    src, start a multiple of ``lane_block``; returns the updated buffer
    (aliased with ``dst``)."""
    A, C, N = dst.shape
    B = src.shape[-1]
    LB = int(lane_block)
    assert B % LB == 0 and N % LB == 0, (B, N, LB)
    nb = B // LB

    def kern(s_ref, src_ref, dst_in_ref, out_ref):
        del dst_in_ref
        out_ref[:] = src_ref[:]

    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((A, C, LB), lambda j, s: (0, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # aliased dst, unread
            ],
            out_specs=pl.BlockSpec((A, C, LB), lambda j, s: (0, 0, s[0] + j),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(dst.shape, dst.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )((jnp.asarray(start, jnp.int32) // LB).reshape(1), src, dst)
