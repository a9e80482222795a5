"""Pallas TPU kernel: pipelined row-gather + trilinear reduction.

The fused-neighborhood sampler (core/sampling.py) reduced trilinear sampling
to ONE wide row-gather per query + a VPU reduction. XLA's gather sustains
~74M rows/s on v5e regardless of row width; this kernel replaces it with an
explicitly multi-buffered DMA pipeline (PrefetchScalarGridSpec: the row
indices are scalar-prefetched so each grid step can start the copies for the
next block while reducing the current one), and fuses the weighted reduction
so the wide gathered rows never round-trip through HBM.

Layout:
  table: (R, 4*D*C) in HBM (rows = 2x2 neighborhood x z column x channels)
  rows:  (P,) int32 row ids        (scalar-prefetched)
  wzc:   (P, 4*D) fp32 interpolation weights (w_y*w_x outer w_z)
  out:   (P, C) fp32

Grid: P / BLK queries per step; per step, BLK row-DMAs are issued in
NBUF-deep flights.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_reduce_kernel(D: int, C: int, BLK: int, NBUF: int,
                          rows_ref, wzc_ref, table_ref, out_ref,
                          scratch, sems):
    step = pl.program_id(0)
    base = step * BLK

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            table_ref.at[rows_ref[base + i]],
            scratch.at[slot],
            sems.at[slot],
        )

    # warm up the pipeline
    for i in range(min(NBUF, BLK)):
        get_dma(i, i).start()

    def body(i, _):
        slot = jax.lax.rem(i, NBUF)
        get_dma(slot, i).wait()
        row = scratch[slot].astype(jnp.float32)        # (4*D, C)
        w = wzc_ref[i, :]                              # (4*D,)
        out_ref[i, :] = jnp.sum(row * w[:, None], axis=0)
        nxt = i + NBUF

        @pl.when(nxt < BLK)
        def _():
            get_dma(slot, nxt).start()
        return 0

    jax.lax.fori_loop(0, BLK, body, 0)


def gather_reduce(table: jnp.ndarray, rows: jnp.ndarray, wzc: jnp.ndarray,
                  D: int, C: int, block: int = 1024,
                  nbuf: int = 16) -> jnp.ndarray:
    """out[p, c] = sum_k wzc[p, k] * table[rows[p]].reshape(4D, C)[k, c].

    table: (R, 4*D*C); rows: (P,) int32; wzc: (P, 4*D) fp32.
    P must be a multiple of `block` (pad beforehand).
    """
    P = rows.shape[0]
    assert P % block == 0, (P, block)
    R = table.shape[0]
    table3 = table.reshape(R, 4 * D, C)
    kernel = functools.partial(_gather_reduce_kernel, D, C, block, nbuf)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P // block,),
        in_specs=[
            pl.BlockSpec((block, 4 * D), lambda i, rows: (i, 0),
                         memory_space=pltpu.VMEM),      # wzc block
            pl.BlockSpec(memory_space=pltpu.ANY),       # table stays in HBM
        ],
        out_specs=pl.BlockSpec((block, C), lambda i, rows: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nbuf, 4 * D, C), table.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        grid_spec=grid_spec,
    )(rows.astype(jnp.int32), wzc.astype(jnp.float32), table3)
