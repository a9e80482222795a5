"""Pallas TPU kernel experiment: pipelined row-gather (NEGATIVE RESULT).

The fused-neighborhood sampler (core/sampling.py) reduces trilinear sampling
to ONE row-gather per query + a VPU reduction. This kernel explored replacing
XLA's gather with an explicit multi-buffered DMA pipeline
(PrefetchScalarGridSpec + grouped double buffering).

Measured on v5e (5.6M random 512B rows, bf16):
  * XLA `jnp.take`:              45M rows/s
  * this kernel (grouped DMAs):  24M rows/s (NGRP=8, G=16, BLK=2048)

The scalar-core DMA issue/wait loop is the bottleneck; XLA's native gather is
already near the achievable per-row rate on this hardware. Kept as a
documented experiment and as the scaffolding for future binned/slab designs
(which would amortize DMAs over many queries per volume tile).

Mosaic constraints learned (see git history for the debugging):
  * DMA slices of tiled dims must align to (sublane, 128); keep the
    dynamically-indexed dim leading and untiled: table (R, 2, ROWW//2) bf16;
  * dynamic single-row VMEM stores need sublane alignment — write in
    G-row groups at pl.multiple_of offsets;
  * scalar-prefetch operands live in SMEM (1MB) — chunk > ~200K indices.
"""
from __future__ import annotations

import functools

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
