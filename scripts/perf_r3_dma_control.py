"""Control for perf_r3_dma_gather.py: is Pallas DMA machinery functional AT
ALL on this toolchain, or is the failure specific to scalar-indexed row DMAs?

Kernel A: static-sliced HBM->VMEM block DMA (no dynamic index anywhere).
Kernel B: same but the slice offset comes from a prefetched scalar (the one
thing the gather kernel needs).

Run (TPU): python scripts/perf_r3_dma_control.py
"""
import sys

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W, B = 4096, 128, 512
    table = jax.random.normal(jax.random.PRNGKey(0), (R, W), jnp.float32)

    # --- A: static-index block DMA ----------------------------------------
    def k_static(tab_hbm, out_ref, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            tab_hbm.at[pl.ds(i * B, B), :], out_ref, sem)
        dma.start()
        dma.wait()

    try:
        f = jax.jit(pl.pallas_call(
            k_static,
            grid=(R // B,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((B, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ))
        got = np.asarray(f(table))
        ok = np.allclose(got, np.asarray(table))
        print(f'A static-index block DMA : {"OK" if ok else "MISMATCH"}',
              flush=True)
    except Exception as e:
        print(f'A static-index block DMA : FAILED {type(e).__name__}: '
              f'{str(e)[:200]}', flush=True)

    # --- B: scalar-prefetch-indexed block DMA ------------------------------
    perm = jax.random.permutation(jax.random.PRNGKey(1),
                                  R // B).astype(jnp.int32)

    def k_dyn(idx_ref, tab_hbm, out_ref, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            tab_hbm.at[pl.ds(idx_ref[i] * B, B), :], out_ref, sem)
        dma.start()
        dma.wait()

    try:
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // B,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((B, W), lambda i, idx: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )
        f = jax.jit(pl.pallas_call(
            k_dyn, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((R, W), jnp.float32),
        ))
        got = np.asarray(f(perm, table))
        want = np.asarray(table).reshape(R // B, B, W)[np.asarray(perm)]
        ok = np.allclose(got, want.reshape(R, W))
        print(f'B scalar-indexed block DMA: {"OK" if ok else "MISMATCH"}',
              flush=True)
    except Exception as e:
        print(f'B scalar-indexed block DMA: FAILED {type(e).__name__}: '
              f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()
