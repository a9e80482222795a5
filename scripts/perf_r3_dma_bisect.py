"""Bisect the perf_r3_dma_gather.py compile failure.

perf_r3_dma_control.py proved static- AND scalar-indexed block DMAs work on
this toolchain. The full row-gather kernel fails. Candidate culprits:
  1. per-row (1, W) DMAs with a dynamic DESTINATION offset (out_ref.at[ds(r,1)])
  2. the DEPTH-deep rolling window (sems.at[r % DEPTH], pl.when guard)
  3. reading idx_ref at a loop-carried traced position inside fori_loop

Kernels, in order of added machinery:
  S1: fori_loop of per-row DMAs, ONE semaphore, start+wait per iteration
  S2: + DEPTH semaphores and rolling-window pipelining (== failing kernel)

Each is also timed if it compiles (rate vs xla take at the same shapes).

Run (TPU): python scripts/perf_r3_dma_bisect.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, W = 16384, 128
    Q = 1 << 16     # small: rate is what matters; per-row DMA may be slow
    BQ = 2048
    DEPTH = 8

    table = jax.random.normal(jax.random.PRNGKey(0), (R, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (Q,), 0, R, jnp.int32)
    f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    ref = np.asarray(f_take(table, idx))

    def bench(f, args):
        for _ in range(2):
            np.asarray(f(*args).ravel()[:1])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(*args).ravel()[:1])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t = bench(f_take, (table, idx))
    print(f'xla take              : {t*1e3:7.2f} ms {t/Q*1e9:7.1f} ns/row',
          flush=True)

    def run(name, kernel, scratch):
        try:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Q // BQ,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec((BQ, W), lambda i, idx: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[scratch],
            )
            f = jax.jit(pl.pallas_call(
                kernel, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((Q, W), jnp.float32),
            ))
            got = np.asarray(f(idx, table))
            ok = np.allclose(got, ref, atol=1e-6)
            t = bench(f, (idx, table))
            print(f'{name:22s}: {t*1e3:7.2f} ms {t/Q*1e9:7.1f} ns/row  '
                  f'{"OK" if ok else "MISMATCH"}', flush=True)
        except Exception as e:
            print(f'{name:22s}: FAILED {type(e).__name__}: {str(e)[:200]}',
                  flush=True)

    # --- S1: one semaphore, serial start+wait ------------------------------
    def k_s1(idx_ref, tab_hbm, out_ref, sem):
        i = pl.program_id(0)
        base = i * BQ

        def body(r, _):
            dma = pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[base + r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sem)
            dma.start()
            dma.wait()
            return 0
        jax.lax.fori_loop(0, BQ, body, 0)

    run('S1 serial row DMA', k_s1, pltpu.SemaphoreType.DMA(()))

    # --- S2: DEPTH-deep rolling window (the failing kernel) ----------------
    def k_s2(idx_ref, tab_hbm, out_ref, sems):
        i = pl.program_id(0)
        base = i * BQ

        def get_dma(r):
            return pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[base + r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sems.at[r % DEPTH])

        def warm(r, _):
            get_dma(r).start()
            return 0
        jax.lax.fori_loop(0, DEPTH, warm, 0)

        def body(r, _):
            get_dma(r).wait()
            @pl.when(r + DEPTH < BQ)
            def _():
                get_dma(r + DEPTH).start()
            return 0
        jax.lax.fori_loop(0, BQ, body, 0)

    run('S2 pipelined row DMA', k_s2, pltpu.SemaphoreType.DMA((DEPTH,)))


if __name__ == '__main__':
    main()
