"""Round-3 follow-up #2: the last untried gather lowering — manual row DMAs.

perf_vmem_gather.py and perf_r3_gather_layouts.py established that every
vector-gather lowering through Mosaic fails at compile (5 attempts), leaving
XLA's take as the only functioning gather engine (~10 ns/row coherent,
~240 ns/row random).  One mechanism remains: bypass the gather unit entirely
and issue per-row HBM->VMEM DMAs from inside a Pallas kernel, with the row
indices scalar-prefetched and a D-deep rolling window of outstanding copies
to hide per-DMA latency.

If the DMA engines sustain better than ~10 ns/row this would raise the
single-chip ceiling (ROUND3.md "where the ceiling sits"); if not, the
take-engine ceiling stands on hardware grounds (both engines measured).

Run (TPU): python scripts/perf_r3_dma_gather.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, args_list, iters=6, warmup=2):
    import jax
    for i in range(warmup):
        np.asarray(jax.tree.leaves(
            fn(*args_list[i % len(args_list)]))[0].ravel()[:1])
    ts = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 16384          # table rows
    W = 128            # f32 row = 512 B
    Q = 1 << 18        # 262k rows (small probe; rate is what matters)
    BQ = 2048
    DEPTH = 8          # outstanding DMAs

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (Q,), 0, R, jnp.int32)
    # Coherent variant: sorted indices (the model's ray-major streams are
    # near-sorted — this is the regime the model actually runs in).
    idx_sorted = jnp.sort(idx)

    f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    for name, ii in (('random', idx), ('sorted', idx_sorted)):
        t = timeit(f_take, [(table, ii), (table, (ii + 1) % R)])
        print(f'xla take {name:18s}: {t*1e3:7.2f} ms '
              f'{t/Q*1e9:7.2f} ns/row', flush=True)

    def dma_kernel(idx_ref, tab_hbm, out_ref, sems):
        i = pl.program_id(0)
        base = i * BQ

        def get_dma(r):
            return pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[base + r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sems.at[r % DEPTH],
            )

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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // BQ,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BQ, W), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((DEPTH,))],
    )
    f_dma = jax.jit(pl.pallas_call(
        dma_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    ))

    for name, ii in (('random', idx), ('sorted', idx_sorted)):
        try:
            got = np.asarray(f_dma(ii, table))
            ref = np.asarray(f_take(table, ii))
            ok = np.allclose(got, ref, atol=1e-6)
            t = timeit(f_dma, [(ii, table), (ii, table)])
            print(f'dma gather {name:16s}: {t*1e3:7.2f} ms '
                  f'{t/Q*1e9:7.2f} ns/row  correctness '
                  f'{"OK" if ok else "MISMATCH"}', flush=True)
        except Exception as e:
            print(f'dma gather {name:16s}: FAILED {type(e).__name__}: '
                  f'{str(e)[:300]}', flush=True)


if __name__ == '__main__':
    main()
