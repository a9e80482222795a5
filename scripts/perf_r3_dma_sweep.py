"""SUPERSEDED by scripts/perf_r4_dma_scale.py (r4): this sweep's
single-dispatch fetch-corrected timings are noise for ~1 ms kernels, and its
scalar-prefetch index transport caps Q at the SMEM budget.

Scaled, fetch-corrected sweep of the pipelined row-DMA gather that
perf_r3_dma_bisect.py proved functional (the first working non-take gather
on this toolchain).

Questions:
  - sustained ns/row at model-scale Q (1M+) for random vs sorted vs
    coherent-stream indices (the model's regime is near-coherent);
  - DMA window depth sweep (8/16/32);
  - row dtype/width: f32 W=128 (512 B) vs bf16 W=176 (352 B — the flagship
    fused corner-block row is 8 corners x 22 ch);
  - vs XLA take at identical shapes, all with a single 1-element fetch so
    the ~25 ms axon fetch cancels in comparisons.

Run (TPU): python scripts/perf_r3_dma_sweep.py
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def bench(f, args, iters=5):
    import jax
    for _ in range(2):
        np.asarray(jax.tree.leaves(f(*args))[0].ravel()[:1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(f(*args))[0].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_dma_gather(Q, BQ, W, depth, dtype):
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.numpy as jnp

    def kernel(idx_ref, tab_hbm, out_ref, sems):
        i = pl.program_id(0)
        base = i * BQ

        def get_dma(r):
            return pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[base + r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sems.at[r % depth])

        def warm(r, _):
            get_dma(r).start()
            return 0
        jax.lax.fori_loop(0, depth, warm, 0)

        def body(r, _):
            get_dma(r).wait()
            @pl.when(r + depth < BQ)
            def _():
                get_dma(r + depth).start()
            return 0
        jax.lax.fori_loop(0, BQ, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // BQ,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((BQ, W), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return jax.jit(pl.pallas_call(
        kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((Q, W), dtype),
    ))


def main():
    import jax
    import jax.numpy as jnp

    Q = 1 << 20

    for (W, dtype, tag) in ((128, jnp.float32, 'f32 w128 512B'),
                            (176, jnp.bfloat16, 'bf16 w176 352B')):
        R = 1 << 16
        table = jax.random.normal(
            jax.random.PRNGKey(0), (R, W), jnp.float32).astype(dtype)
        idx_rand = jax.random.randint(
            jax.random.PRNGKey(1), (Q,), 0, R, jnp.int32)
        idx_sort = jnp.sort(idx_rand)
        # coherent stream: consecutive queries hit consecutive rows (the
        # ray-major regime), wrapping through the table.
        idx_coh = (jnp.arange(Q, dtype=jnp.int32) * R // Q)

        f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        print(f'--- {tag}  Q={Q}  R={R} ---', flush=True)
        for iname, ii in (('random', idx_rand), ('sorted', idx_sort),
                          ('coherent', idx_coh)):
            t = bench(f_take, (table, ii))
            print(f'  take {iname:9s}        : {t*1e3:8.2f} ms '
                  f'{t/Q*1e9:7.1f} ns/row', flush=True)

        for depth in (8, 16, 32):
            BQ = 4096
            try:
                f = make_dma_gather(Q, BQ, W, depth, dtype)
                for iname, ii in (('random', idx_rand), ('sorted', idx_sort),
                                  ('coherent', idx_coh)):
                    got = np.asarray(f(ii, table)[:256].astype(jnp.float32))
                    want = np.asarray(
                        f_take(table, ii[:256]).astype(jnp.float32))
                    ok = np.allclose(got, want, atol=1e-6)
                    t = bench(f, (ii, table))
                    print(f'  dma d={depth:2d} {iname:9s}     : '
                          f'{t*1e3:8.2f} ms {t/Q*1e9:7.1f} ns/row'
                          f'{"" if ok else "  MISMATCH"}', flush=True)
            except Exception as e:
                print(f'  dma d={depth:2d}: FAILED {type(e).__name__}: '
                      f'{str(e)[:160]}', flush=True)


if __name__ == '__main__':
    main()
