"""Round-4 decisive sweep: pipelined per-row DMA gather vs XLA take, at
MODEL scale (ray-stage shapes), with the r3/r4 probe pathologies fixed.

What was wrong before (r3 sweep + first r4 attempt):
  * the index array rode in via PrefetchScalarGridSpec scalar-prefetch,
    i.e. the WHOLE (Q,) int32 array in SMEM — Q >= 262144 exceeds the SMEM
    budget and the remote compile helper 500s. Fix: stream (BQ,) index
    blocks through a normal SMEM-blockspec input.
  * single-dispatch timing minus a 32 ms axon fetch constant — pure noise
    for 1-60 ms kernels. Fix: K repetitions inside ONE jit (fori_loop over
    a dynamic-slice-shifted index array so XLA can't CSE), one f32
    checksum out. The checksum is a FULL out.sum() on both paths so XLA
    cannot narrow the take to the handful of rows a partial checksum
    would read.
  * one backend wedge killed the rest of the sweep. Fix: every config runs
    in its own subprocess.

Workload: the ray stage of the flagship model — table R=1,387,029 rows
(21*257*257 corner bases) x 176 bf16 (8 corners x 22 ch, 352 B/row),
Q=4,194,304 queries/iteration, random + ray-coherent index streams.
take's measured coherent ceiling is ~10 ns/row => ~42 ms per iteration
here; the DMA path wins the round if it lands materially below that.

Run (TPU): python scripts/perf_r4_dma_scale.py            # full sweep
           python scripts/perf_r4_dma_scale.py --one take random
           python scripts/perf_r4_dma_scale.py --one dma8 coherent
"""
import subprocess
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

R = 21 * 257 * 257          # ray corner-table rows at flagship shapes
W = 256                     # 8 corners x 32 bf16 channels = 512 B/row:
                            # Mosaic requires DMA row slices lane-aligned
                            # (128 int32 lanes), i.e. the table_pad_channels
                            # C 22->32 padding the r3 take path measured
                            # neutral is REQUIRED here
Q = 1 << 22                 # ~4.2M queries (frame is ~5.8M)
K = 8                       # in-jit repetitions per timing
BQ = 2048                   # queries per pallas grid step
VARIANTS = ['take', 'dma4', 'dma8', 'dma16', 'dma32']
STREAMS = ['random', 'coherent']


def make_dma_gather(depth, dtype, w=None):
    """Pipelined per-row HBM->VMEM DMA gather.

    Mosaic rejects single-row slices of sub-32-bit HBM memrefs ("slice
    shape along dimension 0 must be aligned to tiling (8)" — bf16 rows are
    sublane-packed), so callers bitcast bf16 tables to int32 (W/2 lanes):
    same bytes, 32-bit tiling, (1, W) slices legal.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    w = W if w is None else w

    def kernel(idx_ref, tab_hbm, out_ref, sems):
        def get_dma(r):
            return pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[r], 1), :],
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
        num_scalar_prefetch=0,
        grid=(Q // BQ,),
        in_specs=[pl.BlockSpec((BQ,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BQ, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return pl.pallas_call(kernel, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((Q, w), dtype))


def run_one(variant, stream):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    table_bf16 = (jax.random.normal(key, (R, W), jnp.float32) * 0.1
                  ).astype(jnp.bfloat16)
    # int32 view of the bf16 rows (W/2 lanes) — see make_dma_gather
    table = jax.lax.bitcast_convert_type(
        table_bf16.reshape(R, W // 2, 2), jnp.int32)

    if stream == 'random':
        idx_big = jax.random.randint(jax.random.PRNGKey(1), (Q + K,), 0, R,
                                     jnp.int32)
    else:
        # ray-coherent: consecutive queries walk neighbouring table rows,
        # like samples along one ray (stride ~ one x-row of the table)
        base = (jnp.arange(Q + K, dtype=jnp.int32) * 7) % (R - 300)
        idx_big = base + (jnp.arange(Q + K, dtype=jnp.int32) % 300)

    if variant == 'take':
        gather = lambda i, t: jnp.take(t, i, axis=0)
    elif variant.startswith('dmau'):
        gather = make_dma_gather_unrolled(int(variant[4:]), jnp.int32, W // 2)
    else:
        gather = make_dma_gather(int(variant[3:]), jnp.int32, W // 2)

    # correctness vs take on the first 4096 rows (per stream variant)
    got = np.asarray(gather(idx_big[:Q], table)[:4096])
    want = np.asarray(jnp.take(table, idx_big[:4096], axis=0))
    ok = bool(np.array_equal(got, want))

    def loop(ib, t):
        def body(k, acc):
            idx = jax.lax.dynamic_slice(ib, (k,), (Q,))
            out = gather(idx, t)
            # int32 wrap-around checksum: full-read on both paths so XLA
            # cannot narrow the take to a slice of rows
            return acc + out.sum()
        return jax.lax.fori_loop(0, K, body, jnp.int32(0))

    f = jax.jit(loop)
    # fetch constant: same-structure jit doing ~nothing
    f0 = jax.jit(lambda ib, t: ib[0].astype(jnp.float32) + t[0, 0]
                 .astype(jnp.float32))
    float(f0(idx_big, table))  # compile
    ts0 = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f0(idx_big, table))
        ts0.append(time.perf_counter() - t0)
    fetch = min(ts0)

    float(f(idx_big, table))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(idx_big, table))
        ts.append(time.perf_counter() - t0)
    per_iter = (min(ts) - fetch) / K
    print(f'RESULT {variant:6s} {stream:9s}: {per_iter*1e3:8.2f} ms/iter '
          f'{per_iter/Q*1e9:6.2f} ns/row  '
          f'{"OK" if ok else "MISMATCH"}  (fetch {fetch*1e3:.1f} ms)',
          flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == '--one':
        run_one(sys.argv[2], sys.argv[3])
        return
    for variant in VARIANTS:
        for stream in STREAMS:
            p = subprocess.run(
                [sys.executable, __file__, '--one', variant, stream],
                capture_output=True, text=True, timeout=900)
            for line in p.stdout.splitlines():
                if line.startswith('RESULT'):
                    print(line, flush=True)
                    break
            else:
                err = (p.stderr or p.stdout).strip().replace('\n', ' ')[-300:]
                print(f'RESULT {variant:6s} {stream:9s}: FAILED rc={p.returncode} '
                      f'{err}', flush=True)




def make_dma_gather_unrolled(depth, dtype, w, unroll=4):
    """Same per-row DMA pipeline with the issue loop unrolled `unroll`x:
    bounds how much of the per-row cost is scalar LOOP overhead vs the
    irreducible descriptor+semaphore cost. depth must be a multiple of
    unroll and BQ a multiple of unroll."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, tab_hbm, out_ref, sems):
        def get_dma(r):
            return pltpu.make_async_copy(
                tab_hbm.at[pl.ds(idx_ref[r], 1), :],
                out_ref.at[pl.ds(r, 1), :],
                sems.at[r % depth])

        def warm(g, _):
            for u in range(unroll):
                get_dma(g * unroll + u).start()
            return 0
        jax.lax.fori_loop(0, depth // unroll, warm, 0)

        def body(g, _):
            r = g * unroll
            for u in range(unroll):
                get_dma(r + u).wait()

            @pl.when(r + depth < BQ)
            def _():
                for u in range(unroll):
                    get_dma(r + depth + u).start()
            return 0
        jax.lax.fori_loop(0, BQ // unroll, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Q // BQ,),
        in_specs=[pl.BlockSpec((BQ,), lambda i: (i,),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BQ, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return pl.pallas_call(kernel, grid_spec=gs,
                          out_shape=jax.ShapeDtypeStruct((Q, w), dtype))

if __name__ == '__main__':
    main()
