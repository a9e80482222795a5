"""Microbenchmark: Mosaic in-VMEM dynamic gather vs XLA take on TPU v5e.

Round-1 established XLA `jnp.take` runs at ~37-74M rows/s (row-latency-
bound; ~13GB/s at the ray-gather's 352B rows — 1.6% of v5e HBM bandwidth)
and Pallas per-row DMA at ~24M rows/s. The remaining route past the
row-rate wall is a VMEM-RESIDENT table gathered inside a kernel — IF Mosaic
can lower a vectorized gather at a useful rate.

Mosaic's dynamic gather is PER-LANE (take_along_axis semantics): for a
(R, W) table block, out[i, j] = tab[idx[i, j], j]. A row gather broadcasts
one index across all W lanes.

This script measures, in order:
  1. how much VMEM a kernel can actually hold (probe);
  2. XLA take baseline at the same shapes;
  3. in-VMEM per-lane gather (indices as 2D sublane blocks);
  4. one-hot matmul gather on the MXU (row-block accumulation).

MEASURED (TPU v5e, this toolchain) — in-VMEM gather is a DEAD END:
  * VMEM scratch probe: 120 MB allocates fine (so a 57 MB fused-volume
    table COULD be VMEM-resident);
  * per-lane tala gather: Mosaic rejects the (BQ//128,128)->(BQ,1)
    sublane->lane reshape (AssertionError at compile); the earlier 1D-index
    variant crashed on the sublane-axis gather itself;
  * one-hot MXU gather: backend compiler crash (HTTP 500 INTERNAL);
  * XLA take at these shapes: 27-30 M rows/s (W=128).
Three independent lowering attempts failed — XLA's take IS the gather
engine on this toolchain; optimization must reduce rows/bytes, not write a
faster kernel.

Run: python scripts/perf_vmem_gather.py
"""
import functools
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, args_list, iters=6, warmup=2):
    import jax
    for i in range(warmup):
        np.asarray(jax.tree.leaves(fn(*args_list[i % len(args_list)]))[0].ravel()[:1])
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

    # --- 1. VMEM capacity probe ------------------------------------------
    def probe(mb):
        rows = mb * 1024 * 1024 // (128 * 4)

        def k(x_ref, o_ref, scratch):
            scratch[0, :] = x_ref[0, :]
            o_ref[:] = scratch[0:8, :]

        try:
            f = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((rows, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=160 * 1024 * 1024),
            )
            np.asarray(jax.jit(f)(jnp.ones((8, 128), jnp.float32)))
            print(f'vmem probe {mb:4d} MB scratch: OK', flush=True)
            return True
        except Exception as e:
            print(f'vmem probe {mb:4d} MB scratch: FAIL '
                  f'{type(e).__name__}: {str(e)[:160]}', flush=True)
            return False

    for mb in (8, 16, 32, 64, 96, 120):
        if not probe(mb):
            break

    # --- shared shapes -----------------------------------------------------
    R = 16384            # table rows; f32 = 8MB, bf16 = 4MB VMEM
    W = 128              # row width (one lane tile)
    Q = 1 << 20          # queries
    BQ = 2048            # queries per grid step

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, W), jnp.float32)
    table_bf = table.astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (Q,), 0, R, jnp.int32)
    idx2d = idx.reshape(Q // 128, 128)          # (8,128)-tileable layout

    results = {}

    def rec(name, t):
        results[name] = t
        print(f'{name:28s}: {t*1e3:7.2f} ms  {Q/t/1e6:8.1f} M rows/s',
              flush=True)

    # --- 2. baseline: XLA take (table in HBM) -----------------------------
    f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    rec('xla take f32 w128',
        timeit(f_take, [(table, idx), (table, idx + 1), (table, idx + 2)]))
    rec('xla take bf16 w128',
        timeit(f_take, [(table_bf, idx), (table_bf, idx + 1),
                        (table_bf, idx + 2)]))

    # --- 3. pallas: per-lane dynamic gather (take_along_axis) -------------
    # indices arrive as a (1, BQ) sublane-row block; broadcast across lanes
    # happens in-kernel after a transpose-free reshape.
    def gk_tala(tab_ref, idx_ref, out_ref):
        ids = idx_ref[:].reshape(BQ, 1)               # (BQ//128, 128)->(BQ, 1)
        ids = jnp.broadcast_to(ids, (BQ, W))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], ids, axis=0)

    def run_tala(name, tab):
        fn = pl.pallas_call(
            gk_tala,
            grid=(Q // BQ,),
            in_specs=[
                pl.BlockSpec((R, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BQ // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BQ, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, W), tab.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )
        f = jax.jit(fn)
        try:
            t = timeit(f, [(tab, idx2d), (tab, idx2d + 1), (tab, idx2d + 2)])
            rec(name, t)
            # correctness spot check
            got = np.asarray(f(tab, idx2d))[:BQ]
            ref = np.asarray(f_take(tab, idx[:BQ]))
            print(f'{name:28s}: correctness '
                  f'{"OK" if np.allclose(ref, got, atol=1e-6) else "MISMATCH"}',
                  flush=True)
        except Exception as e:
            print(f'{name:28s}: FAILED {type(e).__name__}: {str(e)[:240]}',
                  flush=True)

    run_tala('pallas tala f32', table)
    run_tala('pallas tala bf16', table_bf)

    # --- 4. pallas: one-hot matmul gather (MXU) ----------------------------
    RB = 2048

    def gk_onehot(tab_ref, idx_ref, out_ref):
        j = pl.program_id(1)
        ids = jnp.broadcast_to(idx_ref[:].reshape(BQ, 1), (BQ, RB))
        local = ids - j * RB
        oh = (jax.lax.broadcasted_iota(jnp.int32, (BQ, RB), 1)
              == local).astype(jnp.bfloat16)
        part = jnp.dot(oh, tab_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _():
            out_ref[:] = part

        @pl.when(j != 0)
        def _():
            out_ref[:] = out_ref[:] + part

    def run_onehot(tab):
        fn = pl.pallas_call(
            gk_onehot,
            grid=(Q // BQ, R // RB),
            in_specs=[
                pl.BlockSpec((RB, W), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BQ // 128, 128), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BQ, W), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024),
        )
        f = jax.jit(fn)
        try:
            t = timeit(f, [(tab, idx2d), (tab, idx2d + 1), (tab, idx2d + 2)])
            rec('pallas onehot mm bf16', t)
            got = np.asarray(f(tab, idx2d))[:BQ]
            ref = np.asarray(f_take(table, idx[:BQ]))
            print(f'{"pallas onehot mm bf16":28s}: correctness '
                  f'{"OK" if np.allclose(ref, got, atol=0.02) else "MISMATCH"}',
                  flush=True)
        except Exception as e:
            print(f'pallas onehot mm bf16       : FAILED {type(e).__name__}: '
                  f'{str(e)[:240]}', flush=True)

    run_onehot(table_bf)


if __name__ == '__main__':
    main()
