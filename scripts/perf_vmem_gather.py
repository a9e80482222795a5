"""Microbenchmark: Mosaic in-VMEM dynamic gather vs XLA take on TPU v5e.

Round-1 established XLA `jnp.take` runs at ~74M rows/s narrow (row-latency-
bound) and Pallas per-row DMA at ~24M rows/s. The remaining route past the
row-rate wall is a VMEM-RESIDENT table gathered inside a kernel — IF Mosaic
can lower a vectorized gather at a useful rate.

Mosaic's dynamic gather is PER-LANE (take_along_axis semantics): for a
(R, W) table block, out[i, j] = tab[idx[i, j], j]. A row gather broadcasts
one index across all W lanes.

Run: python scripts/perf_vmem_gather.py
"""
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

    R = 16384            # table rows; f32 table = R*W*4 = 8MB VMEM
    W = 128              # row width (one lane tile)
    Q = 1 << 20          # queries
    BQ = 2048            # queries per grid step

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, W), jnp.float32)
    table_bf = table.astype(jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (Q,), 0, R, jnp.int32)

    results = {}

    def rec(name, t):
        results[name] = t
        print(f'{name:28s}: {t*1e3:7.2f} ms  {Q/t/1e6:8.1f} M rows/s',
              flush=True)

    # --- baseline: XLA take (table in HBM) -------------------------------
    f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    rec('xla take f32 w128',
        timeit(f_take, [(table, idx), (table, idx + 1), (table, idx + 2)]))
    rec('xla take bf16 w128',
        timeit(f_take, [(table_bf, idx), (table_bf, idx + 1),
                        (table_bf, idx + 2)]))

    # --- pallas: per-lane dynamic gather (take_along_axis) ---------------
    def gk_tala(tab_ref, idx_ref, out_ref):
        ids = jnp.broadcast_to(idx_ref[:][:, None], (BQ, W))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], ids, axis=0)

    def run(name, kernel, tab, idx2d=False, out_dtype=None):
        ispec_idx = (pl.BlockSpec((BQ, W), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM) if idx2d else
                     pl.BlockSpec((BQ,), lambda i: (i,),
                                  memory_space=pltpu.VMEM))
        fn = pl.pallas_call(
            kernel,
            grid=(Q // BQ,),
            in_specs=[
                pl.BlockSpec((R, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                ispec_idx,
            ],
            out_specs=pl.BlockSpec((BQ, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, W), out_dtype or tab.dtype),
        )
        f = jax.jit(fn)
        ii = (jnp.broadcast_to(idx[:, None], (Q, W)).astype(jnp.int32)
              if idx2d else idx)
        try:
            t = timeit(f, [(tab, ii), (tab, ii + 1), (tab, ii + 2)])
            rec(name, t)
            return True
        except Exception as e:
            print(f'{name:28s}: FAILED {type(e).__name__}: {str(e)[:240]}',
                  flush=True)
            return False

    ok_tala = run('pallas tala f32 bcast', gk_tala, table)
    run('pallas tala bf16 bcast', gk_tala, table_bf)

    # 2D indices streamed from HBM (no in-kernel broadcast)
    def gk_tala2(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
    run('pallas tala f32 idx2d', gk_tala2, table, idx2d=True)

    # --- pallas: one-hot matmul gather (MXU) ------------------------------
    RB = 1024
    def gk_onehot(tab_ref, idx_ref, out_ref):
        j = pl.program_id(1)
        ids = idx_ref[:]
        local = ids - j * RB
        oh = (jax.lax.broadcasted_iota(jnp.int32, (BQ, RB), 1)
              == local[:, None]).astype(jnp.bfloat16)
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
                pl.BlockSpec((BQ,), lambda i, j: (i,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BQ, W), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Q, W), jnp.float32),
        )
        f = jax.jit(fn)
        try:
            t = timeit(f, [(tab, idx), (tab, idx + 1), (tab, idx + 2)])
            rec('pallas onehot mm bf16', t)
        except Exception as e:
            print(f'pallas onehot mm bf16      : FAILED {type(e).__name__}: '
                  f'{str(e)[:240]}', flush=True)
    run_onehot(table_bf)

    # --- correctness spot check -------------------------------------------
    if ok_tala:
        fn = pl.pallas_call(
            gk_tala,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((R, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BQ,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BQ, W), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((BQ, W), jnp.float32),
        )
        got = np.asarray(jax.jit(fn)(table, idx[:BQ]))
        ref = np.asarray(f_take(table, idx[:BQ]))
        print('tala correctness:', 'OK' if np.allclose(ref, got)
              else 'MISMATCH', flush=True)


if __name__ == '__main__':
    main()
