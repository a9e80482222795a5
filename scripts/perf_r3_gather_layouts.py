"""Round-3 follow-up: two more Mosaic gather lowerings not tried by
perf_vmem_gather.py (whose three attempts all failed — see its docstring).

Hypotheses:
  A. the per-lane take_along_axis gather failed at the (BQ//128,128)->(BQ,1)
     sublane->lane RESHAPE, not the gather itself — feed the indices as a
     native (BQ, 1) sublane-major block so no reshape is needed;
  B. same, but indices as (BQ, 128) already broadcast on the host (trades
     128x index bytes for zero in-kernel layout work);
  C. dynamic-slice row loop: one (1, W) pl.load with a scalar index per
     row, 8 rows per sublane tile written together (no vector gather at
     all — tests Mosaic's scalar-indexed sublane dynamic slicing rate).

Baseline: XLA take at the same shapes.

Run (TPU): python scripts/perf_r3_gather_layouts.py
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

    R = 16384            # table rows (f32 W=128: 8 MB VMEM)
    W = 128
    Q = 1 << 20
    BQ = 2048

    table = jax.random.normal(jax.random.PRNGKey(0), (R, W), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (Q,), 0, R, jnp.int32)

    f_take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    t = timeit(f_take, [(table, idx), (table, idx + 1), (table, idx + 2)])
    print(f'{"xla take f32 w128":28s}: {t*1e3:7.2f} ms '
          f'{Q/t/1e6:8.1f} M rows/s', flush=True)
    ref = np.asarray(f_take(table, idx[:BQ]))

    def report(name, f, idx_arg):
        try:
            tt = timeit(f, [(table, idx_arg)])
            got = np.asarray(f(table, idx_arg))[:BQ]
            ok = np.allclose(ref, got, atol=1e-6)
            print(f'{name:28s}: {tt*1e3:7.2f} ms {Q/tt/1e6:8.1f} M rows/s  '
                  f'correctness {"OK" if ok else "MISMATCH"}', flush=True)
        except Exception as e:
            print(f'{name:28s}: FAILED {type(e).__name__}: {str(e)[:240]}',
                  flush=True)

    # --- A: indices as native (BQ, 1) lane-minor blocks --------------------
    def gk_col(tab_ref, idx_ref, out_ref):
        ids = jnp.broadcast_to(idx_ref[:], (BQ, W))
        out_ref[:] = jnp.take_along_axis(tab_ref[:], ids, axis=0)

    f_col = jax.jit(pl.pallas_call(
        gk_col,
        grid=(Q // BQ,),
        in_specs=[
            pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    ))
    report('pallas tala (BQ,1) idx', lambda t, i: f_col(t, i),
           idx.reshape(Q, 1))

    # --- B: indices pre-broadcast to (BQ, W) on the host/XLA side ----------
    def gk_full(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    f_full = jax.jit(pl.pallas_call(
        gk_full,
        grid=(Q // BQ,),
        in_specs=[
            pl.BlockSpec((R, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Q, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=160 * 1024 * 1024),
    ))
    idx_bcast = jnp.broadcast_to(idx[:, None], (Q, W))
    report('pallas tala (BQ,W) idx', lambda t, i: f_full(t, i), idx_bcast)

    # --- C: scalar-indexed dynamic-slice row loop ---------------------------
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // BQ,),
        in_specs=[
            pl.BlockSpec((R, W), lambda i, idx: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BQ, W), lambda i, idx: (i, 0),
                               memory_space=pltpu.VMEM),
    )

    def gk_loop2(idx_ref, tab_ref, out_ref):
        i = pl.program_id(0)
        def body(r, _):
            out_ref[pl.ds(r, 1), :] = tab_ref[pl.ds(idx_ref[i * BQ + r], 1), :]
            return 0
        jax.lax.fori_loop(0, BQ, body, 0)

    f_loop = jax.jit(pl.pallas_call(
        gk_loop2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    ))
    report('pallas ds-loop scalar idx', lambda t, i: f_loop(i, t), idx)


if __name__ == '__main__':
    main()
