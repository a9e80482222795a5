"""fp8/int8 gather-table microbenchmark (round-3 plan 1a / VERDICT r2 #2).

The inference frame is gather-bound: the ray sampler and the lift both do
one row-gather per query from corner-block tables (bf16 rows of
8*C channels). If XLA's take rate on TPU is BYTE-bound, storing the table
in 1-byte elements (fp8_e4m3 or int8+scale) halves the gathered bytes; if
it is ROW-latency-bound, narrower rows buy nothing. This measures the raw
take rate at the flagship ray-table shape for bf16 / fp8 / int8 / fp32
tables, plus the dequant+weighted-sum epilogue, so the decision is made on
data before touching the model path.

Run: python scripts/perf_r3_fp8_gather.py  (real TPU)
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, *args, iters=8, warmup=2):
    import jax
    for _ in range(warmup):
        np.asarray(jax.tree.leaves(fn(*args))[0].ravel()[:1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp

    # flagship ray-table shape: seg grid 20x256x256 -> (21*257*257) rows,
    # 8 corners x C=20 fused channels
    rows_n = 21 * 257 * 257
    C = 20
    width = 8 * C
    # one ET pass at the flagship shape: ~67k rays x 12-sample chunk
    nq = 67584 * 12

    rng = np.random.default_rng(0)
    table_f32 = rng.standard_normal((rows_n, width), dtype=np.float32)
    rows = rng.integers(0, rows_n, size=(nq,)).astype(np.int32)
    w8 = rng.random((nq, 8)).astype(np.float32)

    results = {}
    for name, dt in (('bf16', jnp.bfloat16), ('fp32', jnp.float32),
                     ('fp8_e4m3', jnp.float8_e4m3fn), ('int8', jnp.int8)):
        if dt == jnp.int8:
            scale = np.abs(table_f32).max() / 127.0
            tab = jnp.asarray(np.round(table_f32 / scale).astype(np.int8))
        else:
            tab = jnp.asarray(table_f32, dtype=dt)
        r = jnp.asarray(rows)
        w = jnp.asarray(w8)

        @jax.jit
        def gather_only(tab, r):
            return jnp.take(tab, r, axis=0)

        @jax.jit
        def gather_sum(tab, r, w):
            t = jnp.take(tab, r, axis=0).reshape(-1, 8, C)
            return jnp.sum(t.astype(jnp.float32) * w[:, :, None], axis=1)

        tg = timeit(gather_only, tab, r)
        ts = timeit(gather_sum, tab, r, w)
        bytes_g = nq * width * tab.dtype.itemsize
        results[name] = (tg, ts)
        print(f'{name:9s} gather {tg*1e3:7.2f} ms ({bytes_g/tg/1e9:6.1f} '
              f'GB/s)   gather+wsum {ts*1e3:7.2f} ms', flush=True)

    rel = results['fp8_e4m3'][1] / results['bf16'][1]
    print(f'\nfp8 gather+wsum vs bf16: {rel:.2f}x '
          f'({"byte-bound - fp8 pays" if rel < 0.8 else "row-latency-bound - fp8 does not pay"})')


if __name__ == '__main__':
    main()
