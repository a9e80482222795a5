"""Coherent row-gather rate vs row width (round-3 gather-wall probe).

perf_r3_fp8_gather.py showed the TPU row-gather is (a) insensitive to
element width (fp8 == bf16 == fp32 time per row at fixed channel count) and
(b) ~5x faster on coherent streams than on random rows. This sweep asks the
remaining question: at COHERENT access, is the per-row cost flat in row
BYTES (latency-bound => fat-row schemes that pack more cells per row would
pay ~linearly) or does it grow (bandwidth-bound => row count is not the
lever, byte count is)?

Rows are generated ray-style: sorted-ish indices with small strides, the
locality class the model actually produces. Widths bracket the shipped
tables: ray table 8*20ch bf16 = 320 B, lift table 8*(1+80)ch = varies.

Run: python scripts/perf_r3_rowwidth.py  (real TPU)
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

    rows_n = 21 * 257 * 257
    nq = 811008  # one flagship ET-pass worth of queries

    rng = np.random.default_rng(0)
    # coherent "ray-like" rows: blocks of 96 consecutive-ish rows with small
    # jitter, blocks themselves in sorted order (what the ray-major layout
    # feeds jnp.take)
    base = np.sort(rng.integers(0, rows_n - 128, size=(nq // 96,)))
    rows = (base[:, None] + rng.integers(0, 96, size=(nq // 96, 96))) \
        .reshape(-1).astype(np.int32)
    rows = np.clip(rows, 0, rows_n - 1)
    r = jnp.asarray(rows)

    print(f'{nq} coherent queries, {rows_n} rows')
    for width in (32, 80, 160, 320, 640, 1280):
        tab = jnp.asarray(
            rng.standard_normal((rows_n, width)).astype(np.float32),
            dtype=jnp.bfloat16)

        @jax.jit
        def gather_only(tab, r):
            return jnp.take(tab, r, axis=0)

        t = timeit(gather_only, tab, r)
        byts = nq * width * 2
        print(f'width {width:5d}ch ({width*2:5d} B/row): {t*1e3:7.2f} ms  '
              f'{nq/t/1e6:7.1f} Mrows/s  {byts/t/1e9:6.1f} GB/s', flush=True)


if __name__ == '__main__':
    main()
