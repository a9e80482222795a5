"""Round-3 microbenchmarks informing the inference-perf attack.

Questions:
  1. Does an fp8 corner table gather faster than bf16 at the ray-gather
     shapes (5.8M rows x 8*22 values)? (byte-bound vs row-latency-bound)
  2. Does row count scale linearly (so early termination's row reduction
     translates to time)?
  3. How fast is minor-axis take_along_axis (the building block of a
     shear-decomposed frustum warp)?

Run: python scripts/perf_r3_micro.py
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
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    key = jax.random.PRNGKey(0)
    TAB_ROWS = 21 * 257 * 257      # (D+1)(H+1)(W+1) of the fused volume
    C = 22                          # 1 + 18 + 3
    W8 = 8 * C                      # 176 values/row
    R = 5_800_000 // 65536 * 65536  # ~5.77M queries, chunk-aligned

    rows_idx = jax.random.randint(key, (R,), 0, TAB_ROWS, jnp.int32)
    w8 = jax.random.uniform(jax.random.PRNGKey(1), (R, 8), jnp.float32)

    def gather_weighted(flat, rows, w, chunk=65536):
        n_chunks = rows.shape[0] // chunk

        def one(args):
            r, wc = args
            t = jnp.take(flat, r, axis=0).reshape(chunk, 8, C)
            return jnp.sum(t.astype(jnp.float32) * wc[:, :, None], axis=1)

        outs = jax.lax.map(one, (rows.reshape(n_chunks, chunk),
                                 w.reshape(n_chunks, chunk, 8)))
        return jnp.sum(outs)

    for dt, name in ((jnp.bfloat16, 'bf16'), (jnp.float8_e4m3fn, 'fp8e4m3'),
                     (jnp.int8, 'int8')):
        try:
            flat = jax.random.normal(jax.random.PRNGKey(2),
                                     (TAB_ROWS, W8)).astype(dt) \
                if dt != jnp.int8 else jax.random.randint(
                    jax.random.PRNGKey(2), (TAB_ROWS, W8), -127, 127, jnp.int8)
            f = jax.jit(gather_weighted)
            t = timeit(f, [(flat, rows_idx + i, w8) for i in range(3)])
            print(f'[ray-gather {name:8s}] {t*1000:7.1f} ms  '
                  f'{R/t/1e6:6.1f} M rows/s  '
                  f'{R*W8*flat.dtype.itemsize/t/1e9:6.1f} GB/s', flush=True)
        except Exception as e:
            print(f'[ray-gather {name}] FAIL {type(e).__name__}: {str(e)[:120]}')

    # row-count scaling (bf16)
    flat = jax.random.normal(jax.random.PRNGKey(2), (TAB_ROWS, W8)).astype(jnp.bfloat16)
    for frac in (0.5, 0.25, 0.125):
        Rf = int(R * frac) // 65536 * 65536
        f = jax.jit(gather_weighted)
        t = timeit(f, [(flat, rows_idx[:Rf] + i, w8[:Rf]) for i in range(3)])
        print(f'[ray-gather bf16 {frac:5.3f}R] {t*1000:7.1f} ms  '
              f'{Rf/t/1e6:6.1f} M rows/s', flush=True)

    # narrow-row gather: sdf-only table (8 values/row)
    flat_n = jax.random.normal(jax.random.PRNGKey(3), (TAB_ROWS, 8)).astype(jnp.bfloat16)

    def gather_narrow(flat, rows, w, chunk=65536):
        n_chunks = rows.shape[0] // chunk

        def one(args):
            r, wc = args
            t = jnp.take(flat, r, axis=0)
            return jnp.sum(t.astype(jnp.float32) * wc, axis=1)

        outs = jax.lax.map(one, (rows.reshape(n_chunks, chunk),
                                 w.reshape(n_chunks, chunk, 8)))
        return jnp.sum(outs)

    f = jax.jit(gather_narrow)
    t = timeit(f, [(flat_n, rows_idx + i, w8) for i in range(3)])
    print(f'[sdf-gather bf16 narrow] {t*1000:7.1f} ms  {R/t/1e6:6.1f} M rows/s',
          flush=True)

    # minor-axis take_along_axis at frustum shapes: (rows, L) gathered along
    # axis 1 with per-element indices (the shear-warp building block)
    NR, L = 6 * 64 * 176, 128
    src = jax.random.normal(jax.random.PRNGKey(4), (NR, L), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(5), (NR, 86), 0, L, jnp.int32)

    def tala(s, i):
        return jnp.sum(jnp.take_along_axis(s, i, axis=1))

    f = jax.jit(tala)
    t = timeit(f, [(src + i, idx) for i in range(3)])
    q = NR * 86
    print(f'[take_along_axis minor] {t*1000:7.1f} ms  {q/t/1e6:6.1f} M elem/s',
          flush=True)

    # dynamic-slice-per-row variant: shift by a per-row constant (shear) via
    # gather of contiguous windows
    sh = jax.random.randint(jax.random.PRNGKey(6), (NR, 1), 0, L - 90, jnp.int32)
    win = sh + jnp.arange(86)[None, :]
    f = jax.jit(tala)
    t = timeit(f, [(src + i, win) for i in range(3)])
    print(f'[tala contiguous-window] {t*1000:7.1f} ms  {q/t/1e6:6.1f} M elem/s',
          flush=True)


if __name__ == '__main__':
    main()
