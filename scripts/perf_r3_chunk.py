"""Probe the fixed overhead of the chunked ray gather: chunk size sweep,
lax.map vs one-shot take, and weight-array precompute vs in-chunk compute.

Run: python scripts/perf_r3_chunk.py
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
    TAB_ROWS = 21 * 257 * 257
    C = 22
    W8 = 8 * C
    R = 5_800_000 // (1 << 19) * (1 << 19)   # 5.24M, big-chunk aligned

    rows_idx = jax.random.randint(key, (R,), 0, TAB_ROWS, jnp.int32)
    w8 = jax.random.uniform(jax.random.PRNGKey(1), (R, 8), jnp.float32)
    flat = jax.random.normal(jax.random.PRNGKey(2),
                             (TAB_ROWS, W8)).astype(jnp.bfloat16)

    def gather_map(flat, rows, w, chunk):
        n_chunks = rows.shape[0] // chunk

        def one(args):
            r, wc = args
            t = jnp.take(flat, r, axis=0).reshape(chunk, 8, C)
            return jnp.sum(t.astype(jnp.float32) * wc[:, :, None], axis=1)

        outs = jax.lax.map(one, (rows.reshape(n_chunks, chunk),
                                 w.reshape(n_chunks, chunk, 8)))
        return jnp.sum(outs)

    for chunk in (65536, 131072, 262144, 524288):
        f = jax.jit(lambda fl, r, w, c=chunk: gather_map(fl, r, w, c))
        t = timeit(f, [(flat, rows_idx + i, w8) for i in range(3)])
        print(f'[map chunk={chunk:7d}] {t*1000:7.1f} ms  {R/t/1e6:6.1f} M rows/s',
              flush=True)

    def gather_oneshot(flat, rows, w):
        t = jnp.take(flat, rows, axis=0).reshape(-1, 8, C)
        return jnp.sum(jnp.sum(t.astype(jnp.float32) * w[:, :, None], axis=1))

    f = jax.jit(gather_oneshot)
    t = timeit(f, [(flat, rows_idx + i, w8) for i in range(3)])
    print(f'[one-shot take      ] {t*1000:7.1f} ms  {R/t/1e6:6.1f} M rows/s',
          flush=True)

    # raw take only (no weighting): isolates the gather engine rate
    def take_only(flat, rows):
        t = jnp.take(flat, rows, axis=0)
        return jnp.sum(t.astype(jnp.float32))

    f = jax.jit(take_only)
    t = timeit(f, [(flat, rows_idx + i) for i in range(3)])
    print(f'[raw take (no wts)  ] {t*1000:7.1f} ms  {R/t/1e6:6.1f} M rows/s',
          flush=True)

    # sorted rows: does locality help the gather engine?
    rows_sorted = jnp.sort(rows_idx)
    f = jax.jit(take_only)
    t = timeit(f, [(flat, rows_sorted + i) for i in range(3)])
    print(f'[raw take sorted    ] {t*1000:7.1f} ms  {R/t/1e6:6.1f} M rows/s',
          flush=True)

    # narrower rows at same count: 4*C (2x2 corner, z folded)?
    flat4 = flat[:, :4 * C]
    f = jax.jit(take_only)
    t = timeit(f, [(flat4, rows_idx + i) for i in range(3)])
    print(f'[raw take 4C rows   ] {t*1000:7.1f} ms  {R/t/1e6:6.1f} M rows/s',
          flush=True)

    # wider rows, fewer of them: 16*C rows serving 2 queries each
    flat16 = jnp.concatenate([flat, flat], axis=1)
    f = jax.jit(take_only)
    t = timeit(f, [(flat16, rows_idx[:R // 2] + i) for i in range(3)])
    print(f'[raw take 16C, R/2  ] {t*1000:7.1f} ms  {R/2/t/1e6:6.1f} M rows/s',
          flush=True)


if __name__ == '__main__':
    main()
