"""Measure XLA take throughput vs row width and chunk size on TPU v5e.

The flagship inference is now gather-dominated (lift ~7.9M rows x 144B,
rays ~5.7M rows x 352B). Round-1 memory: ~74M rows/s narrow, ~45M rows/s at
512B. This sweep maps the actual rate curve (including the ~30-40ms fetch
roundtrip floor, reported separately via a null op) to find (a) the optimal
chunk, (b) whether 352B rows sit on the rate or byte wall, and (c) whether
splitting/packing rows pays.

Run: python scripts/perf_gather_sweep.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, args_list, iters=5, warmup=2):
    import jax
    for i in range(warmup):
        np.asarray(jax.tree.leaves(
            fn(*args_list[i % len(args_list)]))[0].ravel()[:1])
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args_list[i % len(args_list)])
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    # fetch-roundtrip floor
    null = jax.jit(lambda x: jnp.sum(x))
    xs = [jnp.ones((8, 128)) * i for i in range(3)]
    floor = timeit(null, [(x,) for x in xs])
    print(f'[fetch floor] {floor * 1000:.1f} ms', flush=True)

    R = 1_387_000          # ray-table rows (21*257*257)
    P = 5_740_000          # ray queries
    key = jax.random.PRNGKey(0)
    idx_all = jax.random.randint(key, (P,), 0, R)

    for width_bytes, cols in [(144, 72), (176, 88), (352, 176), (512, 256)]:
        table = jax.random.normal(jax.random.PRNGKey(1), (R, cols),
                                  jnp.bfloat16)
        for chunk in (65536, 131072, 262144, 524288):
            pad = (-P) % chunk
            idx = jnp.pad(idx_all, (0, pad)).reshape(-1, chunk)

            def f(t, ix):
                def one(r):
                    v = jnp.take(t, r, axis=0)
                    return jnp.sum(v.astype(jnp.float32), axis=-1)
                return jnp.sum(jax.lax.map(one, ix))
            g = jax.jit(f)
            dt = timeit(g, [(table + 1e-3 * i, idx) for i in range(3)]) - floor
            rate = P / dt / 1e6
            gbs = P * width_bytes / dt / 1e9
            print(f'[take {width_bytes:4d}B chunk {chunk:6d}] '
                  f'{dt * 1000:7.1f} ms  {rate:6.1f} M rows/s  '
                  f'{gbs:6.1f} GB/s', flush=True)


if __name__ == '__main__':
    main()
