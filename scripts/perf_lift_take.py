"""Isolate the lift take: vmap-per-camera vs one flat offset-indexed take.

Run: python scripts/perf_lift_take.py
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

    N, C, D, fH, fW = 6, 16, 86, 64, 176
    P = 20 * 256 * 256
    R = (D + 1) * (fH + 1) * (fW + 1)
    W = 8 + 4 * C

    tabs = jax.random.normal(jax.random.PRNGKey(0), (N, R, W), jnp.bfloat16)
    rows = jax.random.randint(jax.random.PRNGKey(1), (N, P), 0, R, jnp.int32)
    flat_tab = tabs.reshape(N * R, W)
    flat_rows = (rows + (jnp.arange(N, dtype=jnp.int32) * R)[:, None]
                 ).reshape(N * P)

    def sum_take_vmap(t, r, chunk):
        def one_cam(fl, rr):
            def one_chunk(rc):
                v = jnp.take(fl, rc, axis=0)
                return jnp.sum(v.astype(jnp.float32), axis=-1)
            return jnp.sum(jax.lax.map(one_chunk, rr.reshape(-1, chunk)))
        return jnp.sum(jax.vmap(one_cam)(t, r))

    def sum_take_flat(t, r, chunk):
        def one_chunk(rc):
            v = jnp.take(t, rc, axis=0)
            return jnp.sum(v.astype(jnp.float32), axis=-1)
        return jnp.sum(jax.lax.map(one_chunk, r.reshape(-1, chunk)))

    def sum_take_flat_out(t, r, chunk):
        # materializes the (P, W) bf16 output (no row-sum fusion)
        def one_chunk(rc):
            return jnp.take(t, rc, axis=0)
        o = jax.lax.map(one_chunk, r.reshape(-1, chunk))
        return jnp.sum(o.astype(jnp.float32))

    for chunk in (65536, 131072):
        f = jax.jit(lambda t, r: sum_take_vmap(t, r, chunk))
        t = timeit(f, [(tabs, rows), (tabs, rows + 1), (tabs, rows + 2)])
        print(f'[vmap  take+rowsum chunk {chunk:6d}] {t*1e3:7.1f} ms '
              f'({N*P/t/1e6:6.1f} M rows/s)', flush=True)
        f = jax.jit(lambda t2, r: sum_take_flat(t2, r, chunk))
        t = timeit(f, [(flat_tab, flat_rows), (flat_tab, flat_rows + 1),
                       (flat_tab, flat_rows + 2)])
        print(f'[flat  take+rowsum chunk {chunk:6d}] {t*1e3:7.1f} ms '
              f'({N*P/t/1e6:6.1f} M rows/s)', flush=True)
        f = jax.jit(lambda t2, r: sum_take_flat_out(t2, r, chunk))
        t = timeit(f, [(flat_tab, flat_rows), (flat_tab, flat_rows + 1),
                       (flat_tab, flat_rows + 2)])
        print(f'[flat  take->materialize {chunk:6d}] {t*1e3:7.1f} ms '
              f'({N*P/t/1e6:6.1f} M rows/s)', flush=True)


if __name__ == '__main__':
    main()
