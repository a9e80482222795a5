"""Chunk-reduce variants for the fused outer-product lift gather (TPU).

The pure take runs at ~165M rows/s but take+reduce measured 73M — the f32
row materialization spills VMEM. Variants restructure the per-chunk math.

Run: python scripts/perf_lift_variants.py
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

    tabs = jax.random.normal(jax.random.PRNGKey(0), (N, R, 8 + 4 * C),
                             jnp.bfloat16)
    rows = jax.random.randint(jax.random.PRNGKey(1), (N, P), 0, R, jnp.int32)
    w8 = jax.random.uniform(jax.random.PRNGKey(2), (N, P, 8), jnp.float32)

    def make(chunk, mode):
        n_chunks = P // chunk

        def one_cam(fl, r, w):
            def one_chunk(args):
                rr, ww = args
                t = jnp.take(fl, rr, axis=0)
                if mode == 'cast_full':
                    t = t.astype(jnp.float32)
                    dparts = t[:, :8].reshape(chunk, 2, 4)
                    fparts = t[:, 8:].reshape(chunk, 4, C)
                    wzk = jnp.sum(ww.reshape(chunk, 2, 4) * dparts, axis=1)
                    return jnp.sum(fparts * wzk[:, :, None], axis=1)
                dparts = t[:, :8].reshape(chunk, 2, 4)
                fparts = t[:, 8:].reshape(chunk, 4, C)
                wzk = jnp.einsum('pzk,pzk->pk', ww.reshape(chunk, 2, 4),
                                 dparts.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)
                if mode == 'einsum_bf16w':
                    out = jnp.einsum('pkc,pk->pc', fparts,
                                     wzk.astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32)
                else:
                    out = jnp.einsum('pkc,pk->pc',
                                     fparts.astype(jnp.float32), wzk,
                                     preferred_element_type=jnp.float32)
                return out
            outs = jax.lax.map(one_chunk,
                               (r.reshape(n_chunks, chunk),
                                w.reshape(n_chunks, chunk, 8)))
            return outs.reshape(P, C)
        return jax.jit(lambda t, r, w: jnp.sum(jax.vmap(one_cam)(t, r, w)))

    argsl = [(tabs, rows, w8), (tabs, rows + 1, w8), (tabs, rows + 2, w8)]
    for chunk in (16384, 32768, 65536, 131072):
        for mode in ('cast_full', 'einsum_f32', 'einsum_bf16w'):
            f = make(chunk, mode)
            t = timeit(f, argsl)
            print(f'[{mode:12s} chunk {chunk:6d}] {t*1e3:7.1f} ms '
                  f'({N*P/t/1e6:6.1f} M rows/s)', flush=True)


if __name__ == '__main__':
    main()
