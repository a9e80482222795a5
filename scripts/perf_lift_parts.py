"""Decompose the lift stage (sample_outer_product_fused x6 cams) on TPU.

Parts: table build | window weights | gather+reduce (prebuilt inputs) | all.
Run: python scripts/perf_lift_parts.py
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
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.core import sampling as S

    cfg = flagship_config()
    c = cfg.backbone
    Z, Y, X = c.grid_zyx('seg')
    D = c.depth_channels
    fH, fW = c.feat_hw
    N, C = 6, c.mid_channels
    P = Z * Y * X
    chunk = 65536

    depth = jax.nn.softmax(jax.random.normal(
        jax.random.PRNGKey(1), (N, D, fH, fW)), 1).astype(jnp.bfloat16)
    feat = jax.random.normal(jax.random.PRNGKey(2), (N, fH, fW, C),
                             jnp.bfloat16)
    coords = (jax.random.uniform(jax.random.PRNGKey(3), (N, P, 3)) * 2.4
              - 1.2)

    def build_tables(d, f):
        def one(dv, fv):
            dt = jnp.bfloat16
            dp = jnp.pad(dv.astype(dt)[..., None],
                         ((1, 1), (1, 1), (1, 1), (0, 0)))
            dtab = jnp.concatenate(
                [dp[k:k + D + 1, i:i + fH + 1, j:j + fW + 1]
                 for k in (0, 1) for i in (0, 1) for j in (0, 1)], -1)
            dtab = dtab.reshape(D + 1, (fH + 1) * (fW + 1), 8)
            fp = jnp.pad(fv.astype(dt), ((1, 1), (1, 1), (0, 0)))
            fblk = jnp.concatenate([fp[i:i + fH + 1, j:j + fW + 1]
                                    for i in (0, 1) for j in (0, 1)], -1)
            fblk = fblk.reshape(1, (fH + 1) * (fW + 1), 4 * C)
            ftab = jnp.broadcast_to(fblk, (D + 1,) + fblk.shape[1:])
            flat = jnp.concatenate([dtab, ftab], -1)
            return flat.reshape((D + 1) * (fH + 1) * (fW + 1), 8 + 4 * C)
        return jax.vmap(one)(d, f)

    def weights(cc):
        def one(c3):
            bx, ax = S._axis_window_weights(c3[:, 0], fW, False, False)
            by, ay = S._axis_window_weights(c3[:, 1], fH, False, False)
            bz, az = S._axis_window_weights(c3[:, 2], D, False, False)
            rows = (bz * (fH + 1) + by) * (fW + 1) + bx
            w8 = (az[:, :, None, None] * ay[:, None, :, None]
                  * ax[:, None, None, :]).reshape(-1, 8)
            return rows, w8
        return jax.vmap(one)(cc)

    def gather_reduce(flat, rows, w8):
        def one(fl, r, w):
            n_chunks = P // chunk

            def one_chunk(args):
                rr, ww = args
                t = jnp.take(fl, rr, axis=0).astype(jnp.float32)
                dparts = t[:, :8].reshape(chunk, 2, 4)
                fparts = t[:, 8:].reshape(chunk, 4, C)
                wzk = jnp.sum(ww.reshape(chunk, 2, 4) * dparts, axis=1)
                return jnp.sum(fparts * wzk[:, :, None], axis=1)
            outs = jax.lax.map(one_chunk,
                               (r.reshape(n_chunks, chunk),
                                w.reshape(n_chunks, chunk, 8)))
            return outs.reshape(P, C)
        return jax.vmap(one)(flat, rows, w8)

    f_tab = jax.jit(lambda d, f: jnp.sum(build_tables(d, f)
                                         .astype(jnp.float32)))
    f_w = jax.jit(lambda cc: sum(jnp.sum(x.astype(jnp.float32))
                                 for x in weights(cc)))
    tabs = jax.jit(build_tables)(depth, feat)
    rows, w8 = jax.jit(weights)(coords)
    rows, w8 = jax.device_put(rows), jax.device_put(w8)
    f_g = jax.jit(lambda t, r, w: jnp.sum(gather_reduce(t, r, w)))
    f_all = jax.jit(lambda d, f, cc: jnp.sum(jax.vmap(
        lambda dd, ff, c3: S.sample_outer_product_fused(
            dd, ff, c3, align_corners=False))(d, f, cc)))

    print('[tables ] %.1f ms' % (1e3 * timeit(
        f_tab, [(depth + 1e-4 * i, feat) for i in range(3)])))
    print('[weights] %.1f ms' % (1e3 * timeit(
        f_w, [(coords + 1e-5 * i,) for i in range(3)])))
    print('[gather ] %.1f ms' % (1e3 * timeit(
        f_g, [(tabs, rows, w8), (tabs, rows + 1, w8), (tabs, rows + 2, w8)])))
    print('[all    ] %.1f ms' % (1e3 * timeit(
        f_all, [(depth + 1e-4 * i, feat, coords) for i in range(3)])))


if __name__ == '__main__':
    main()
