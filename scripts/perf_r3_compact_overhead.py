"""Decompose the compact/ET ray-sampler overhead (round-3 diagnosis).

Round-2/3 measured both sorted-compaction schemes LOSING at inference
despite 0.62x/0.53x gather rows. This probe separates the three candidate
costs at flagship shapes with REAL eval-rig geometry:

  dense      : one lax.map over all rays/samples (the shipped sampler)
  compact1.0 : the compact pass machinery with caps all 1.0 — same gather
               rows as dense, PLUS the dynamic L-sort, the coord/val/delta
               reorders, the per-pass serialization and the fog epilogue.
               (compact1.0 - dense) = total machinery overhead.
  compactWin : the shipped train-mode pass_fracs (0.62x rows).
               (compact1.0 - compactWin) = the actual row saving.
  argsort    : the dynamic argsort + 3 reorder gathers alone.

If machinery overhead ~= argsort+reorders, a STATIC (trace-time) canonical
ray order would recover the row saving; if it is pass serialization, no
ordering trick helps.

Run: python scripts/perf_r3_compact_overhead.py  (real TPU)
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
    from vampire_tpu.core import geometry as G
    from vampire_tpu.core import rendering as R
    from vampire_tpu.data.synthetic import camera_rig

    cfg = flagship_config()
    c = cfg.backbone
    Zs, Ys, Xs = c.grid_zyx('seg')
    K = c.num_classes
    Cch = 1 + K + 3

    frustum = jnp.asarray(G.make_frustum(c.final_dim, c.downsample_factor,
                                         c.d_bound))
    rig = camera_rig(1, 6, c.final_dim, seed=0)
    geom = G.get_geometry(frustum, jnp.asarray(rig['sensor2ego']),
                          jnp.asarray(rig['intrin']),
                          jnp.asarray(rig['ida']), jnp.asarray(rig['bda']))
    geom = jnp.nan_to_num(geom, nan=-1e3)
    norm = G.normalize_coords(geom[:, :, :-1], c.x_bound_seg, c.y_bound_seg,
                              c.z_bound_seg)
    valid = G.inrange_mask(norm).astype(jnp.float32)
    B, N, Sn, fh, fw = norm.shape[:5]
    delta = jnp.linalg.norm(geom[:, :, 1:].astype(jnp.float32)
                            - geom[:, :, :-1].astype(jnp.float32), axis=-1)
    # ray-major: (N, S, fh, fw, ...) -> (N*fh*fw rays, S, ...)
    rm = lambda x, tail: jnp.moveaxis(x, 1, 3).reshape(
        (N * fh * fw, Sn) + tail)
    coords = rm(norm[0], (3,))
    val = rm(valid[0], ())
    dl = rm(delta[0], ())
    mids = jnp.asarray(G.make_camera_mids(c.d_bound))

    rng = np.random.default_rng(0)
    table = jnp.asarray(
        rng.standard_normal(((Zs + 1) * (Ys + 1) * (Xs + 1), 8 * Cch))
        .astype(np.float32), dtype=jnp.bfloat16)
    dens = lambda x: R.laplace_density(x, 0.1, c.sdf_bias)

    n_pass = -(-Sn // c.ray_chunk)
    variants = {
        'dense': jax.jit(lambda t, cc, vv, dd: R.sample_and_composite_rays(
            t, (Zs, Ys, Xs), K, cc, vv, dd, mids, dens, c.d_bound[1])),
        'compact1.0': jax.jit(
            lambda t, cc, vv, dd: R.sample_and_composite_rays_compact(
                t, (Zs, Ys, Xs), K, cc, vv, dd, mids, dens, c.d_bound[1],
                chunk=c.ray_chunk, pass_fracs=(1.0,) * n_pass)),
        'compactWin': jax.jit(
            lambda t, cc, vv, dd: R.sample_and_composite_rays_compact(
                t, (Zs, Ys, Xs), K, cc, vv, dd, mids, dens, c.d_bound[1],
                chunk=c.ray_chunk, pass_fracs=c.ray_pass_fracs)),
    }
    args = [(table, coords + 1e-4 * i, val, dl) for i in range(3)]
    res = {}
    for name, f in variants.items():
        res[name] = timeit(f, args)
        print(f'[{name:10s}] {res[name]*1e3:7.1f} ms', flush=True)

    def sort_reorder(cc, vv, dd):
        has = jnp.any(vv > 0, axis=1)
        L = jnp.where(has, vv.shape[1]
                      - jnp.argmax(vv[:, ::-1] > 0, axis=1), 0)
        order = jnp.argsort(-L)
        return (jnp.take(cc, order, axis=0), jnp.take(vv, order, axis=0),
                jnp.take(dd, order, axis=0))
    f = jax.jit(lambda t, cc, vv, dd: sort_reorder(cc, vv, dd))
    t = timeit(f, args)
    print(f'[argsort+reorder] {t*1e3:7.1f} ms', flush=True)
    print(f'\nmachinery overhead (compact1.0 - dense): '
          f'{(res["compact1.0"] - res["dense"])*1e3:7.1f} ms')
    print(f'row saving (compact1.0 - compactWin):     '
          f'{(res["compact1.0"] - res["compactWin"])*1e3:7.1f} ms')


if __name__ == '__main__':
    main()
