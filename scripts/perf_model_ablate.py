"""In-model component attribution for the flagship inference path.

perf_breakdown.py times components in ISOLATION, which overcounts (every
isolated sampler call rebuilds the corner table that the real model shares,
and the real model runs block-compacted paths). This script times the FULL
jitted forward with one component at a time replaced by a shape-matched
zeros stub, so the delta vs baseline is that component's true in-graph cost
(including what XLA fusion gives/takes).

Run on the TPU host: python scripts/perf_model_ablate.py [--variants a,b]
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, args_list, iters=6, warmup=2):
    import jax
    for i in range(warmup):
        np.asarray(fn(*args_list[i % len(args_list)]).ravel()[:1])
    ts = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(out.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--variants', default='all')
    ap.add_argument('--outputs', default='full', choices=['full', 'metrics'],
                    help="'metrics' = the round-4 headline graph (all four "
                         "task outputs, camera renders left to XLA DCE)")
    args = ap.parse_args()
    names = ['base_dense', 'base_compact', 'no_rays', 'no_lift', 'no_unet',
             'no_camfeats', 'no_queries', 'no_upsample', 'no_head',
             'no_points']
    variants = names if args.variants == 'all' else args.variants.split(',')

    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.models import field as field_mod
    from vampire_tpu.core import rendering as R
    from vampire_tpu.core import sampling as S
    from vampire_tpu.training.train_step import split_mats

    cfg0 = flagship_config()
    batch = synthetic_batch(cfg0, batch_size=1,
                            n_points=cfg0.train.max_points, seed=0,
                            mode='val')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)

    results = {}

    def run(name, cfg, patches=(), points=True, lidar_seg=False):
        model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
        saved = [(obj, attr, getattr(obj, attr)) for obj, attr, _ in patches]
        for obj, attr, new in patches:
            setattr(obj, attr, new)
        try:
            pts = batch['points'] if points else None
            variables = jax.jit(lambda: model.init(
                jax.random.PRNGKey(0), batch['imgs'], mats, points=pts,
                train=False))()

            @jax.jit
            def fwd(v, imgs):
                fo, preds = model.apply(v, imgs, mats, points=pts,
                                        train=False, lidar_seg=lidar_seg)
                outs = [fo['occ_logits'], fo['occ_density'],
                        fo['bev_seg_logits_preds'],
                        fo['bev_feature']] + list(jax.tree.leaves(preds))
                if args.outputs == 'full':
                    outs.append(fo['depth_preds'])
                else:
                    outs += [fo['bev_height_preds'], fo['bev_rgb_preds']]
                if fo['pts_logits'] is not None:
                    outs.append(fo['pts_logits'])
                return sum(jnp.sum(x.astype(jnp.float32)) for x in outs)

            t = timeit(fwd, [(variables, batch['imgs'] + 0.001 * i)
                             for i in range(3)])
            results[name] = t
            print(f'[{name}] {t * 1000:.1f} ms', flush=True)
        except Exception as e:
            print(f'[{name}] FAILED {type(e).__name__}: {str(e)[:300]}',
                  flush=True)
        finally:
            for obj, attr, old in saved:
                setattr(obj, attr, old)

    cfg_dense = dataclasses.replace(
        cfg0, backbone=dataclasses.replace(cfg0.backbone, ray_pass_fracs=()))

    def zero_ray_sampler(table, vol_shape, K, coords, valid, deltas, mids,
                         density_fn, bg_depth, **kw):
        Rn = coords.shape[0]
        z = jnp.sum(table.astype(jnp.float32)) * 0 + jnp.sum(coords) * 0
        return (jnp.zeros((Rn, 3)) + z, jnp.zeros((Rn, K)) + z,
                jnp.zeros((Rn,)) + z)

    def zero_outer(depth_vol, feat, coords, align_corners=False, chunk=65536,
                   out_dtype=jnp.float32):
        lead = coords.shape[:-1]
        C = feat.shape[-1]
        z = (jnp.sum(depth_vol.astype(jnp.float32)) * 0
             + jnp.sum(feat.astype(jnp.float32)) * 0 + jnp.sum(coords) * 0)
        return jnp.zeros(lead + (C,), out_dtype) + z

    import flax.linen as nn
    from typing import Any

    class StubUnet(nn.Module):
        """Shape-matched stand-in for Unet3D: one cheap 1x1x1 conv."""
        mid_channels: int
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x):
            return nn.Conv(self.mid_channels, (1, 1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name='stub')(x)

    def cheap_cam_feats(self, imgs, train):
        c = self.cfg
        h = imgs.shape[1] // c.downsample_factor
        w = imgs.shape[2] // c.downsample_factor
        C = c.img_out_channels
        m = jnp.mean(imgs.astype(self.dtype), axis=(1, 2, 3))
        return jnp.zeros((imgs.shape[0], h, w, C), self.dtype) + m[:, None,
                                                                   None, None]

    def zero_apply_mats(vol, mats_, axes, out_dtype=jnp.float32):
        shp = list(vol.shape)
        for m, ax in zip(mats_, axes):
            shp[ax] = np.asarray(m).shape[0]
        z = jnp.sum(vol.astype(jnp.float32)) * 0
        return jnp.zeros(tuple(shp), out_dtype) + z

    from vampire_tpu.models.unet3d import Unet3D

    if 'base_dense' in variants:
        run('base_dense', cfg_dense)
    if 'base_compact' in variants:
        run('base_compact', cfg0)
    if 'no_rays' in variants:
        run('no_rays', cfg_dense,
            patches=[(R, 'sample_and_composite_rays', zero_ray_sampler),
                     (field_mod.R, 'sample_and_composite_rays',
                      zero_ray_sampler)])
    if 'no_lift' in variants:
        run('no_lift', cfg_dense,
            patches=[(S, 'sample_outer_product_fused', zero_outer)])
    if 'no_unet' in variants:
        run('no_unet', cfg_dense, patches=[(field_mod, 'Unet3D', StubUnet)])
    if 'no_camfeats' in variants:
        run('no_camfeats', cfg_dense,
            patches=[(field_mod.FieldBackbone, '_get_cam_feats',
                      cheap_cam_feats)])
    if 'no_queries' in variants:
        run('no_queries', cfg_dense,
            patches=[(S, 'apply_sample_matrices', zero_apply_mats),
                     (field_mod.S, 'apply_sample_matrices', zero_apply_mats)],
            points=False)
    if 'no_upsample' in variants:
        orig_resize = S.resize_linear

        def id_resize(x, out_sizes, axes):
            y = x
            for ax, o in zip(axes, out_sizes):
                if o % y.shape[ax] == 0:
                    y = jnp.repeat(y, o // y.shape[ax], axis=ax)
                else:
                    y = orig_resize(y, (o,), (ax,))
            return y
        run('no_upsample', cfg_dense,
            patches=[(field_mod.S, 'resize_linear', id_resize)])
    if 'no_head' in variants:
        run('no_head', cfg_dense, lidar_seg=True)
    if 'no_points' in variants:
        run('no_points', cfg_dense, points=False)

    print('\n=== in-model ablation (ms) ===')
    for k, v in results.items():
        print(f'{k:14s} {v * 1000:7.1f}')
    if 'base_dense' in results:
        b = results['base_dense']
        for k, v in results.items():
            if k.startswith('no_'):
                print(f'{k:14s} delta {1000 * (b - v):7.1f} ms')


if __name__ == '__main__':
    main()
