"""Component-level timing of the flagship inference path on the real TPU.

Times each stage of the 390ms/frame round-1 budget in isolation with the real
shapes, to target round-2 optimizations at measured costs (VERDICT #2).

Run on the TPU host: python scripts/perf_breakdown.py [--stages a,b,...]
Timing per verify-skill gotchas: fold outputs to one checksum inside jit,
fetch one element per iteration, distinct inputs per iteration.
"""
import argparse
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


def record(results, name, value):
    results[name] = value
    print(f'[{name}] {value * 1000:.1f} ms', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--stages', default='all')
    args = ap.parse_args()
    stages = args.stages.split(',') if args.stages != 'all' else [
        'full', 'camfeats', 'lift', 'unet', 'points', 'rays', 'raytable',
        'raytake', 'composite', 'head']

    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.core import geometry as G
    from vampire_tpu.core import rendering as R
    from vampire_tpu.core import sampling as S

    cfg = flagship_config()
    c = cfg.backbone
    key = jax.random.PRNGKey(0)
    Z, Y, X = c.grid_zyx('seg')           # 20, 256, 256
    K = c.num_classes                      # 18
    D = c.depth_channels                   # 86
    fH, fW = c.feat_hw                     # 64, 176
    N = 6
    results = {}

    def mk(shape, dtype=jnp.float32, k=0):
        return jax.random.normal(jax.random.PRNGKey(k), shape, dtype)

    if 'full' in stages:
        from vampire_tpu.data.synthetic import synthetic_batch
        from vampire_tpu.models.vampire import Vampire
        from vampire_tpu.models.centerpoint_head import decode_preds
        from vampire_tpu.training.train_step import split_mats
        model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
        batch = synthetic_batch(cfg, batch_size=1,
                                n_points=cfg.train.max_points, seed=0,
                                mode='val')
        batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
        mats = split_mats(batch)
        variables = jax.jit(lambda: model.init(
            key, batch['imgs'], mats, points=batch['points'], train=False))()

        @jax.jit
        def full(v, imgs):
            fo, preds = model.apply(v, imgs, mats, points=batch['points'],
                                    train=False)
            dec = decode_preds(preds, cfg.head)
            outs = (fo['occ_logits'], fo['occ_density'], fo['pts_logits'],
                    fo['depth_preds'], fo['bev_seg_logits_preds'],
                    [(d['bboxes'], d['scores']) for d in dec])
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(outs))
        argsl = [(variables, batch['imgs'] + 0.001 * i) for i in range(3)]
        record(results, 'full', timeit(full, argsl))

    if 'camfeats' in stages:
        from vampire_tpu.models.resnet import ResNet
        from vampire_tpu.models.second_fpn import SECONDFPN
        import flax.linen as nn

        class Enc(nn.Module):
            @nn.compact
            def __call__(self, x):
                feats = ResNet(depth=50, out_indices=c.img_backbone_out_indices,
                               frozen_stem=True, dtype=jnp.bfloat16)(x, False)
                f = SECONDFPN(in_channels=c.img_neck_in_channels,
                              out_channels=c.img_neck_out_channels,
                              upsample_strides=c.img_neck_upsample_strides,
                              dtype=jnp.bfloat16)(feats, False)
                dl = nn.Conv(D, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                             dtype=jnp.bfloat16)(f)
                lo = nn.Conv(c.mid_channels, (3, 3), padding=[(1, 1)] * 2,
                             use_bias=False, dtype=jnp.bfloat16)(f)
                return (jax.nn.softmax(dl.astype(jnp.float32), -1), lo)
        enc = Enc()
        x = mk((N, 256, 704, 3), jnp.bfloat16)
        ev = jax.jit(lambda: enc.init(key, x))()
        f = jax.jit(lambda v, xx: sum(jnp.sum(o.astype(jnp.float32))
                                      for o in jax.tree.leaves(enc.apply(v, xx))))
        record(results, 'camfeats', timeit(f, [(ev, x + 0.001 * i) for i in range(3)]))

    # shared synthetic tensors for the core ops
    depth = jax.nn.softmax(mk((N, fH, fW, D), k=1), -1).astype(jnp.bfloat16)
    feat = mk((N, fH, fW, c.mid_channels), jnp.bfloat16, k=2)
    # voxel-grid pixel coords: roughly half the queries valid
    coords_lift = (jax.random.uniform(jax.random.PRNGKey(3),
                                      (N, Z * Y * X, 3)) * 2.4 - 1.2)

    if 'lift' in stages:
        def lift(d, f2, cc):
            dvol = jnp.moveaxis(d, -1, 1)
            return jnp.sum(jax.vmap(
                lambda dd, ff, c3: S.sample_outer_product_fused(
                    dd, ff, c3, align_corners=False))(dvol, f2, cc))
        f = jax.jit(lift)
        record(results, 'lift', timeit(
            f, [(depth + 1e-4 * i, feat, coords_lift) for i in range(3)]))

    if 'unet' in stages:
        from vampire_tpu.models.unet3d import Unet3D
        net = Unet3D(c.mid_channels, dtype=jnp.bfloat16)
        xin = mk((1, Z, Y, X, c.mid_channels + 3), jnp.bfloat16, k=4)
        ev = jax.jit(lambda: net.init(key, xin))()
        f = jax.jit(lambda v, xx: jnp.sum(net.apply(v, xx).astype(jnp.float32)))
        record(results, 'unet', timeit(f, [(ev, xin + 0.001 * i) for i in range(3)]))

    fused = mk((1, Z, Y, X, 1 + K + 3), jnp.float32, k=5)
    P_rays = N * (D - 1) * fH * fW

    if 'points' in stages:
        pts = (jax.random.uniform(jax.random.PRNGKey(6),
                                  (1, 36864, 3)) * 2 - 1)
        f = jax.jit(lambda v, cc: jnp.sum(S.batched_grid_sample_3d_fused(
            v, cc, align_corners=True, padding_mode='border')))
        record(results, 'points', timeit(f, [(fused[..., :K + 1] + 1e-4 * i, pts)
                                          for i in range(3)]))

    if 'raytable' in stages:
        f = jax.jit(lambda v: jnp.sum(S.build_neighborhood_table(
            v[0].astype(jnp.bfloat16)).astype(jnp.float32)))
        record(results, 'raytable', timeit(f, [(fused + 1e-4 * i,) for i in range(3)]))

    if 'raytake' in stages or 'rays' in stages:
        rc = (jax.random.uniform(jax.random.PRNGKey(7),
                                 (1, P_rays, 3)) * 2.4 - 1.2)
        f = jax.jit(lambda v, cc: jnp.sum(S.batched_grid_sample_3d_fused(
            v.astype(jnp.bfloat16), cc, align_corners=True,
            padding_mode='zeros')))
        record(results, 'rays', timeit(f, [(fused + 1e-4 * i, rc) for i in range(3)]))

    if 'composite' in stages:
        # the model renders S = D-1 samples with a (D)-point geom for deltas
        geom = mk((1, N, D, fH, fW, 3), k=8) * 40
        sdf = mk((1, N, D - 1, fH, fW), k=9)
        seg = mk((1, N, D - 1, fH, fW, K), k=10)
        rgb = jax.nn.sigmoid(mk((1, N, D - 1, fH, fW, 3), k=11))
        mids = jnp.asarray(G.make_camera_mids(c.d_bound))
        def comp(s, sg, rg, ge):
            out = R.render_camera_rays(s, sg, rg, ge, mids,
                                       lambda x: jax.nn.sigmoid(x),
                                       c.d_bound[1])
            return sum(jnp.sum(o) for o in out)
        f = jax.jit(comp)
        record(results, 'composite', timeit(
            f, [(sdf + 1e-3 * i, seg, rgb, geom) for i in range(3)]))

    if 'head' in stages:
        from vampire_tpu.models.centerpoint_head import (BEVDepthHead,
                                                         decode_preds)
        head = BEVDepthHead(cfg.head)
        xin = mk((1, 128, 128, 80), jnp.float32, k=12)
        ev = jax.jit(lambda: head.init(key, xin, False))()
        def h(v, xx):
            preds = head.apply(v, xx, False)
            dec = decode_preds(preds, cfg.head)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(
                           [(d['bboxes'], d['scores']) for d in dec]))
        f = jax.jit(h)
        record(results, 'head', timeit(f, [(ev, xin + 0.001 * i)
                                           for i in range(3)]))

    print('\n=== perf breakdown (ms) ===')
    for k2, v in results.items():
        print(f'{k2:12s} {v * 1000:8.1f}')


if __name__ == '__main__':
    main()
