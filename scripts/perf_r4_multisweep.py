"""Measured cost of multi-sweep temporal fusion (VERDICT r3 #7 done-bar).

Times the flagship inference forward at F=1 (key frame only) vs F=2 (one
temporal sweep folded into the camera axis, field.py multi-sweep path) with
bench.py's 2-deep pipelined methodology. Expected added cost: ~1x encoder
pass + ~1x lift gather for the 6 extra views (the field/render/head stages
are F-independent).

Run (TPU): python scripts/perf_r4_multisweep.py [--frames 2]
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=2)
    ap.add_argument('--n', type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.training.train_step import split_mats

    cfg = flagship_config()
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
    batch = synthetic_batch(cfg, batch_size=1, n_points=cfg.train.max_points,
                            seed=0, mode='val')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch['imgs'], mats, points=batch['points'],
        train=False))()

    def run(F):
        if F == 1:
            imgs, m = batch['imgs'], mats
        else:
            # perturbed copies of the key frame as extra sweeps (cost is
            # shape-driven; values don't matter)
            imgs = jnp.stack([batch['imgs'] + 0.01 * f
                              for f in range(F)], axis=1)
            m = dict(mats, **{k: jnp.stack([mats[k]] * F, axis=1)
                              for k in ('sensor2ego', 'intrin', 'ida')})

        @jax.jit
        def fwd(v, imgs, m, pts):
            fo, _ = model.apply(v, imgs, m, points=pts, train=False,
                                lidar_seg=True)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in (fo['occ_logits'], fo['pts_logits'],
                                 fo['depth_preds']))

        a = (variables, imgs, m, batch['points'])
        np.asarray(fwd(*a))   # compile
        np.asarray(fwd(*a))   # warm
        imgs_v = [imgs + 0.001 * i for i in range(4)]
        for x in imgs_v:
            np.asarray(x.ravel()[:1])
        t0 = time.perf_counter()
        pending = fwd(variables, imgs_v[0], m, batch['points'])
        for i in range(1, args.n):
            nxt = fwd(variables, imgs_v[i % 4], m, batch['points'])
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        return (time.perf_counter() - t0) / args.n

    t1 = run(1)
    print(f'F=1 (key only)      : {t1*1e3:7.1f} ms/frame', flush=True)
    tF = run(args.frames)
    print(f'F={args.frames} (multi-sweep)   : {tF*1e3:7.1f} ms/frame '
          f'(+{(tF-t1)*1e3:.1f} ms, {tF/t1:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
