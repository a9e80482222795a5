"""Metrics-only inference graph: DCE the camera-render branch (round 4).

The three nuScenes metrics the driver targets (Occ3D mIoU, lidarseg mIoU,
detection NDS) are computed from occ_logits/occ_density, pts_logits and the
decoded det boxes — none of them reads the per-camera rgb/seg/depth renders
(reference: val consumes only the seg outputs, base_exp.py:634-658; test
consumes only get_bboxes, base_exp.py:665-677; the camera renders feed
training losses and --vis dumps only, base_exp.py:419-513,678-708).

The eager reference cannot skip that branch: `forward` computes the full
12-tuple unconditionally (base_vampire2.py:637-649). A jitted JAX graph can —
return only the metric outputs and XLA dead-code-eliminates the camera ray
gather + compositing + x4 upsample (the single largest line of the frame:
~60 ms of take-bound gather at ~10 ns/row, ROUND3.md attribution).

This probe times, with bench.py's exact 2-deep pipelined methodology:
  full      — bench.py's current output set (renders included)
  metrics   — occ_logits, occ_density, pts_logits, decoded boxes only
  metrics+bev — metrics plus the BEV-render task outputs (bev_seg/height/rgb;
                the BEV branch is separable-matmul based, no ray gather)

Run on the TPU host: python scripts/perf_r4_metrics_only.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.models.centerpoint_head import decode_preds
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

    def make_fwd(which):
        @jax.jit
        def fwd(v, imgs, mats, pts):
            fo, preds = model.apply(v, imgs, mats, points=pts, train=False)
            dec = decode_preds(preds, cfg.head)
            det = [(d['bboxes'], d['scores'], d['labels'], d['valid'])
                   for d in dec]
            metric_outs = (fo['occ_logits'], fo['occ_density'],
                           fo['pts_logits'], det)
            if which == 'full':
                outs = metric_outs + (fo['depth_preds'],
                                      fo['bev_seg_logits_preds'])
            elif which == 'metrics':
                outs = metric_outs
            elif which == 'metrics+bev':
                outs = metric_outs + (fo['bev_seg_logits_preds'],
                                      fo['bev_height_preds'],
                                      fo['bev_rgb_preds'])
            else:
                raise ValueError(which)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(outs))
        return fwd

    def sync(out):
        for x in jax.tree.leaves(out):
            np.asarray(x)

    imgs_v = [batch['imgs'] + 0.001 * i for i in range(4)]
    for x in imgs_v:
        np.asarray(x.ravel()[:1])

    for which in ('full', 'metrics', 'metrics+bev'):
        fwd = make_fwd(which)
        args = (variables, batch['imgs'], mats, batch['points'])
        sync(fwd(*args))
        sync(fwd(*args))
        n_frames = 10
        t0 = time.perf_counter()
        pending = fwd(variables, imgs_v[0], mats, batch['points'])
        for i in range(1, n_frames):
            nxt = fwd(variables, imgs_v[i % 4], mats, batch['points'])
            sync(pending)
            pending = nxt
        sync(pending)
        dt = (time.perf_counter() - t0) / n_frames
        print(f'[{which:12s}] {dt * 1000:7.1f} ms/frame  '
              f'{1.0 / dt:6.3f} fps', flush=True)


if __name__ == '__main__':
    main()
