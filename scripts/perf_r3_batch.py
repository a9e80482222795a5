"""Inference batch-size throughput sweep (serving batching).

The frame is dominated by row-latency-bound gathers; batching could
amortize fixed per-op costs (or not, if rows scale linearly and the gather
engine is already saturated). Measures pipelined frames/sec/chip at
B in {1, 2} with the bench.py methodology.

Run: python scripts/perf_r3_batch.py  (real TPU)
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

    for B in (1, 2):
        batch = synthetic_batch(cfg, batch_size=B,
                                n_points=cfg.train.max_points, seed=0,
                                mode='val')
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        mats = split_mats(batch)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), batch['imgs'], mats,
            points=batch['points'], train=False))()

        @jax.jit
        def fwd(v, imgs, mats, pts):
            fo, preds = model.apply(v, imgs, mats, points=pts, train=False)
            dec = decode_preds(preds, cfg.head)
            outs = (fo['occ_logits'], fo['occ_density'], fo['pts_logits'],
                    fo['depth_preds'], fo['bev_seg_logits_preds'],
                    [(d['bboxes'], d['scores'], d['labels'], d['valid'])
                     for d in dec])
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(outs))

        def sync(out):
            np.asarray(out)

        args = (variables, batch['imgs'], mats, batch['points'])
        sync(fwd(*args))
        sync(fwd(*args))
        imgs_v = [batch['imgs'] + 0.001 * i for i in range(4)]
        n_iters = 8
        t0 = time.perf_counter()
        pending = fwd(variables, imgs_v[0], mats, batch['points'])
        for i in range(1, n_iters):
            nxt = fwd(variables, imgs_v[i % 4], mats, batch['points'])
            sync(pending)
            pending = nxt
        sync(pending)
        dt = (time.perf_counter() - t0) / n_iters
        print(f'B={B}: {dt*1e3:7.1f} ms/iter  {B/dt:6.2f} frames/s/chip',
              flush=True)


if __name__ == '__main__':
    main()
