"""Round-3 inference variant sweep on the real TPU: one full-model timing
per optimization, so each lever's contribution is measured in-graph.

Variants (cumulative):
  r2-baseline : dense rays, 8-way-concat tables, lift topk=448
  +pairwise   : pairwise-interleave table builds (VAMPIRE_TABLE_BUILD)
  +et-rays    : transmittance-sorted early-termination ray sampling
  +lift288    : lift top-k 288 (measured worst case 208, 1.38x margin)

Run: python scripts/perf_r3_variants.py [--variants a,b,...]
"""
import argparse
import dataclasses
import os
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--variants', default='all')
    args = ap.parse_args()
    names = ['r2-baseline', 'pairwise', 'et-rays', 'lift288']
    variants = names if args.variants == 'all' else args.variants.split(',')

    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.models.centerpoint_head import decode_preds
    from vampire_tpu.training.train_step import split_mats

    cfg0 = flagship_config()
    batch = synthetic_batch(cfg0, batch_size=1,
                            n_points=cfg0.train.max_points, seed=0,
                            mode='val')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)

    def bench_one(name, bc, build):
        os.environ['VAMPIRE_TABLE_BUILD'] = build
        cfg = dataclasses.replace(cfg0, backbone=bc)
        model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), batch['imgs'], mats,
            points=batch['points'], train=False))()

        @jax.jit
        def fwd(v, imgs):
            fo, preds = model.apply(v, imgs, mats, points=batch['points'],
                                    train=False)
            dec = decode_preds(preds, cfg.head)
            outs = (fo['occ_logits'], fo['occ_density'], fo['pts_logits'],
                    fo['depth_preds'], fo['bev_seg_logits_preds'],
                    [(d['bboxes'], d['scores']) for d in dec])
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(outs))

        t = timeit(fwd, [(variables, batch['imgs'] + 0.001 * i)
                         for i in range(3)])
        print(f'[{name:12s}] {t*1000:7.1f} ms  ({1/t:5.2f} fps latency)',
              flush=True)
        return t

    bc_base = dataclasses.replace(cfg0.backbone, ray_et_fracs=(),
                                  lift_block_topk=448)
    bc_et = dataclasses.replace(cfg0.backbone, lift_block_topk=448)
    bc_all = cfg0.backbone  # et + topk 288 (current defaults)

    if 'r2-baseline' in variants:
        bench_one('r2-baseline', bc_base, 'concat8')
    if 'pairwise' in variants:
        bench_one('pairwise', bc_base, 'pairwise')
    if 'et-rays' in variants:
        bench_one('et-rays', bc_et, 'pairwise')
    if 'lift288' in variants:
        bench_one('lift288', bc_all, 'pairwise')


if __name__ == '__main__':
    main()
