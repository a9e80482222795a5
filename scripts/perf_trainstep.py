"""Flagship train-step timing on the real TPU (VERDICT #3).

Round-1 baseline: 2.6 s/step at B=1 (backward ~6x forward), compile 335-757s.
Run: python scripts/perf_trainstep.py [--batch 1]
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--ray-fracs', action='store_true',
                    help='enable the length-sorted compact ray sampler '
                         '(train-mode) with the measured flagship curve')
    ap.add_argument('--ray-remat', choices=['on', 'off', 'config'],
                    default='config',
                    help="on = re-gather in backward, off = store the "
                         "compact sampler residuals, config = the shipped "
                         "default (False since 75f353c) — keeps BOTH paths "
                         "benchmarkable for the A/B the config cites")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    cache = enable_compilation_cache()
    print(f'compile cache: {cache}')
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.training.train_state import create_train_state
    from vampire_tpu.training.train_step import build_train_step, split_mats

    import dataclasses
    cfg = flagship_config()
    if args.ray_fracs:
        fr = (1.0, 1.0, 1.0, 0.98, 0.76, 0.62, 0.51, 0.43, 0.23, 0.11, 0.04)
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              ray_pass_fracs=fr))
    if args.ray_remat != 'config':
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(
                cfg.backbone, ray_remat=args.ray_remat == 'on'))
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
    batch = synthetic_batch(cfg, batch_size=args.batch,
                            n_points=cfg.train.max_points, seed=0,
                            mode='train')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)
    t0 = time.perf_counter()
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch['imgs'], mats, points=batch['points'],
        train=True))()
    state, tx = create_train_state(variables['params'],
                                   variables['batch_stats'], cfg.train,
                                   steps_per_epoch=1000)
    print(f'init: {time.perf_counter() - t0:.1f}s', flush=True)

    step = jax.jit(build_train_step(model, cfg, tx, num_devices=1))
    t0 = time.perf_counter()
    state, logs = step(state, batch)
    loss0 = float(logs['total_loss'])
    print(f'compile+step0: {time.perf_counter() - t0:.1f}s '
          f'loss={loss0:.3f}', flush=True)
    assert np.isfinite(loss0)

    ts = []
    for i in range(5):
        b = dict(batch)
        b['imgs'] = batch['imgs'] + 0.001 * (i + 1)
        t0 = time.perf_counter()
        state, logs = step(state, b)
        # force completion: fetch a scalar output
        _ = float(logs['total_loss'])
        ts.append(time.perf_counter() - t0)
    print(f'steady train step (B={args.batch}): {min(ts) * 1000:.0f} ms '
          f'(all: {[f"{t * 1000:.0f}" for t in ts]})')


if __name__ == '__main__':
    main()
