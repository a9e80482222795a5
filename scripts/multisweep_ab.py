"""F=1 vs F=2 temporal-fusion accuracy A/B (VERDICT r4 #6b).

Trains two identical tiny-config models on geometrically consistent
procedural scenes — one on key frames only (F=1), one with a moving-ego
sweep frame folded in (F=2, ego 0.6 m behind; consistent_batch
sweep_offsets) — and compares HELD-OUT-scene losses. The scenes per seed are
identical across arms (the sweep rig only adds views), so validation labels
match and the comparison isolates what temporal fusion contributes.

Also decides VERDICT #6c (sweep-view depth supervision): the F=2 arm's
sweep-frame depth/seg maps are built by the data pipeline but losses.py
supervises frame 0 only; arm 'sweep_sup' additionally supervises the sweep
views' RENDERED... — no: renders exist for the key frame only, so the only
cheap sweep supervision would be on the depth softmax, which the reference
does not supervise anywhere (its depth loss is render-based). The decision
is recorded from the A/B numbers: if plain F=2 fusion does not move val
losses on static scenes, per-sweep-view softmax supervision (a deviation
with no reference analog) stays out.

Run: python scripts/multisweep_ab.py [--steps 150]
Writes scripts/multisweep_ab.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=150)
    ap.add_argument('--train-scenes', type=int, default=3)
    ap.add_argument('--val-scenes', type=int, default=3)
    ap.add_argument('--out', default='scripts/multisweep_ab.json')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from vampire_tpu.configs import VampireConfig
    from vampire_tpu.data.synthetic import consistent_batch, tiny_config
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.training.losses import compute_losses
    from vampire_tpu.training.train_state import create_train_state
    from vampire_tpu.training.train_step import build_train_step, split_mats

    cfg = tiny_config()
    val_keys = ['camera_depth_loss', 'camera_seg_loss', 'pts_seg_loss',
                'visible_occ_seg_loss', 'bev_seg_loss', 'detection_loss',
                'total_loss']

    def make(seed, sweeps):
        b = consistent_batch(cfg, batch_size=1,
                             n_points=cfg.train.max_points, n_boxes=4,
                             seed=seed, mode='train',
                             sweep_offsets=(0.6,) if sweeps else ())
        return {k: jnp.asarray(v) for k, v in b.items()
                if k != 'gt_boxes_list'}

    def run_arm(sweeps: bool):
        train = [make(s, sweeps) for s in range(args.train_scenes)]
        val = [make(100 + s, sweeps) for s in range(args.val_scenes)]
        model = Vampire(cfg.backbone, cfg.head, dtype=jnp.float32)
        variables = jax.jit(lambda b: model.init(
            jax.random.PRNGKey(0), b['imgs'], split_mats(b),
            points=b['points'], train=True))(train[0])
        state, tx = create_train_state(variables['params'],
                                       variables['batch_stats'], cfg.train,
                                       steps_per_epoch=args.steps)
        step = jax.jit(build_train_step(model, cfg, tx, num_devices=1))

        @jax.jit
        def val_losses(params, batch_stats, batch):
            fo, preds = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                batch['imgs'], split_mats(batch), points=batch['points'],
                train=False)
            _, logs = compute_losses(fo, preds, batch, cfg.train, cfg.head,
                                     cfg.backbone.sdf_bias,
                                     cfg.backbone.density_mode)
            return {k: logs[k] for k in val_keys}

        t0 = time.perf_counter()
        for i in range(args.steps):
            state, logs = step(state, train[i % len(train)])
            if i % 50 == 0:
                print(f'  [{"F=2" if sweeps else "F=1"}] step {i} '
                      f'total {float(logs["total_loss"]):.3f}', flush=True)
        res = {k: [] for k in val_keys}
        for vb in val:
            out = val_losses(state.params, state.batch_stats, vb)
            for k in val_keys:
                res[k].append(float(out[k]))
        print(f'  arm done in {time.perf_counter() - t0:.0f}s', flush=True)
        return {k: round(float(np.mean(v)), 4) for k, v in res.items()}

    r1 = run_arm(False)
    r2 = run_arm(True)
    rel = {k: round(r2[k] / r1[k], 3) if r1[k] else None for k in val_keys}
    out = dict(steps=args.steps, f1=r1, f2=r2, f2_over_f1=rel)
    print(json.dumps(out, indent=1))
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
