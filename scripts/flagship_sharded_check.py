"""Flagship-SHAPE sharded-vs-unsharded numerics check (VERDICT r2 weak #4).

Round-2 multichip evidence was tiny-shape only; this script compiles and
runs the camera-sharded flagship model (6-cam 256x704, full 20x256x256 seg
grid, lift_vectorized so the camera sum lowers to a collective) on a
2-device mesh (dp=1 x cam=2) and asserts the outputs match the unsharded
single-device run. Only one real TPU chip is reachable in this environment,
so the mesh is the virtual CPU one (the script self-bootstraps the env vars
exactly like __graft_entry__.dryrun_multichip); the sharding/layout bugs
this hunts (padding, collective placement, per-shard shape mismatches at
REAL shapes) are platform-independent.

Modes:
  fwd   : eval-mode forward, compares the full output dict (default).
  train : one full train step (loss + grads + optimizer), compares loss and
          a parameter-update norm. ~10x slower on 1 CPU core.

Run: python scripts/flagship_sharded_check.py [--mode fwd|train]
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _bootstrap(n_devices: int, mode: str) -> None:
    env = dict(os.environ)
    env['_VAMPIRE_SHARDCHECK_BOOTSTRAPPED'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={n_devices}'
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--mode', mode],
        env=env, cwd=ROOT, timeout=14400)
    sys.exit(proc.returncode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', default='fwd', choices=['fwd', 'train'])
    args = ap.parse_args()

    if not os.environ.get('_VAMPIRE_SHARDCHECK_BOOTSTRAPPED'):
        _bootstrap(2, args.mode)
        return

    sys.path.insert(0, ROOT)
    import jax
    # the env var alone is not enough in this image (a sitecustomize
    # registers the TPU backend eagerly) — force the platform, as
    # tests/conftest.py does
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.device_count() >= 2 and jax.devices()[0].platform == 'cpu', (
        jax.devices())

    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.parallel.mesh import make_mesh, batch_pspecs
    from vampire_tpu.training.train_step import split_mats

    cfg = flagship_config()
    mesh = make_mesh(dp=1, cam=2)
    # lift_remat on: the flagship backward at full shapes exceeds host RAM
    # on the virtual-CPU mesh without it (the TPU default is off for speed)
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.float32,
                    lift_vectorized=True, lift_remat=(args.mode == 'train'))
    batch = synthetic_batch(cfg, batch_size=1,
                            n_points=cfg.train.max_points, seed=3,
                            mode='val' if args.mode == 'fwd' else 'train')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)
    print(f'[shardcheck] flagship shapes: imgs {batch["imgs"].shape}, '
          f'seg grid {cfg.backbone.grid_zyx("seg")}', flush=True)

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch['imgs'], mats, points=batch['points'],
        train=(args.mode == 'train')))()

    def place(sharded: bool):
        if sharded:
            specs = batch_pspecs(batch)
            b = {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
                 for k, v in batch.items()}
            rep = NamedSharding(mesh, P())
            return b, rep
        dev = jax.devices()[0]
        return ({k: jax.device_put(v, dev) for k, v in batch.items()},
                dev)

    if args.mode == 'fwd':
        def fwd(v, b):
            m = split_mats(b)
            fo, preds = model.apply(v, b['imgs'], m, points=b['points'],
                                    train=False)
            outs = {k: x for k, x in fo.items() if x is not None}
            for i, p in enumerate(preds):
                for k, x in p.items():
                    outs[f'head{i}_{k}'] = x
            return outs

        results = {}
        for tag, sharded in (('unsharded', False), ('cam=2', True)):
            b, vdst = place(sharded)
            v = jax.device_put(variables, vdst)
            out = jax.jit(fwd)(v, b)
            results[tag] = jax.tree.map(np.asarray, out)
            print(f'[shardcheck] {tag} forward done', flush=True)

        worst = 0.0
        for k in results['unsharded']:
            a, b_ = results['unsharded'][k], results['cam=2'][k]
            scale = max(1e-6, float(np.abs(a).max()))
            rel = float(np.abs(a - b_).max()) / scale
            worst = max(worst, rel)
            print(f'  {k:28s} max_rel_diff {rel:.3e}')
        assert worst < 5e-4, f'sharded forward diverges: {worst}'
        print(f'[shardcheck] OK — worst max_rel_diff {worst:.3e} < 5e-4')
    else:
        from vampire_tpu.training.train_state import create_train_state
        from vampire_tpu.training.train_step import build_train_step
        losses = {}
        upd = {}
        for tag, sharded in (('unsharded', False), ('cam=2', True)):
            state, tx = create_train_state(variables['params'],
                                           variables['batch_stats'],
                                           cfg.train, steps_per_epoch=100)
            step = jax.jit(build_train_step(model, cfg, tx, num_devices=1))
            b, vdst = place(sharded)
            s = jax.device_put(state, vdst if not sharded
                               else NamedSharding(mesh, P()))
            new_state, metrics = step(s, b)
            losses[tag] = float(metrics['total_loss'])
            delta = jax.tree.map(lambda a, c: jnp.sum((a - c) ** 2),
                                 new_state.params, state.params)
            upd[tag] = float(jnp.sqrt(sum(jax.tree.leaves(delta))))
            print(f'[shardcheck] {tag} loss {losses[tag]:.6f} '
                  f'update_norm {upd[tag]:.6f}', flush=True)
        rel = abs(losses['unsharded'] - losses['cam=2']) / max(
            1e-6, abs(losses['unsharded']))
        reln = abs(upd['unsharded'] - upd['cam=2']) / max(1e-6,
                                                          upd['unsharded'])
        assert rel < 1e-4 and reln < 1e-3, (losses, upd)
        print(f'[shardcheck] OK — loss rel diff {rel:.3e}, '
              f'update-norm rel diff {reln:.3e}')


if __name__ == '__main__':
    main()
