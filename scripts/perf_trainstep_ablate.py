"""Backward-pass attribution for the flagship train step (VERDICT #3).

Times the FULL jitted train step with stop_gradient inserted at one
boundary at a time; the delta vs baseline is the cost of differentiating
through that component (its transpose + any remat recompute it triggers).

Boundaries:
  base            : no patch (reference number)
  sg_rays         : stop_gradient on the corner table entering the ray
                    sampler AND the point-query sampler (kills the big
                    table-cotangent scatters + table->vol adjoint)
  sg_lift         : stop_gradient on the lift output voxel features (kills
                    lift-gather transpose AND the image-encoder backward)
  sg_camfeats     : stop_gradient on the image-encoder output (isolates the
                    conv-encoder backward from the lift-gather transpose)
  no_lift_remat   : lift_remat=False (no per-camera recompute in backward)

Run: python scripts/perf_trainstep_ablate.py [--variants a,b]
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--variants', default='all')
    ap.add_argument('--batch', type=int, default=1)
    args = ap.parse_args()
    names = ['base', 'sg_rays', 'sg_lift', 'sg_camfeats', 'no_lift_remat',
             'fwd_only', 'ce_only', 'sg_unet', 'sg_losses_aux']
    variants = names if args.variants == 'all' else args.variants.split(',')

    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.models import field as field_mod
    from vampire_tpu.core import sampling as S
    from vampire_tpu.training.train_state import create_train_state
    from vampire_tpu.training.train_step import build_train_step, split_mats

    cfg = flagship_config()
    batch = synthetic_batch(cfg, batch_size=args.batch,
                            n_points=cfg.train.max_points, seed=0,
                            mode='train')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    results = {}

    def run(name, patches=(), lift_remat=True):
        model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16,
                        lift_remat=lift_remat)
        saved = [(obj, attr, getattr(obj, attr)) for obj, attr, _ in patches]
        for obj, attr, new in patches:
            setattr(obj, attr, new)
        try:
            mats = split_mats(batch)
            variables = jax.jit(lambda: model.init(
                jax.random.PRNGKey(0), batch['imgs'], mats,
                points=batch['points'], train=True))()
            state, tx = create_train_state(variables['params'],
                                           variables['batch_stats'],
                                           cfg.train, steps_per_epoch=1000)
            step = jax.jit(build_train_step(model, cfg, tx, num_devices=1))
            t0 = time.perf_counter()
            state, logs = step(state, batch)
            l0 = float(logs['total_loss'])
            print(f'[{name}] compile+step0 {time.perf_counter() - t0:.0f}s '
                  f'loss={l0:.2f}', flush=True)
            ts = []
            for i in range(4):
                b = dict(batch)
                b['imgs'] = batch['imgs'] + 0.001 * (i + 1)
                t0 = time.perf_counter()
                state, logs = step(state, b)
                _ = float(logs['total_loss'])
                ts.append(time.perf_counter() - t0)
            results[name] = min(ts)
            print(f'[{name}] {min(ts) * 1000:.0f} ms', flush=True)
        except Exception as e:
            print(f'[{name}] FAILED {type(e).__name__}: {str(e)[:300]}',
                  flush=True)
        finally:
            for obj, attr, old in saved:
                setattr(obj, attr, old)

    orig_table = S.build_neighborhood_table

    def sg_table(vol):
        return orig_table(jax.lax.stop_gradient(vol))

    orig_lift = field_mod.FieldBackbone._lift

    def sg_lift(self, depth, feat, mats):
        return jax.lax.stop_gradient(orig_lift(self, depth, feat, mats))

    orig_cam = field_mod.FieldBackbone._get_cam_feats

    def sg_cam(self, imgs, train):
        return jax.lax.stop_gradient(orig_cam(self, imgs, train))

    if 'base' in variants:
        run('base')
    if 'sg_rays' in variants:
        run('sg_rays', patches=[(S, 'build_neighborhood_table', sg_table)])
    if 'sg_lift' in variants:
        run('sg_lift',
            patches=[(field_mod.FieldBackbone, '_lift', sg_lift)])
    if 'sg_camfeats' in variants:
        run('sg_camfeats',
            patches=[(field_mod.FieldBackbone, '_get_cam_feats', sg_cam)])
    if 'no_lift_remat' in variants:
        run('no_lift_remat', lift_remat=False)

    # --- decomposition of the residual: forward-only / lovasz / unet -------
    if 'fwd_only' in variants:
        # train-mode forward + losses WITHOUT value_and_grad: separates the
        # forward half of the step from every transpose
        from vampire_tpu.training.losses import compute_losses
        model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
        mats = split_mats(batch)
        variables = jax.jit(lambda: model.init(
            jax.random.PRNGKey(0), batch['imgs'], mats,
            points=batch['points'], train=True))()

        @jax.jit
        def fwd_loss(v, b):
            m = split_mats(b)
            (fo, preds), _ = model.apply(
                v, b['imgs'], m, points=b['points'], train=True,
                mutable=['batch_stats'])
            total, logs = compute_losses(fo, preds, b, cfg.train, cfg.head,
                                         cfg.backbone.sdf_bias,
                                         cfg.backbone.density_mode, 1)
            return total
        t0 = time.perf_counter()
        _ = float(fwd_loss(variables, batch))
        print(f'[fwd_only] compile {time.perf_counter() - t0:.0f}s',
              flush=True)
        ts = []
        for i in range(4):
            b = dict(batch)
            b['imgs'] = batch['imgs'] + 0.001 * (i + 1)
            t0 = time.perf_counter()
            _ = float(fwd_loss(variables, b))
            ts.append(time.perf_counter() - t0)
        results['fwd_only'] = min(ts)
        print(f'[fwd_only] {min(ts) * 1000:.0f} ms', flush=True)

    from vampire_tpu.training import losses as losses_mod
    from vampire_tpu.ops.lovasz import masked_cross_entropy

    if 'ce_only' in variants:
        run('ce_only',
            patches=[(losses_mod, 'ce_lovasz',
                      lambda lg, lb, v=None: masked_cross_entropy(lg, lb, v))])

    from vampire_tpu.models.unet3d import Unet3D
    orig_unet_call = Unet3D.__call__

    def sg_unet_call(self, x):
        return jax.lax.stop_gradient(orig_unet_call(self, x))

    if 'sg_unet' in variants:
        run('sg_unet', patches=[(Unet3D, '__call__', sg_unet_call)])

    if 'sg_losses_aux' in variants:
        # stop gradients of every non-det loss term EXCEPT through the det
        # path: attribution of the aux-loss transposes as a group.
        # train_step.py binds `compute_losses` at import time, so patch the
        # train_step module's name.
        from vampire_tpu.training import train_step as train_step_mod
        orig_cl = losses_mod.compute_losses

        def sg_compute(fo, preds, b, tc, hc, sb, dm, nd):
            fo = {k: (jax.lax.stop_gradient(v) if v is not None else None)
                  for k, v in fo.items()}
            return orig_cl(fo, preds, b, tc, hc, sb, dm, nd)
        run('sg_losses_aux',
            patches=[(train_step_mod, 'compute_losses', sg_compute)])

    print('\n=== train-step backward attribution (ms) ===', flush=True)
    for k, v in results.items():
        print(f'{k:16s} {v * 1000:7.0f}')
    if 'base' in results:
        b = results['base']
        for k, v in results.items():
            if k != 'base':
                print(f'{k:16s} delta {1000 * (b - v):7.0f} ms')


if __name__ == '__main__':
    main()
