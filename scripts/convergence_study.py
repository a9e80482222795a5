"""Synthetic-data convergence study on the real TPU (accuracy evidence).

No nuScenes data exists in this environment (VERDICT round-1), so metric
parity cannot be validated directly. This drives the full flagship training
recipe (AdamW/MultiStep/clip/EMA-off, exactly cfg.train) on a small set of
synthetic batches for N steps and records per-term loss trajectories — the
strongest end-to-end training-correctness signal available here: every head
must learn ITS targets through the shared field, and any gradient-path bug
(dead branch, wrong mask, sign flip) shows up as a non-decreasing term.

With --data consistent (default) the study finishes with an END-TO-END
detection eval: the overfit model is decoded through the real test chain
(decode_preds -> circle NMS -> global-frame submission -> in-repo NDS/mAP)
and scored against the procedural scene's GT boxes — proof that learned
heatmaps decode into MATCHABLE boxes, not just that losses go down.

Run: python scripts/convergence_study.py [--steps 150] [--batches 4]
Writes scripts/convergence_study.json and prints first/last losses.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=150)
    ap.add_argument('--batches', type=int, default=4)
    ap.add_argument('--out', default='scripts/convergence_study.json')
    # 'consistent' = geometrically consistent procedural scene (r4): every
    # active loss term must be LEARNABLE, so a non-decreasing term is a bug.
    # 'noise' = the r1-r3 i.i.d.-label batch (kept for comparison).
    ap.add_argument('--data', choices=['consistent', 'noise'],
                    default='consistent')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import consistent_batch, synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.training.train_state import create_train_state
    from vampire_tpu.training.train_step import build_train_step, split_mats

    cfg = flagship_config()
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
    batches = []
    for i in range(args.batches):
        make = consistent_batch if args.data == 'consistent' else synthetic_batch
        b = make(cfg, batch_size=1, n_points=cfg.train.max_points,
                 seed=i, mode='train')
        batches.append({k: jnp.asarray(v) for k, v in b.items()})

    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batches[0]['imgs'], split_mats(batches[0]),
        points=batches[0]['points'], train=True))()
    state, tx = create_train_state(variables['params'],
                                   variables['batch_stats'], cfg.train,
                                   steps_per_epoch=max(args.steps, 1))
    step = jax.jit(build_train_step(model, cfg, tx, num_devices=1))

    keys = ['total_loss', 'detection_loss', 'camera_depth_loss',
            'camera_seg_loss', 'bev_seg_loss', 'bev_height_loss',
            'pts_seg_loss', 'visible_occ_seg_loss',
            'visible_occ_density_loss', 'invisible_occ_density_loss',
            'grad_norm']
    hist = {k: [] for k in keys}
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, logs = step(state, batches[i % len(batches)])
        if i == 0:
            print(f'compile+step0: {time.perf_counter() - t0:.0f}s',
                  flush=True)
        for k in keys:
            hist[k].append(float(logs[k]))
        if i % 25 == 0 or i == args.steps - 1:
            print(f'step {i:4d}  total {hist["total_loss"][-1]:8.3f}  '
                  f'det {hist["detection_loss"][-1]:7.3f}  '
                  f'occ {hist["visible_occ_seg_loss"][-1]:6.3f}  '
                  f'pts {hist["pts_seg_loss"][-1]:6.3f}  '
                  f'gn {hist["grad_norm"][-1]:8.1f}', flush=True)
    dt = time.perf_counter() - t0

    def avg(xs):
        return sum(xs) / len(xs)

    summary = {}
    n_avg = max(1, min(10, args.steps // 5))
    for k in keys:
        first = avg(hist[k][:n_avg])
        last = avg(hist[k][-n_avg:])
        summary[k] = dict(first=round(first, 4), last=round(last, 4),
                          ratio=round(last / first, 4) if first else None)
        print(f'{k:28s} {first:10.4f} -> {last:10.4f}')
    # ---- end-to-end detection metric on the overfit scenes (r4) ----
    # Losses decreasing proves gradients flow; this proves the learned
    # heatmaps actually DECODE into matchable boxes through the SAME
    # post-processing chain the real eval uses (trainer._test):
    # decode_preds -> circle NMS -> global-frame submission ->
    # in-repo NDS/mAP (evaluation/nusc_metric.py) vs the scene's GT.
    det_eval = None
    if args.data == 'consistent':
        import tempfile
        from vampire_tpu.models.centerpoint_head import decode_preds
        from vampire_tpu.evaluation.det_evaluator import (DetNuscEvaluator,
                                                          apply_circle_nms)

        @jax.jit
        def det_step(params, batch_stats, batch):
            mats = split_mats(batch)
            _, preds = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                batch['imgs'], mats, points=batch['points'], train=False)
            return decode_preds(preds, cfg.head)

        results, metas, gt_by_token = [], [], {}
        for i, b in enumerate(batches):
            out = jax.device_get(det_step(state.params, state.batch_stats, b))
            results.append(apply_circle_nms(out, cfg.head, 0))
            token = f'scene{i}'
            metas.append(dict(token=token,
                              ego2global_rotation=[1.0, 0.0, 0.0, 0.0],
                              ego2global_translation=[0.0, 0.0, 0.0]))
            gts = []
            # GT dicts in submission conventions: decoded dims round-trip
            # the scene's (w, l, h) verbatim through assign_targets/decode,
            # and format_bbox writes size = box[[4, 3, 5]]; the ego pose is
            # identity so global == ego and ego_translation == translation.
            for box in np.asarray(b['gt_boxes_list'])[0]:
                speed = float(np.hypot(box[7], box[8]))
                gts.append(dict(
                    translation=[float(box[0]), float(box[1]), float(box[2])],
                    size=[float(box[4]), float(box[3]), float(box[5])],
                    rotation=[float(np.cos(box[6] / 2)), 0.0, 0.0,
                              float(np.sin(box[6] / 2))],
                    velocity=[float(box[7]), float(box[8])],
                    detection_name='car',
                    attribute_name=('vehicle.moving' if speed > 0.2
                                    else 'vehicle.parked'),
                    num_pts=10,
                    ego_translation=[float(box[0]), float(box[1]),
                                     float(box[2])]))
            gt_by_token[token] = gts
        classes = [c for t in cfg.head.tasks for c in t]
        ev = DetNuscEvaluator(class_names=classes,
                              output_dir=tempfile.mkdtemp())
        detail = ev.evaluate(results, metas, gt_boxes=gt_by_token)
        pfx = 'img_bbox_NuScenes'
        det_eval = dict(
            car_ap={th: detail[f'{pfx}/car_AP_dist_{th}']
                    for th in ('0.5', '1.0', '2.0', '4.0')},
            car_trans_err=detail[f'{pfx}/car_trans_err'],
            car_scale_err=detail[f'{pfx}/car_scale_err'],
            car_orient_err=detail[f'{pfx}/car_orient_err'],
            mAP=detail[f'{pfx}/mAP'], NDS=detail[f'{pfx}/NDS'],
            n_pred_boxes=int(sum(len(r[0]) for r in results)),
            n_gt_boxes=int(sum(len(v) for v in gt_by_token.values())))
        print(f'overfit det eval: car AP {det_eval["car_ap"]}  '
              f'ATE {det_eval["car_trans_err"]:.3f}  '
              f'NDS {det_eval["NDS"]:.4f}')

    with open(args.out, 'w') as f:
        json.dump(dict(steps=args.steps, batches=args.batches,
                       wall_s=round(dt, 1), summary=summary,
                       det_eval=det_eval, history=hist),
                  f)
    print(f'wrote {args.out} ({args.steps} steps, {dt:.0f}s)')

    decreasing = [k for k in keys[:-1]
                  if summary[k]['last'] < summary[k]['first']]
    print(f'decreasing terms: {len(decreasing)}/{len(keys) - 1}')


if __name__ == '__main__':
    main()
