"""Headline benchmark: flagship 6-cam 256x704 multi-task inference fps/chip.

Runs the full flagship forward (field + occ/lidarseg queries + both render
branches + det head + device-side CenterPoint decode) on synthetic nuScenes-
shaped inputs, batch 1, on one chip, and prints ONE JSON line.

vs_baseline uses a nominal 5.0 fps A100 estimate for the reference model
(the reference publishes no throughput numbers — BASELINE.md notes the A100
denominator must be measured; 5 fps is a documented placeholder for a
ResNet-50 6-view model with 86-bin lifting, a 3D U-Net over 20x256x256 and
dense volume rendering in fp16 on A100).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
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

    @jax.jit
    def fwd(v, imgs, mats, pts):
        fo, preds = model.apply(v, imgs, mats, points=pts, train=False)
        dec = decode_preds(preds, cfg.head)
        outs = (fo['occ_logits'], fo['occ_density'], fo['pts_logits'],
                fo['depth_preds'], fo['bev_seg_logits_preds'],
                [(d['bboxes'], d['scores'], d['labels'], d['valid'])
                 for d in dec])
        # fold every output into one scalar so timing needs a single host
        # fetch (fetch roundtrips through the axon tunnel are ~30ms each)
        checksum = sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(outs))
        return checksum

    def sync(out):
        # block_until_ready is unreliable on the axon backend; fetch forces
        # the step to complete
        for x in jax.tree.leaves(out):
            np.asarray(x)

    args = (variables, batch['imgs'], mats, batch['points'])
    sync(fwd(*args))  # compile
    sync(fwd(*args))  # warm
    # vary the input each iteration and fetch per iteration: conservative,
    # honest timing (queued timing under-reports through the axon relay)
    imgs_v = [batch['imgs'] + 0.001 * i for i in range(4)]
    for x in imgs_v:
        np.asarray(x.ravel()[:1])
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        out = fwd(variables, imgs_v[i % 4], mats, batch['points'])
        sync(out)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    fps = 1.0 / dt

    baseline_a100_fps = 5.0  # documented placeholder (see module docstring)
    print(json.dumps({
        'metric': '6-cam 256x704 multi-task inference frames/sec/chip',
        'value': round(fps, 3),
        'unit': 'fps',
        'vs_baseline': round(fps / baseline_a100_fps, 3),
    }))


if __name__ == '__main__':
    main()
