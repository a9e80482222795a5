"""Stage attribution of the metrics-only frame via output-subset DCE (r4).

With the camera-ray branch out of the headline graph (perf_r4_metrics_only.py:
160 -> 92 ms/frame), the r3 attribution table no longer describes the frame.
Rather than monkey-patching stages, this probe exploits the same property the
headline rests on: XLA dead-code-eliminates everything a returned subset does
not need. Timing jits that return different output subsets of the SAME
forward yields stage costs by subtraction:

    occ_density            = encoder + lift + base/density convs + occ query
    occ (logits+density)   = ... + seg conv + full occ query
    pts_logits             = trunk + corner tables + point query
    det                    = trunk + BEV render + voxel_output + head + decode
    metrics = occ|pts|det  (the headline graph)

plus a standalone encoder jit (R50 + SECONDFPN + depth/context heads at
(B*N, 256, 704)) to split `trunk` into encoder vs lift+convs.

Methodology per bench.py: 2-deep pipelined dispatch, 10 frames, one f32
checksum output per jit (never per-stage fetches — the axon host fetch is
~25-30 ms and would swamp every number here).

Run on the TPU host: python scripts/perf_r4_attrib.py
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

    def checksum(outs):
        return sum(jnp.sum(x.astype(jnp.float32))
                   for x in jax.tree.leaves(outs))

    def make_fwd(keys, with_det=False):
        @jax.jit
        def fwd(v, imgs, mats, pts):
            fo, preds = model.apply(v, imgs, mats, points=pts, train=False)
            outs = [fo[k] for k in keys]
            if with_det:
                dec = decode_preds(preds, cfg.head)
                outs += [(d['bboxes'], d['scores'], d['labels'], d['valid'])
                         for d in dec]
            return checksum(outs)
        return fwd

    def make_encoder():
        B, N, H, W, _ = batch['imgs'].shape

        @jax.jit
        def fwd(v, imgs, mats, pts):
            def run(mdl, x):
                bk = mdl.backbone
                feats = bk._get_cam_feats(x.reshape(B * N, H, W, 3), False)
                depth = bk.mapping_along_depth(feats)
                low = bk.channel_lower(feats)
                return depth, low
            return checksum(model.apply(v, imgs, method=run))
        return fwd

    def timeit(fwd):
        args = [(variables, batch['imgs'] + 0.001 * i, mats, batch['points'])
                for i in range(4)]
        for a in args:
            np.asarray(a[1].ravel()[:1])
        np.asarray(fwd(*args[0]))
        np.asarray(fwd(*args[0]))
        n = 10
        t0 = time.perf_counter()
        pending = fwd(*args[0])
        for i in range(1, n):
            nxt = fwd(*args[i % 4])
            np.asarray(pending)
            pending = nxt
        np.asarray(pending)
        return (time.perf_counter() - t0) / n

    probes = [
        ('encoder', make_encoder()),
        ('occ_density', make_fwd(['occ_density'])),
        ('occ', make_fwd(['occ_logits', 'occ_density'])),
        ('pts', make_fwd(['pts_logits'])),
        ('det', make_fwd([], with_det=True)),
        ('metrics', make_fwd(['occ_logits', 'occ_density', 'pts_logits'],
                             with_det=True)),
    ]
    res = {}
    for name, fwd in probes:
        res[name] = timeit(fwd)
        print(f'[{name:12s}] {res[name] * 1000:7.1f} ms/frame', flush=True)

    print('\nderived (ms):', flush=True)
    print(f'  encoder                      {res["encoder"] * 1e3:6.1f}')
    print(f'  trunk (enc+lift+convs) ~     {res["occ_density"] * 1e3:6.1f} '
          f'(occ_density upper bound)')
    print(f'  seg conv + occ softmax       {(res["occ"] - res["occ_density"]) * 1e3:6.1f}')
    print(f'  tables + point query         {(res["pts"] - res["occ"]) * 1e3:6.1f} (vs occ)')
    print(f'  BEV render + head + decode   {(res["det"] - res["occ"]) * 1e3:6.1f} (vs occ)')
    print(f'  metrics whole                {res["metrics"] * 1e3:6.1f}')
    print(f'  subset overlap (occ+pts+det - 2*occ - metrics) '
          f'{(res["pts"] + res["det"] - res["occ"] - res["metrics"]) * 1e3:6.1f}')


if __name__ == '__main__':
    main()
