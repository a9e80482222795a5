"""Library-surface drive on the real TPU (verify recipe #2).

Full flagship forward on synthetic data: checks shapes, finiteness, value
ranges (depth in d_bound, rgb in [0,1], occ_density in [-1,1]) and prints
steady-state latency.

Run: python scripts/drive_tpu.py
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
    c = cfg.backbone
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
    batch = synthetic_batch(cfg, batch_size=1, n_points=cfg.train.max_points,
                            seed=0, mode='val')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch['imgs'], mats, points=batch['points'],
        train=False))()

    @jax.jit
    def fwd(v, imgs):
        fo, preds = model.apply(v, imgs, mats, points=batch['points'],
                                train=False)
        dec = decode_preds(preds, cfg.head)
        return fo, dec

    t0 = time.perf_counter()
    fo, dec = fwd(variables, batch['imgs'])
    host = {k: np.asarray(v) for k, v in fo.items() if v is not None}
    print(f'[compile+run] {time.perf_counter() - t0:.1f}s', flush=True)

    ok = True
    for k, v in host.items():
        finite = np.isfinite(v).all()
        ok &= bool(finite)
        print(f'  {k:22s} {str(v.shape):24s} finite={bool(finite)} '
              f'min={v.min():.3f} max={v.max():.3f}')
    d = host['depth_preds']
    assert d.min() >= 0.0 and d.max() <= c.d_bound[1] + 1.0, (d.min(), d.max())
    assert host['rgb_preds'].min() >= -1e-3
    assert host['rgb_preds'].max() <= 1.0 + 1e-3
    assert np.abs(host['occ_density']).max() <= 1.0 + 1e-5
    b0 = np.asarray(dec[0]['bboxes'])
    # dims go through exp() (CenterPointBBoxCoder semantics) and can overflow
    # at random init, exactly like the reference; centers/rot/vel and scores
    # must be finite regardless.
    assert np.isfinite(np.concatenate([b0[..., :3], b0[..., 6:]], -1)).all()
    assert np.isfinite(np.asarray(dec[0]['scores'])).all()
    assert ok, 'non-finite outputs'

    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        fo, dec = fwd(variables, batch['imgs'] + 0.001 * i)
        np.asarray(fo['occ_logits'].ravel()[:1])
        np.asarray(dec[0]['bboxes'].ravel()[:1])
        ts.append(time.perf_counter() - t0)
    print(f'[steady fetch-per-iter] {min(ts)*1e3:.1f} ms')
    print('DRIVE OK')


if __name__ == '__main__':
    main()
