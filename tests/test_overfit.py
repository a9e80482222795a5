"""End-to-end training correctness: overfit a single synthetic batch.

If gradients, optimizer wiring, masks or any loss term had the wrong sign or
a stop-gradient bug, the total loss would not decrease steadily.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampire_tpu.data.synthetic import (consistent_batch, synthetic_batch,
                                        tiny_config)
from vampire_tpu.models.vampire import Vampire
from vampire_tpu.training.train_state import create_train_state
from vampire_tpu.training.train_step import build_train_step, split_mats

pytestmark = pytest.mark.slow


def test_overfit_single_batch():
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, loss_weights=(1., 1., 0., 1., 1.),
        basic_lr_per_img=1e-3 * 8, gradient_clip_val=10.0))
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.float32)
    # geometrically consistent scene: every term is learnable, so the
    # per-term assertions below can actually fail (synthetic_batch's noise
    # labels leave e.g. the depth term flat by construction)
    batch = consistent_batch(cfg, batch_size=1, n_points=128, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch['imgs'], mats, points=batch['points'],
        train=True))()
    state, tx = create_train_state(variables['params'],
                                   variables['batch_stats'], cfg.train,
                                   steps_per_epoch=10_000)
    # snapshot before the loop: donation consumes the original buffers
    stem0 = jax.tree.map(np.asarray,
                         variables['params']['backbone']['img_backbone']['stem'])
    step = jax.jit(build_train_step(model, cfg, tx, 1), donate_argnums=0)
    losses = []
    # per-term trajectories: a sign flip / dead branch in ONE term hides
    # inside a decreasing total (VERDICT r3 #6) — assert each active term
    terms = ['detection_loss', 'camera_depth_loss', 'camera_seg_loss',
             'bev_seg_loss', 'bev_height_loss', 'pts_seg_loss',
             'visible_occ_seg_loss', 'visible_occ_density_loss',
             'invisible_occ_density_loss', 'sdf_loss']
    hist = {k: [] for k in terms}
    for i in range(40):
        state, logs = step(state, batch)
        losses.append(float(logs['total_loss']))
        for k in terms:
            hist[k].append(float(logs[k]))
    assert np.isfinite(losses).all()
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < 0.7 * first, (first, last, losses[::8])
    for k in terms:
        # anchor at the early-window MAX: some terms dip, rebound, then
        # decline (bev_height does), which a first-5 mean reads as flat.
        # A dead term (max == last) and an increasing term still fail.
        f, l = np.max(hist[k][:5]), np.mean(hist[k][-5:])
        assert l < max(0.95 * f, f - 1e-4), (k, f, l, hist[k][::8])
    # the frozen stem must not have moved
    stem1 = state.params['backbone']['img_backbone']['stem']
    for a, b in zip(jax.tree.leaves(stem0), jax.tree.leaves(stem1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
