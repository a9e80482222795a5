"""End-to-end smoke tests: full model forward, losses, gradients (tiny CPU cfg).

Everything heavy is jitted once in a module fixture (this box has ONE cpu
core — eager op-by-op execution is prohibitively slow).
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vampire_tpu.data.synthetic import synthetic_batch, tiny_config
from vampire_tpu.models.vampire import Vampire
from vampire_tpu.models.centerpoint_head import decode_preds
from vampire_tpu.training.losses import compute_losses

pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def setup():
    cfg = tiny_config()
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.float32)
    batch = synthetic_batch(cfg, batch_size=1, n_points=128, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = {k: batch[k] for k in ('sensor2ego', 'intrin', 'ida', 'bda')}
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch['imgs'], mats, points=batch['points'],
        train=False))()
    fwd = jax.jit(functools.partial(model.apply, train=False),
                  static_argnames=('lidar_seg',))
    fo, preds = fwd(variables, batch['imgs'], mats, points=batch['points'])
    return cfg, model, batch, mats, variables, fwd, fo, preds


def test_forward_shapes(setup):
    cfg, model, batch, mats, variables, fwd, fo, preds = setup
    B = batch['imgs'].shape[0]
    K = cfg.backbone.num_classes
    fH, fW = cfg.backbone.final_dim
    assert fo['rgb_preds'].shape == (B, 6, fH, fW, 3)
    assert fo['seg_logits_preds'].shape == (B, 6, fH, fW, K)
    assert fo['depth_preds'].shape == (B, 6, fH, fW)
    gx, gy, gz = cfg.backbone.occ_grid
    assert fo['occ_logits'].shape == (B, gx, gy, gz, K)
    assert fo['occ_density'].shape == (B, gx, gy, gz)
    assert fo['pts_logits'].shape == (B, 128, K)
    Zd, Yd, Xd = cfg.backbone.grid_zyx('det')
    assert fo['bev_seg_logits_preds'].shape == (B, Yd, Xd, K)
    assert fo['bev_density'].shape == (B, Zd, Yd, Xd)
    assert len(preds) == 6
    W = cfg.head.feature_map_size[0]
    assert preds[0]['heatmap'].shape == (B, W, W, 1)
    assert preds[0]['reg'].shape == (B, W, W, 2)
    for v in jax.tree.leaves(fo):
        assert np.all(np.isfinite(np.asarray(v)))


def test_lidar_seg_eval_path(setup):
    cfg, model, batch, mats, variables, fwd, _, _ = setup
    fo, preds = fwd(variables, batch['imgs'], mats, points=batch['points'],
                    lidar_seg=True)
    assert preds is None
    assert fo['pts_logits'] is not None


def test_losses_and_grads(setup):
    cfg, model, batch, mats, variables, fwd, _, _ = setup
    params = variables['params']
    other = {k: v for k, v in variables.items() if k != 'params'}
    # enable the sdf/density terms: at init the Laplace density is saturated
    # (bias = sdf_bias - 10, render_utils semantics), so density_conv only
    # receives gradient through those direct terms — same as the reference.
    tcfg = dataclasses.replace(cfg.train, loss_weights=(1., 1., 0., 1., 1.))

    def loss_fn(p):
        out, _ = model.apply(
            {'params': p, **other}, batch['imgs'], mats,
            points=batch['points'], train=True, mutable=['batch_stats'])
        fo, preds = out
        total, logs = compute_losses(fo, preds, batch, tcfg, cfg.head,
                                     cfg.backbone.sdf_bias)
        return total, logs

    (total, logs), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert np.isfinite(float(total))
    for k, v in logs.items():
        assert np.isfinite(float(v)), k
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    nonzero = {jax.tree_util.keystr(p): float(jnp.abs(g).sum())
               for p, g in flat}
    assert any('density_conv' in k and v > 0 for k, v in nonzero.items())
    assert any('seg_conv' in k and v > 0 for k, v in nonzero.items())
    assert any('task0' in k and v > 0 for k, v in nonzero.items())
    assert any('img_neck' in k and v > 0 for k, v in nonzero.items())
    # frozen stem: no gradient flows into the image stem
    stem = [v for k, v in nonzero.items()
            if 'img_backbone' in k and 'stem' in k]
    assert stem and all(v == 0.0 for v in stem)


def test_decode_shapes(setup):
    cfg, model, batch, mats, variables, fwd, fo, preds = setup
    decoded = jax.jit(lambda p: decode_preds(p, cfg.head))(preds)
    assert len(decoded) == 6
    for d in decoded:
        assert d['bboxes'].shape == (1, cfg.head.max_num, 9)
        assert d['scores'].shape == (1, cfg.head.max_num)
        assert d['valid'].dtype == jnp.bool_


def test_multisweep_single_frame_parity(setup):
    """The (B, F=1, N, ...) multi-frame layout is BIT-identical to the
    squeezed (B, N, ...) layout (field.py multi-sweep contract)."""
    cfg, model, batch, mats, variables, fwd, fo, preds = setup
    imgs_f = batch['imgs'][:, None]
    mats_f = dict(mats, **{k: mats[k][:, None]
                           for k in ('sensor2ego', 'intrin', 'ida')})
    fo2, preds2 = fwd(variables, imgs_f, mats_f, points=batch['points'])
    for k, v in fo.items():
        np.testing.assert_array_equal(np.asarray(v), np.asarray(fo2[k]), k)
    for p, p2 in zip(preds, preds2):
        for k in p:
            np.testing.assert_array_equal(np.asarray(p[k]),
                                          np.asarray(p2[k]), k)


def test_multisweep_two_frames(setup):
    """num_sweeps=2 temporal fusion forward (VERDICT r3 #5; the reference
    raises NotImplementedError at base_vampire2.py:690-693 — this is our
    design: sweep frames fold into the camera axis and fuse through the
    masked camera mean).

    A sweep frame that DUPLICATES the key frame doubles both the masked-mean
    numerator and denominator, so the fused field must match the
    single-frame forward (up to the 1e-6 denominator epsilon); losses over
    the multi-frame batch must slice the key frame's labels and stay finite.
    """
    cfg, model, batch, mats, variables, fwd, fo, preds = setup
    imgs_f = jnp.concatenate([batch['imgs'][:, None]] * 2, axis=1)
    mats_f = dict(mats, **{
        k: jnp.concatenate([mats[k][:, None]] * 2, axis=1)
        for k in ('sensor2ego', 'intrin', 'ida')})
    fo2, preds2 = fwd(variables, imgs_f, mats_f, points=batch['points'])
    for k in ('depth_preds', 'occ_logits', 'bev_seg_logits_preds',
              'pts_logits', 'bev_feature'):
        np.testing.assert_allclose(np.asarray(fo[k]), np.asarray(fo2[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)
    # multi-frame batch through the loss stack (labels carry a frame axis)
    batch_f = dict(batch, imgs=imgs_f,
                   depth_labels=jnp.concatenate(
                       [batch['depth_labels'][:, None]] * 2, axis=1),
                   seg_labels=jnp.concatenate(
                       [batch['seg_labels'][:, None]] * 2, axis=1))
    total, logs = jax.jit(lambda fo_, preds_: compute_losses(
        fo_, preds_, batch_f, cfg.train, cfg.head,
        cfg.backbone.sdf_bias))(fo2, preds2)
    assert np.isfinite(float(total))
    for k, v in logs.items():
        assert np.isfinite(float(v)), k


def test_coverage_diagnostics_sown(setup):
    """ADVICE r2: the block-compacted lift and the early-termination ray
    sampler sow coverage-violation counters under the 'diagnostics'
    collection, so rigs/scenes outside the measured margins are detectable
    instead of silently degraded. On the synthetic rig both must be 0."""
    cfg, model, batch, mats, variables, fwd, fo, preds = setup
    # enable early termination at tiny shapes: S=7 samples, chunk 4 ->
    # 2 passes, prefix 1, one post-sort pass with full cap (exact)
    bc = dataclasses.replace(cfg.backbone, ray_et_chunk=4, ray_et_prefix=1,
                             ray_et_fracs=(1.0,))
    model2 = Vampire(bc, cfg.head, dtype=jnp.float32)
    (fo2, _), aux = model2.apply(
        variables, batch['imgs'], mats, points=batch['points'], train=False,
        mutable=['diagnostics'])
    diags = aux['diagnostics']['backbone']
    assert int(diags['lift_dropped_blocks'][0]) == 0
    assert int(diags['ray_et_uncovered_drops'][0]) == 0
    # the full-cap ET forward matches the dense forward
    np.testing.assert_allclose(np.asarray(fo2['depth_preds']),
                               np.asarray(fo['depth_preds']),
                               rtol=2e-4, atol=2e-4)


def test_camera_renders_off_parity(setup):
    """camera_renders=False (the metrics-graph fast path, round 5: skips the
    corner-table build and the camera ray branch) must reproduce the full
    graph's metric-feeding outputs: occ/bev/det exactly (same ops), point
    queries to bf16-input tolerance (direct 8-take sampler vs the shared
    corner-table gather — same math, different reduction order)."""
    cfg, model, batch, mats, variables, fwd, fo, preds = setup
    fo2, preds2 = jax.jit(functools.partial(
        model.apply, train=False, camera_renders=False))(
            variables, batch['imgs'], mats, points=batch['points'])
    assert fo2['rgb_preds'] is None
    assert fo2['seg_logits_preds'] is None
    assert fo2['depth_preds'] is None
    for k in ('occ_logits', 'occ_density', 'bev_seg_logits_preds',
              'bev_height_preds', 'bev_rgb_preds', 'bev_feature'):
        np.testing.assert_allclose(np.asarray(fo[k]), np.asarray(fo2[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(fo['pts_logits']),
                               np.asarray(fo2['pts_logits']),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(fo['pts_sdf']),
                               np.asarray(fo2['pts_sdf']),
                               rtol=2e-2, atol=2e-2)
    for p1, p2 in zip(preds, preds2):
        for k in p1:
            np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]),
                                       rtol=1e-6, atol=1e-6)
