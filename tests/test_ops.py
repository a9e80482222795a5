"""Tests for lovasz / msssim / focal / target assignment / NMS ops."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vampire_tpu.configs import HeadConfig
from vampire_tpu.ops import nms as N
from vampire_tpu.ops import target_assign as T
from vampire_tpu.ops.lovasz import ce_lovasz, lovasz_softmax, masked_cross_entropy
from vampire_tpu.ops.msssim import ms_ssim


# ---------------- lovasz (oracle: lovasz_losses.py:18-28,171-195) ----------

def _torch_lovasz_grad(gt_sorted):
    p = len(gt_sorted)
    gts = gt_sorted.sum()
    intersection = gts - gt_sorted.float().cumsum(0)
    union = gts + (1 - gt_sorted).float().cumsum(0)
    jaccard = 1.0 - intersection / union
    if p > 1:
        jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
    return jaccard


def _torch_lovasz_softmax_flat(probas, labels):
    C = probas.size(1)
    losses = []
    for c in range(C):
        fg = (labels == c).float()
        if fg.sum() == 0:
            continue
        errors = (fg - probas[:, c]).abs()
        errors_sorted, perm = torch.sort(errors, 0, descending=True)
        fg_sorted = fg[perm]
        losses.append(torch.dot(errors_sorted,
                                _torch_lovasz_grad(fg_sorted)))
    return torch.stack(losses).mean()


def test_lovasz_matches_reference():
    rng = np.random.RandomState(0)
    P, C = 503, 7
    logits = rng.randn(P, C).astype(np.float32)
    labels = rng.randint(0, C, P)
    probas = torch.softmax(torch.from_numpy(logits), dim=1)
    want = _torch_lovasz_softmax_flat(probas, torch.from_numpy(labels))
    got = lovasz_softmax(jax.nn.softmax(jnp.asarray(logits), axis=-1),
                         jnp.asarray(labels))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_lovasz_masked_equals_filtered():
    rng = np.random.RandomState(1)
    P, C = 401, 5
    logits = rng.randn(P, C).astype(np.float32)
    labels = rng.randint(0, C, P)
    valid = rng.rand(P) > 0.3
    got = lovasz_softmax(jax.nn.softmax(jnp.asarray(logits), -1),
                         jnp.asarray(labels), jnp.asarray(valid))
    probas = torch.softmax(torch.from_numpy(logits[valid]), dim=1)
    want = _torch_lovasz_softmax_flat(probas, torch.from_numpy(labels[valid]))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    # absent class handling: restrict labels to a subset
    labels2 = rng.randint(2, 4, P)
    got2 = lovasz_softmax(jax.nn.softmax(jnp.asarray(logits), -1),
                          jnp.asarray(labels2))
    probas2 = torch.softmax(torch.from_numpy(logits), dim=1)
    want2 = _torch_lovasz_softmax_flat(probas2, torch.from_numpy(labels2))
    np.testing.assert_allclose(float(got2), float(want2), rtol=1e-4)


def test_masked_ce_matches_torch():
    rng = np.random.RandomState(2)
    P, C = 300, 6
    logits = rng.randn(P, C).astype(np.float32)
    labels = rng.randint(0, C, P)
    valid = rng.rand(P) > 0.5
    got = masked_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(valid))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits[valid]), torch.from_numpy(labels[valid]))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


# ---------------- ms-ssim ---------------------------------------------------

def test_msssim_basics():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 192, 192, 3).astype(np.float32)
    same = ms_ssim(jnp.asarray(x), jnp.asarray(x))
    assert float(same) > 0.999
    noisy = np.clip(x + 0.3 * rng.randn(*x.shape).astype(np.float32), 0, 1)
    assert float(ms_ssim(jnp.asarray(x), jnp.asarray(noisy))) < 0.9


# ---------------- target assignment ----------------------------------------

def test_target_assignment_centerpoint():
    cfg = HeadConfig()
    boxes = np.array([
        [10.0, 5.0, -1.0, 1.9, 4.5, 1.6, 0.3, 1.0, 0.5],   # car (label 0)
        [-20.0, 8.0, -0.5, 2.5, 8.0, 3.0, -0.4, 0.0, 0.0],  # truck (label 1)
        [999.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0, 0.0, 0.0],    # out of range
    ], np.float32)
    labels = np.array([0, 1, 0])
    t = T.assign_targets_single(boxes, labels, cfg)
    W, H = cfg.feature_map_size
    # car -> task 0, channel 0
    assert t['heatmap_0'].shape == (H, W, 1)
    assert t['heatmap_0'].max() == 1.0
    cx = int((10.0 - cfg.pc_range[0]) / cfg.voxel_size[0] / cfg.out_size_factor)
    cy = int((5.0 - cfg.pc_range[1]) / cfg.voxel_size[1] / cfg.out_size_factor)
    assert t['heatmap_0'][cy, cx, 0] == 1.0
    assert t['ind_0'][0] == cy * W + cx
    assert t['mask_0'][0] == 1.0
    # anno box: [dx, dy, z, log dims, sin, cos, vx, vy]
    np.testing.assert_allclose(t['anno_box_0'][0, 2], -1.0)
    np.testing.assert_allclose(t['anno_box_0'][0, 3:6],
                               np.log([1.9, 4.5, 1.6]), rtol=1e-6)
    np.testing.assert_allclose(t['anno_box_0'][0, 6], np.sin(0.3), rtol=1e-6)
    np.testing.assert_allclose(t['anno_box_0'][0, 8:], [1.0, 0.5], rtol=1e-6)
    # truck -> task 1 channel 0
    assert t['heatmap_1'][..., 0].max() == 1.0
    assert t['heatmap_1'][..., 1].max() == 0.0
    # out-of-range box: the third car is dropped (mask only first entry)
    assert t['mask_0'].sum() == 1.0


def test_gaussian_radius_matches_formula():
    # spot values against the mmdet3d formula
    r = T.gaussian_radius((10.0, 5.0), 0.1)
    assert 0 < r < 10
    a3 = 4 * 0.1
    b3 = -2 * 0.1 * 15.0
    c3 = (0.1 - 1) * 50.0
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    assert r <= r3 + 1e-6


# ---------------- NMS -------------------------------------------------------

def test_circle_nms_cpp_vs_numpy():
    rng = np.random.RandomState(4)
    dets = np.concatenate([rng.uniform(-50, 50, (200, 2)),
                           rng.rand(200, 1)], axis=1).astype(np.float32)
    got = N.circle_nms(dets, thresh=4.0, post_max_size=83)
    # force numpy fallback
    lib = N._lib
    N._lib, N._build_failed = None, True
    want = N.circle_nms(dets, thresh=4.0, post_max_size=83)
    N._lib, N._build_failed = lib, False
    np.testing.assert_array_equal(got, want)
    # basic property: kept boxes pairwise farther than sqrt(thresh)
    kept = dets[got]
    d2 = ((kept[:, None, :2] - kept[None, :, :2]) ** 2).sum(-1)
    np.fill_diagonal(d2, 1e9)
    assert d2.min() > 4.0


def test_size_aware_nms_cpp_vs_numpy():
    rng = np.random.RandomState(5)
    dets = np.concatenate([
        rng.uniform(-50, 50, (100, 2)), rng.uniform(1, 5, (100, 2)),
        rng.uniform(-np.pi, np.pi, (100, 1)), rng.rand(100, 1)],
        axis=1).astype(np.float32)
    got = N.size_aware_circle_nms(dets, thresh_scale=1.0, post_max_size=83)
    lib = N._lib
    N._lib, N._build_failed = None, True
    want = N.size_aware_circle_nms(dets, thresh_scale=1.0, post_max_size=83)
    N._lib, N._build_failed = lib, False
    np.testing.assert_array_equal(got, want)


def test_rasterizers_cpp_vs_numpy():
    rng = np.random.RandomState(6)
    uvdl = np.concatenate([rng.uniform(-5, 60, (500, 2)),
                           rng.uniform(1, 60, (500, 1)),
                           rng.randint(0, 17, (500, 1)).astype(np.float64)],
                          axis=1).astype(np.float32)
    d1, l1 = N.rasterize_depth(uvdl, 48, 56)
    lib = N._lib
    N._lib, N._build_failed = None, True
    d2, l2 = N.rasterize_depth(uvdl, 48, 56)
    N._lib, N._build_failed = lib, False
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(l1, l2)

    xyzl = np.concatenate([rng.uniform(-5, 40, (500, 2)),
                           rng.uniform(-3, 3, (500, 1)),
                           rng.randint(0, 17, (500, 1)).astype(np.float64)],
                          axis=1).astype(np.float32)
    s1, h1, m1 = N.rasterize_bev(xyzl, 32, 32)
    N._lib, N._build_failed = None, True
    s2, h2, m2 = N.rasterize_bev(xyzl, 32, 32)
    N._lib, N._build_failed = lib, False
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(m1, m2)


def test_rotated_nms_cpp_vs_numpy():
    """C++ rotated NMS == independent numpy polygon-clipping fallback, and
    analytic axis-aligned IoU sanity (reference nms_type='rotate' branch,
    bev_depth_head.py:473-475)."""
    rng = np.random.RandomState(8)
    boxes = np.concatenate([
        rng.uniform(-30, 30, (120, 2)), rng.uniform(1, 6, (120, 2)),
        rng.uniform(-np.pi, np.pi, (120, 1))], axis=1).astype(np.float32)
    scores = rng.rand(120).astype(np.float32)
    got = N.rotated_nms(boxes, scores, thresh=0.2, post_max_size=83)
    lib = N._lib
    N._lib, N._build_failed = None, True
    want = N.rotated_nms(boxes, scores, thresh=0.2, post_max_size=83)
    N._lib, N._build_failed = lib, False
    np.testing.assert_array_equal(got, want)

    # analytic: two axis-aligned unit squares with 0.5 x-overlap ->
    # IoU = 0.5 / 1.5 = 1/3; kept together iff thresh >= 1/3
    b = np.array([[0, 0, 1, 1, 0], [0.5, 0, 1, 1, 0]], np.float32)
    s = np.array([0.9, 0.8], np.float32)
    assert len(N.rotated_nms(b, s, thresh=0.30)) == 1
    assert len(N.rotated_nms(b, s, thresh=0.34)) == 2
    # 45-degree rotated square fully inside a bigger one -> suppressed
    b2 = np.array([[0, 0, 4, 4, 0], [0, 0, 1, 1, np.pi / 4]], np.float32)
    # IoU = 1/16 < thresh keeps both; containment check via high thresh
    assert len(N.rotated_nms(b2, s, thresh=0.05)) == 1
    assert len(N.rotated_nms(b2, s, thresh=0.07)) == 2


def test_ce_lovasz_compact_exact():
    """ce_lovasz_compact == dense ce_lovasz for sparse masks (under cap),
    at the cap boundary, and OVER cap (lax.cond dense fallback)."""
    from vampire_tpu.ops.lovasz import ce_lovasz, ce_lovasz_compact
    rng = np.random.RandomState(9)
    P, C = 2048, 7
    logits = jnp.asarray(rng.randn(P, C).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C, P))
    for frac, cap in ((0.02, 256), (0.12, 256), (0.5, 256), (1.0, 4096)):
        valid = jnp.asarray(rng.rand(P) < frac)
        want = float(ce_lovasz(logits, labels, valid))
        got = float(jax.jit(
            lambda lg, lb, v: ce_lovasz_compact(lg, lb, v, cap))(
                logits, labels, valid))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6,
                                   err_msg=f'frac={frac} cap={cap}')
    # exactly-at-cap boundary
    valid = jnp.asarray(np.arange(P) < 256)
    want = float(ce_lovasz(logits, labels, valid))
    got = float(ce_lovasz_compact(logits, labels, valid, 256))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # gradients flow identically through the compact path
    g_dense = jax.grad(lambda lg: ce_lovasz(lg, labels, valid))(logits)
    g_comp = jax.grad(
        lambda lg: ce_lovasz_compact(lg, labels, valid, 256))(logits)
    np.testing.assert_allclose(np.asarray(g_comp), np.asarray(g_dense),
                               rtol=1e-4, atol=1e-6)


def test_ms_ssim_torch_oracle():
    """ops/msssim.py vs an INDEPENDENT torch implementation of the same
    published algorithm (Wang et al. MS-SSIM with torchmetrics defaults:
    gaussian 11/1.5, valid conv, k1/k2 .01/.03, betas 5-scale, floor 2x
    avgpool between scales, relu normalization). torchmetrics itself
    is not installed in this image; this pins the jax implementation
    against a second numerical path in fp64 (VERDICT round-2 item 7)."""
    import torch
    import torch.nn.functional as F
    from vampire_tpu.ops.msssim import ms_ssim

    def torch_msssim(x, y, data_range=1.0, ks=11, sigma=1.5,
                     betas=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
                     k1=0.01, k2=0.03):
        # x, y: (B, C, H, W) float64
        ax = torch.arange(ks, dtype=torch.float64) - (ks - 1) / 2
        g = torch.exp(-(ax ** 2) / (2 * sigma ** 2))
        g = (g / g.sum())
        C = x.shape[1]
        kh = g.view(1, 1, ks, 1).repeat(C, 1, 1, 1)
        kw = g.view(1, 1, 1, ks).repeat(C, 1, 1, 1)

        def blur(t):
            t = F.conv2d(t, kh, groups=C)
            return F.conv2d(t, kw, groups=C)

        c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
        mcs, ssim_v = [], None
        for i in range(len(betas)):
            mx, my = blur(x), blur(y)
            sx = blur(x * x) - mx * mx
            sy = blur(y * y) - my * my
            sxy = blur(x * y) - mx * my
            cs = (2 * sxy + c2) / (sx + sy + c2)
            ssim_map = (2 * mx * my + c1) / (mx * mx + my * my + c1) * cs
            ssim_v = ssim_map.mean(dim=(1, 2, 3))
            mcs.append(cs.mean(dim=(1, 2, 3)))
            if i < len(betas) - 1:
                # floor behavior: avg_pool2d(2) drops a trailing odd row/col
                x = F.avg_pool2d(x, 2)
                y = F.avg_pool2d(y, 2)
        mcs_t = torch.stack([m.clamp(min=0) for m in mcs[:-1]])
        ssim_v = ssim_v.clamp(min=0)
        b = torch.tensor(betas, dtype=torch.float64)
        return (torch.prod(mcs_t ** b[:-1, None], dim=0)
                * ssim_v ** b[-1]).mean()

    rng = np.random.RandomState(7)
    # (191, 201): odd dims exercise the floor (row/col-dropping) downscale
    for trial, (h, w) in enumerate(((192, 200), (176, 176), (191, 201))):
        x = rng.rand(2, h, w, 3).astype(np.float32)
        # correlated pair (realistic SSIM regime), clipped to [0, 1]
        y = np.clip(x + rng.randn(2, h, w, 3).astype(np.float32) * 0.08,
                    0, 1)
        got = float(ms_ssim(jnp.asarray(x), jnp.asarray(y)))
        want = float(torch_msssim(
            torch.from_numpy(x).permute(0, 3, 1, 2).double(),
            torch.from_numpy(y).permute(0, 3, 1, 2).double()))
        assert abs(got - want) < 2e-5, (trial, got, want)
