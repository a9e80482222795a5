"""Numeric torch-oracle tests for the detection loss + decode chain.

The reference's det head delegates to mmdet/mmdet3d (GaussianFocalLoss,
weighted L1 with reduce_mean normalizers, CenterPointBBoxCoder.decode —
bev_depth_head.py:321-379, 381-419). mmdet3d is not installable here, so the
oracles below re-implement those published formulas in torch and pin our jax
implementations against them numerically (VERDICT round-1: 'broader oracle
coverage for the det loss/decode chain').
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from vampire_tpu.configs import HeadConfig
from vampire_tpu.models.centerpoint_head import (clip_sigmoid, decode_preds,
                                                 detection_loss,
                                                 gaussian_focal_loss)


def _torch_gaussian_focal(pred, gt, alpha=2.0, gamma=4.0):
    """mmdet.models.losses.GaussianFocalLoss (sum reduction)."""
    eps = 1e-12
    pos_weights = gt.eq(1).float()
    neg_weights = (1 - gt).pow(gamma)
    pos_loss = -(pred + eps).log() * (1 - pred).pow(alpha) * pos_weights
    neg_loss = -(1 - pred + eps).log() * pred.pow(alpha) * neg_weights
    return (pos_loss + neg_loss).sum()


def test_detection_loss_matches_torch_oracle():
    """detection_loss == the reference composition (bev_depth_head.py:321-379):
    per task, focal(clip_sigmoid(heat), hm)/max(num_pos,1)
    + 0.25 * sum(|pred - target| * mask * isnotnan * code_weights)/(num+1e-4)."""
    cfg = HeadConfig()
    rng = np.random.RandomState(0)
    B, H, W = 2, 16, 16
    n_obj = 500
    preds, targets = [], {}
    for t, task in enumerate(cfg.tasks):
        ncls = len(task)
        pd = dict(
            heatmap=rng.randn(B, H, W, ncls).astype(np.float32),
            reg=rng.randn(B, H, W, 2).astype(np.float32),
            height=rng.randn(B, H, W, 1).astype(np.float32),
            dim=rng.randn(B, H, W, 3).astype(np.float32),
            rot=rng.randn(B, H, W, 2).astype(np.float32),
            vel=rng.randn(B, H, W, 2).astype(np.float32))
        preds.append({k: jnp.asarray(v) for k, v in pd.items()})
        hm = np.clip(rng.rand(B, H, W, ncls).astype(np.float32) * 1.2 - 0.2,
                     0, 1)
        # plant exact peaks (gt == 1 drives num_pos)
        for b in range(B):
            hm[b, rng.randint(H), rng.randint(W), rng.randint(ncls)] = 1.0
        anno = rng.randn(B, n_obj, 10).astype(np.float32)
        anno[0, 3, 5] = np.nan                      # isnotnan path
        mask = (rng.rand(B, n_obj) < 0.02).astype(np.float32)
        ind = rng.randint(0, H * W, (B, n_obj)).astype(np.int32)
        targets[f'heatmap_{t}'] = jnp.asarray(hm)
        targets[f'anno_box_{t}'] = jnp.asarray(anno)
        targets[f'ind_{t}'] = jnp.asarray(ind)
        targets[f'mask_{t}'] = jnp.asarray(mask)

    got = float(jax.jit(lambda p, tg: detection_loss(p, tg, cfg))(preds,
                                                                  targets))

    want = 0.0
    cw = torch.tensor(cfg.code_weights)
    for t in range(len(cfg.tasks)):
        heat = torch.sigmoid(torch.from_numpy(
            np.asarray(preds[t]['heatmap']))).clamp(1e-4, 1 - 1e-4)
        hm = torch.from_numpy(np.asarray(targets[f'heatmap_{t}']))
        num_pos = hm.eq(1).float().sum()
        want = want + _torch_gaussian_focal(heat, hm) / torch.clamp(
            num_pos, min=1.0)
        anno = torch.cat([torch.from_numpy(np.asarray(preds[t][k]))
                          for k in ('reg', 'height', 'dim', 'rot', 'vel')],
                         dim=-1).reshape(2, -1, 10)
        ind = torch.from_numpy(np.asarray(targets[f'ind_{t}'])).long()
        pred_box = anno.gather(1, ind.unsqueeze(-1).expand(-1, -1, 10))
        tgt = torch.from_numpy(np.asarray(targets[f'anno_box_{t}']))
        mask = torch.from_numpy(
            np.asarray(targets[f'mask_{t}'])).unsqueeze(-1)
        isnotnan = torch.isfinite(tgt).float()
        w = mask * isnotnan * cw
        num = mask.sum()
        l1 = (torch.abs(pred_box - torch.nan_to_num(tgt)) * w).sum() / \
            torch.clamp(num, min=1e-4)
        want = want + cfg.loss_bbox_weight * l1
    np.testing.assert_allclose(got, float(want), rtol=2e-4)


def test_clip_sigmoid_and_focal_primitives():
    x = np.linspace(-12, 12, 101).astype(np.float32)
    got = np.asarray(clip_sigmoid(jnp.asarray(x)))
    want = torch.sigmoid(torch.from_numpy(x)).clamp(1e-4, 1 - 1e-4).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6)
    rng = np.random.RandomState(1)
    pred = np.clip(rng.rand(64, 7).astype(np.float32), 1e-4, 1 - 1e-4)
    gt = np.clip(rng.rand(64, 7).astype(np.float32) * 1.3 - 0.3, 0, 1)
    gt[gt > 0.95] = 1.0
    got = float(gaussian_focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
    want = float(_torch_gaussian_focal(torch.from_numpy(pred),
                                       torch.from_numpy(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _torch_decode_task(pd, cfg):
    """CenterPointBBoxCoder.decode (mmdet3d 1.0.0rc6 spec): per-class top-K
    over HW, then global top-K over (ncls*K); gather regs at the winning
    cells; centers from cell + reg, dims exp'd, yaw = atan2(sin, cos)."""
    heat = torch.sigmoid(torch.from_numpy(np.asarray(pd['heatmap'],
                                                     np.float32)))
    B, H, W, ncls = heat.shape
    K = cfg.max_num
    hw = heat.permute(0, 3, 1, 2).reshape(B, ncls, H * W)
    cls_scores, cls_inds = torch.topk(hw, K)
    scores, sel = torch.topk(cls_scores.reshape(B, -1), K)
    labels = sel // K
    inds = cls_inds.reshape(B, -1).gather(1, sel)
    ys = (inds // W).float()
    xs = (inds % W).float()

    def gather(name):
        m = torch.from_numpy(np.asarray(pd[name], np.float32))
        return m.reshape(B, H * W, m.shape[-1]).gather(
            1, inds.unsqueeze(-1).expand(-1, -1, m.shape[-1]))

    reg = gather('reg')
    xs = xs + reg[..., 0]
    ys = ys + reg[..., 1]
    rot = gather('rot')
    yaw = torch.atan2(rot[..., 0], rot[..., 1])
    hei = gather('height')[..., 0]
    dim = torch.exp(gather('dim'))
    vel = gather('vel')
    xs = xs * cfg.out_size_factor * cfg.voxel_size[0] + cfg.pc_range[0]
    ys = ys * cfg.out_size_factor * cfg.voxel_size[1] + cfg.pc_range[1]
    boxes = torch.cat([xs.unsqueeze(-1), ys.unsqueeze(-1),
                       hei.unsqueeze(-1), dim, yaw.unsqueeze(-1), vel],
                      dim=-1)
    pcr = torch.tensor(cfg.post_center_range)
    valid = (scores > cfg.score_threshold) & \
        (boxes[..., :3] >= pcr[:3]).all(-1) & (boxes[..., :3] <= pcr[3:]).all(-1)
    return boxes, scores, labels, valid


def test_decode_matches_torch_oracle():
    cfg = HeadConfig()
    rng = np.random.RandomState(2)
    B, H, W = 2, 32, 32
    preds = []
    for task in cfg.tasks:
        preds.append(dict(
            heatmap=rng.randn(B, H, W, len(task)).astype(np.float32) * 3,
            reg=rng.rand(B, H, W, 2).astype(np.float32),
            height=rng.randn(B, H, W, 1).astype(np.float32),
            dim=(rng.randn(B, H, W, 3) * 0.3).astype(np.float32),
            rot=rng.randn(B, H, W, 2).astype(np.float32),
            vel=rng.randn(B, H, W, 2).astype(np.float32)))
    jp = [{k: jnp.asarray(v) for k, v in pd.items()} for pd in preds]
    got = jax.jit(lambda p: decode_preds(p, cfg))(jp)

    def canon(boxes, scores, labels, valid):
        """Sort rows by (-score, x, y) per batch element: exact-score TIES
        (fp32 sigmoid collisions) may legally order differently between
        top_k implementations."""
        rows = np.concatenate([scores[..., None], labels[..., None],
                               valid[..., None], boxes], axis=-1)
        out = []
        for b in range(rows.shape[0]):
            key = np.lexsort((rows[b, :, 4], rows[b, :, 3], -rows[b, :, 0]))
            out.append(rows[b][key])
        return np.stack(out)

    for t, pd in enumerate(preds):
        boxes, scores, labels, valid = _torch_decode_task(pd, cfg)
        want = canon(boxes.numpy(), scores.numpy(),
                     labels.numpy().astype(np.float32),
                     valid.numpy().astype(np.float32))
        have = canon(np.asarray(got[t]['bboxes']),
                     np.asarray(got[t]['scores']),
                     np.asarray(got[t]['labels'], np.float32),
                     np.asarray(got[t]['valid'], np.float32))
        np.testing.assert_allclose(have, want, rtol=1e-3, atol=1e-3)
