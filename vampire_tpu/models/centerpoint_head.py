"""CenterPoint-style BEV detection head (`BEVDepthHead`, bev_depth_head.py:85-494).

Structure (fp32 throughout — the reference wraps the whole head in
`@autocast(False)`, bev_depth_head.py:140):
  trunk: ResNet-18-ish (in 80ch, base 160, 3 stages, no maxpool), with the raw
    input prepended to the pyramid (bev_depth_head.py:152-163);
  neck: SECONDFPN -> 256ch at the 128x128 BEV scale;
  shared 3x3 ConvModule -> 64ch, then one SeparateHead per task group with
    branches {reg:2, height:1, dim:3, rot:2, vel:2, heatmap:ncls}, each branch
    = ConvModule(64, k3, BN, ReLU) + Conv(out, k3, bias) and heatmap final
    bias init -2.19 (mmdet3d SeparateHead semantics).

Loss and decode are jit-side; circular NMS runs on the host
(`vampire_tpu.ops.nms`), matching the reference's CPU round-trip
(bev_depth_head.py:434-439).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import HeadConfig
from .resnet import ResNet, ConvBN, kaiming_out
from .second_fpn import SECONDFPN


# torch's default Conv2d init (kaiming_uniform with a=sqrt(5)): mmdet3d leaves
# the SeparateHead branch-final convs on it; a hotter init saturates the
# heatmap focal loss at step 0 (sigmoid(-2.19 ± 5) ~ 1).
_torch_default = nn.initializers.variance_scaling(1.0 / 3.0, 'fan_in',
                                                  'uniform')


class SeparateHead(nn.Module):
    """Per-task regression branches (mmdet3d SeparateHead, final_kernel=3)."""
    heads: Tuple[Tuple[str, Tuple[int, int]], ...]  # name -> (out_ch, num_conv)
    head_conv: int = 64
    init_bias: float = -2.19
    final_kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool):
        out = {}
        k = self.final_kernel
        for name, (classes, num_conv) in self.heads:
            h = x
            for i in range(num_conv - 1):
                h = ConvBN(self.head_conv, k, 1, relu=True,
                           dtype=jnp.float32, name=f'{name}_conv{i}')(h, train)
            bias_init = (nn.initializers.constant(self.init_bias)
                         if name == 'heatmap' else nn.initializers.zeros)
            h = nn.Conv(classes, (k, k), padding=[(k // 2, k // 2)] * 2,
                        use_bias=True, dtype=jnp.float32,
                        param_dtype=jnp.float32, kernel_init=_torch_default,
                        bias_init=bias_init, name=f'{name}_out')(h)
            out[name] = h
        return out


class BEVDepthHead(nn.Module):
    cfg: HeadConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> List[Dict[str, jnp.ndarray]]:
        """x: (B, 128, 128, 80) fp32 BEV feature. Returns per-task pred dicts
        with channels-last maps (B, 128, 128, ch)."""
        c = self.cfg
        x = x.astype(jnp.float32)
        trunk = ResNet(depth=c.bev_backbone_depth,
                       num_stages=c.bev_backbone_num_stages,
                       base_channels=c.bev_backbone_base_channels,
                       strides=c.bev_backbone_strides,
                       out_indices=c.bev_backbone_out_indices,
                       with_maxpool=False, dtype=jnp.float32, name='trunk')
        feats = [x] + trunk(x, train)
        fpn = SECONDFPN(in_channels=c.bev_neck_in_channels,
                        out_channels=c.bev_neck_out_channels,
                        upsample_strides=c.bev_neck_upsample_strides,
                        dtype=jnp.float32, name='neck')(feats, train)
        shared = ConvBN(c.share_conv_channel, 3, 1, relu=True,
                        dtype=jnp.float32, name='shared_conv')(fpn, train)
        preds = []
        for t, task in enumerate(c.tasks):
            heads = tuple(c.common_heads) + (
                ('heatmap', (len(task), c.num_heatmap_convs)),)
            preds.append(SeparateHead(
                heads=heads, init_bias=c.separate_head_init_bias,
                final_kernel=c.separate_head_final_kernel,
                name=f'task{t}')(shared, train))
        return preds


# ---------------------------------------------------------------------------
# Loss (bev_depth_head.py:321-379)
# ---------------------------------------------------------------------------

def clip_sigmoid(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """mmdet3d clip_sigmoid: sigmoid clamped to [eps, 1-eps]."""
    return jnp.clip(jax.nn.sigmoid(x.astype(jnp.float32)), eps, 1.0 - eps)


def gaussian_focal_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                        alpha: float = 2.0, gamma: float = 4.0) -> jnp.ndarray:
    """mmdet GaussianFocalLoss (sum, caller divides by avg_factor)."""
    eps = 1e-12
    pos_w = (gt == 1.0).astype(jnp.float32)
    neg_w = jnp.power(1.0 - gt, gamma)
    pos = -jnp.log(pred + eps) * jnp.power(1.0 - pred, alpha) * pos_w
    neg = -jnp.log(1.0 - pred + eps) * jnp.power(pred, alpha) * neg_w
    return jnp.sum(pos + neg)


def detection_loss(preds: List[Dict[str, jnp.ndarray]],
                   targets: Dict[str, jnp.ndarray],
                   cfg: HeadConfig,
                   num_devices: int = 1) -> jnp.ndarray:
    """Sum of per-task heatmap focal + weighted L1 box regression.

    `targets` (built host-side by ops.target_assign):
      heatmap_{t}: (B, H, W, ncls_t); anno_box_{t}: (B, 500, 10);
      ind_{t}: (B, 500) int32 (y*W + x); mask_{t}: (B, 500) float.

    The reference divides by `reduce_mean(num_pos)` across ranks then lets DDP
    average gradients, which is equivalent to one global loss of
    sum / max(global_num_pos, R) (bev_depth_head.py:338-341,361-368). We write
    that global form directly (pjit computes global sums natively).
    """
    total = jnp.float32(0.0)
    code_w = jnp.asarray(cfg.code_weights, jnp.float32)
    for t, pd in enumerate(preds):
        hm_pred = clip_sigmoid(pd['heatmap'])
        hm_gt = targets[f'heatmap_{t}'].astype(jnp.float32)
        num_pos = jnp.sum((hm_gt == 1.0).astype(jnp.float32))
        cls_avg = jnp.maximum(num_pos, float(num_devices))
        total = total + gaussian_focal_loss(hm_pred, hm_gt) / cls_avg

        anno = jnp.concatenate([pd['reg'], pd['height'], pd['dim'],
                                pd['rot'], pd['vel']], axis=-1)
        B, H, W, C = anno.shape
        flat = anno.reshape(B, H * W, C)
        ind = targets[f'ind_{t}'].astype(jnp.int32)
        pred_box = jnp.take_along_axis(flat, ind[..., None], axis=1)
        tgt_box = targets[f'anno_box_{t}'].astype(jnp.float32)
        mask = targets[f'mask_{t}'].astype(jnp.float32)[..., None]
        isnotnan = jnp.isfinite(tgt_box).astype(jnp.float32)
        w = mask * isnotnan * code_w
        tgt_box = jnp.nan_to_num(tgt_box)
        num = jnp.sum(targets[f'mask_{t}'].astype(jnp.float32))
        num = jnp.maximum(num, 1e-4 * float(num_devices))
        l1 = jnp.sum(jnp.abs(pred_box - tgt_box) * w) / num
        total = total + cfg.loss_bbox_weight * l1
    return total


# ---------------------------------------------------------------------------
# Decode (CenterPointBBoxCoder, jit-side part)
# ---------------------------------------------------------------------------

def decode_preds(preds: List[Dict[str, jnp.ndarray]], cfg: HeadConfig
                 ) -> List[Dict[str, jnp.ndarray]]:
    """Top-k decode per task. Returns per-task dicts of fixed-shape
    (B, max_num) arrays: bboxes (.,9), scores, labels, valid — host code
    applies circle NMS afterwards (bev_depth_head.py:381-475).
    """
    out = []
    K = cfg.max_num
    pcr = jnp.asarray(cfg.post_center_range, jnp.float32)
    for t, pd in enumerate(preds):
        heat = jax.nn.sigmoid(pd['heatmap'].astype(jnp.float32))
        B, H, W, ncls = heat.shape
        # CenterPoint's _topk does per-class top-K then global top-K over
        # the winners; one global top-K over all (class, cell) pairs selects
        # the identical set (an element below rank K within its class has K
        # class-mates above it globally), in one lax.top_k instead of two
        hw = heat.transpose(0, 3, 1, 2).reshape(B, ncls * H * W)
        scores, sel = jax.lax.top_k(hw, K)                   # (B, K)
        labels = (sel // (H * W)).astype(jnp.int32)
        inds = sel % (H * W)
        ys = (inds // W).astype(jnp.float32)
        xs = (inds % W).astype(jnp.float32)

        def gather(name):
            m = pd[name].astype(jnp.float32)
            return jnp.take_along_axis(m.reshape(B, H * W, m.shape[-1]),
                                       inds[..., None], axis=1)
        reg = gather('reg')
        xs = xs + reg[..., 0]
        ys = ys + reg[..., 1]
        rot = gather('rot')
        rot_angle = jnp.arctan2(rot[..., 0], rot[..., 1])
        hei = gather('height')[..., 0]
        dim = jnp.exp(gather('dim')) if cfg.norm_bbox else gather('dim')
        vel = gather('vel')
        xs = xs * cfg.out_size_factor * cfg.voxel_size[0] + cfg.pc_range[0]
        ys = ys * cfg.out_size_factor * cfg.voxel_size[1] + cfg.pc_range[1]
        boxes = jnp.concatenate(
            [xs[..., None], ys[..., None], hei[..., None], dim,
             rot_angle[..., None], vel], axis=-1)            # (B, K, 9)
        valid = scores > cfg.score_threshold
        centers_ok = jnp.all(boxes[..., :3] >= pcr[:3], axis=-1) & \
                     jnp.all(boxes[..., :3] <= pcr[3:], axis=-1)
        out.append(dict(bboxes=boxes, scores=scores, labels=labels,
                        valid=valid & centers_ok))
    return out
