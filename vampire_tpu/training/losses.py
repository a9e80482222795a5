"""All task losses of the training step (fp32 islands).

Re-derives `VAMPIRELightningModel`'s loss methods (base_exp.py:319-632) with
pad-mask discipline replacing ragged tensors. Every loss runs in fp32 — the
reference wraps each one in `autocast(enabled=False)`.

Batch layout (channels-last, produced by the data pipeline):
  imgs           (B, N, H, W, 3)   normalized
  depth_labels   (B, N, H, W)      sparse lidar depth (0 = no point)
  seg_labels     (B, N, H, W)      int labels
  bev_seg        (B, Y, X) int; bev_height (B, Y, X); bev_mask (B, Y, X) bool
  points         (B, P, 3); point_labels (B, P) int; point_valid (B, P) bool
  occ_semantics  (B, 200, 200, 16) int
  occ_density_labels (B, 200, 200, 16) float (= sem != 17)
  mask_camera / mask_lidar (B, 200, 200, 16) bool
  + detection targets from ops.target_assign
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..configs import TrainConfig, HeadConfig
from ..models.centerpoint_head import detection_loss
from ..ops.lovasz import ce_lovasz, ce_lovasz_compact
from ..ops.msssim import ms_ssim

# torchvision normalization stats, = IMG_MEAN/255, IMG_STD/255 (base_exp.py:614-615)
_RGB_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_RGB_STD = np.array([0.229, 0.224, 0.225], np.float32)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mf = mask.astype(jnp.float32)
    return jnp.sum(x * mf) / jnp.maximum(jnp.sum(mf), 1.0)


def denormalize_images(imgs: jnp.ndarray) -> jnp.ndarray:
    """Normalized (B, N, H, W, 3) -> [0, 1] rgb (base_exp.py:608-616)."""
    return imgs.astype(jnp.float32) * jnp.asarray(_RGB_STD) + jnp.asarray(_RGB_MEAN)


def compute_losses(field_out: Dict[str, jnp.ndarray],
                   det_preds,
                   batch: Dict[str, jnp.ndarray],
                   train_cfg: TrainConfig,
                   head_cfg: HeadConfig,
                   sdf_bias: float,
                   density_mode: str = 'sdf',
                   num_devices: int = 1
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Total weighted loss + per-term scalars (base_exp.py:319-417)."""
    logs: Dict[str, jnp.ndarray] = {}
    tw = train_cfg.task_weights
    lw = train_cfg.loss_weights

    # multi-frame batches carry a frame axis at dim 1 (data/nuscenes.py
    # stack_frames); the model renders only the KEY frame (frame 0), so the
    # camera-view supervision uses its labels — sweep frames contribute
    # through the lift fusion, not through renders of their own
    if batch['imgs'].ndim == 6:
        batch = dict(batch, imgs=batch['imgs'][:, 0],
                     depth_labels=batch['depth_labels'][:, 0],
                     seg_labels=batch['seg_labels'][:, 0])

    # --- detection (base_exp.py:340-345) ---
    det_loss = detection_loss(det_preds, batch, head_cfg, num_devices)
    logs['detection_loss'] = det_loss

    # --- camera-view losses on the upsample-factor grid (full res here since
    # upsample_factor == downsample_factor; get_downsampled_gt is identity
    # subsampling, base_exp.py:596-632) ---
    fg_mask = batch['depth_labels'] > 0.0
    depth_pred = field_out['depth_preds']
    cam_depth_loss = masked_mean(
        smooth_l1(depth_pred, batch['depth_labels']), fg_mask)
    logs['camera_depth_loss'] = cam_depth_loss

    seg_logits = field_out['seg_logits_preds']
    K = seg_logits.shape[-1]
    B = seg_logits.shape[0]
    P_pts = batch['points'].shape[1]
    # valid camera-seg pixels = pixels hit by a projected lidar point: at
    # most one pixel per (point, camera), and a point is visible in <=2
    # overlapping cameras in practice -> cap 3*B*P covers it with margin;
    # ce_lovasz_compact falls back to the dense path if ever exceeded
    cam_seg_loss = ce_lovasz_compact(
        seg_logits.reshape(-1, K),
        batch['seg_labels'].reshape(-1).astype(jnp.int32),
        fg_mask.reshape(-1), cap=3 * B * P_pts)
    logs['camera_seg_loss'] = cam_seg_loss

    if lw[2] != 0.0:
        rgb_labels = denormalize_images(batch['imgs'])
        rgb_preds = field_out['rgb_preds'].astype(jnp.float32)
        B, N, H, W, _ = rgb_preds.shape
        sl1 = jnp.mean(smooth_l1(rgb_preds, rgb_labels))
        ms = ms_ssim(rgb_preds.reshape(B * N, H, W, 3),
                     rgb_labels.reshape(B * N, H, W, 3))
        rgb_loss = sl1 + 1.0 - ms
    else:
        rgb_loss = jnp.float32(0.0)
    logs['rgb_loss'] = rgb_loss

    # --- BEV losses (base_exp.py:571-586) ---
    bev_mask = batch['bev_mask']
    bev_height_loss = masked_mean(
        smooth_l1(batch['bev_height'], field_out['bev_height_preds']),
        bev_mask)
    logs['bev_height_loss'] = bev_height_loss
    # bev valid cells are rasterized from the point cloud (<= 1 cell/point)
    bev_seg_loss = ce_lovasz_compact(
        field_out['bev_seg_logits_preds'].reshape(-1, K),
        batch['bev_seg'].reshape(-1).astype(jnp.int32),
        bev_mask.reshape(-1), cap=B * P_pts)
    logs['bev_seg_loss'] = bev_seg_loss

    # --- lidar point segmentation (base_exp.py:561-569) ---
    pts_valid = batch['point_valid'].reshape(-1)
    pts_seg_loss = ce_lovasz(field_out['pts_logits'].reshape(-1, K),
                             batch['point_labels'].reshape(-1).astype(jnp.int32),
                             pts_valid)
    logs['pts_seg_loss'] = pts_seg_loss
    lidarseg_loss = pts_seg_loss

    # --- sdf regularizer (base_exp.py:533-537); out-of-range points were
    # zeroed by the backbone, so they contribute (0 - bias)^2 exactly like the
    # reference; pad slots are excluded ---
    if density_mode == 'sdf' and lw[3] != 0.0:
        sdf_loss = masked_mean(
            (field_out['pts_sdf'].astype(jnp.float32) - sdf_bias) ** 2,
            batch['point_valid'])
    else:
        sdf_loss = jnp.float32(0.0)
    logs['sdf_loss'] = sdf_loss

    # --- occupancy (base_exp.py:379-401,515-531) ---
    mask_cam = batch['mask_camera'].reshape(-1)
    occ_logits = field_out['occ_logits'].reshape(-1, K)
    occ_sem = batch['occ_semantics'].reshape(-1).astype(jnp.int32)
    # occ stays DENSE: camera-visible voxels cover ~30-50% of the grid, and
    # at that density the compaction's argsort+gather overhead exceeds the
    # sort reduction (measured 948 -> 988 ms/step with a 0.6 cap)
    occ_seg_loss = ce_lovasz(occ_logits, occ_sem, mask_cam)
    logs['visible_occ_seg_loss'] = occ_seg_loss
    occ_loss = occ_seg_loss

    occ_density = field_out['occ_density'].reshape(-1).astype(jnp.float32)
    occ_density_labels = batch['occ_density_labels'].reshape(-1).astype(jnp.float32)
    vis_density_loss = masked_mean((occ_density_labels - occ_density) ** 2,
                                   mask_cam)
    invis_density_loss = masked_mean((occ_density_labels - occ_density) ** 2,
                                     ~batch['mask_camera'].reshape(-1))
    logs['visible_occ_density_loss'] = vis_density_loss
    logs['invisible_occ_density_loss'] = invis_density_loss
    density_loss = vis_density_loss + invis_density_loss

    depth_loss = cam_depth_loss + bev_height_loss
    seg_loss = cam_seg_loss + bev_seg_loss
    logs['depth_loss'] = depth_loss
    logs['seg_loss'] = seg_loss

    total = (tw[0] * occ_loss + tw[1] * lidarseg_loss + tw[2] * det_loss
             + lw[0] * depth_loss + lw[1] * seg_loss + lw[2] * rgb_loss
             + lw[3] * sdf_loss + lw[4] * density_loss)
    logs['total_loss'] = total
    return total, logs
