"""Top-level model: field backbone + CenterPoint head (`VAMPIRE2`,
src/models/vampire2.py:9-109). The ablation wrappers (LSS / LSSInpaintor /
BiLinear, src/models/{lss,lss_inpaintor,bilinear}.py) are the same composition
with a different `cfg.backbone.variant`.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..configs import BackboneConfig, HeadConfig
from .centerpoint_head import BEVDepthHead
from .field import FieldBackbone


class Vampire(nn.Module):
    backbone_cfg: BackboneConfig
    head_cfg: HeadConfig
    dtype: Any = jnp.bfloat16
    lift_vectorized: bool = False
    lift_remat: bool = False

    def setup(self):
        # the backbone's BEV feature (det grid, halved iff oY==256 — the
        # reference's literal gate, base_vampire2.py:203-209) must land on
        # the head's expected map size; catch grid misconfigs here instead
        # of deep inside the head's target gather
        _, oY, oX = self.backbone_cfg.grid_zyx('det')
        bev_hw = (oY // 2, oX // 2) if oY == 256 else (oY, oX)
        assert bev_hw == tuple(self.head_cfg.feature_map_size), (
            f'backbone BEV feature {bev_hw} != head feature_map_size '
            f'{self.head_cfg.feature_map_size} (x/y_bound_det vs '
            f'grid_size/out_size_factor)')
        self.backbone = FieldBackbone(self.backbone_cfg, dtype=self.dtype,
                                      lift_vectorized=self.lift_vectorized,
                                      lift_remat=self.lift_remat,
                                      name='backbone')
        self.head = BEVDepthHead(self.head_cfg, name='head')

    def __call__(self, imgs: jnp.ndarray, mats: Dict[str, jnp.ndarray],
                 points: Optional[jnp.ndarray] = None,
                 train: bool = False, lidar_seg: bool = False,
                 camera_renders: bool = True):
        """Args follow FieldBackbone.__call__; `lidar_seg=True` at eval time
        skips the det head and returns only the segmentation outputs
        (vampire2.py:58-59). `camera_renders=False` (inference graphs whose
        consumers read no per-camera render) skips the camera ray branch and
        the corner-table build it needs — see FieldBackbone.__call__.

        Returns (field_outputs dict, det_preds list-of-dicts or None).
        """
        fo = self.backbone(imgs, mats, points=points, train=train,
                           camera_renders=camera_renders)
        if lidar_seg and not train:
            return fo, None
        preds = self.head(fo['bev_feature'], train)
        return fo, preds
