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
        self.backbone = FieldBackbone(self.backbone_cfg, dtype=self.dtype,
                                      lift_vectorized=self.lift_vectorized,
                                      lift_remat=self.lift_remat,
                                      name='backbone')
        self.head = BEVDepthHead(self.head_cfg, name='head')

    def __call__(self, imgs: jnp.ndarray, mats: Dict[str, jnp.ndarray],
                 points: Optional[jnp.ndarray] = None,
                 train: bool = False, lidar_seg: bool = False):
        """Args follow FieldBackbone.__call__; `lidar_seg=True` at eval time
        skips the det head and returns only the segmentation outputs
        (vampire2.py:58-59).

        Returns (field_outputs dict, det_preds list-of-dicts or None).
        """
        fo = self.backbone(imgs, mats, points=points, train=train)
        if lidar_seg and not train:
            return fo, None
        preds = self.head(fo['bev_feature'], train)
        return fo, preds
