"""Visualization helpers (reference src/utils/vis_utils.py:27-128).

Colormapping for depth/semantic/BEV panels used by TensorBoard-style image
logging and the offline --vis dumps. Pure numpy (host side).
"""
from __future__ import annotations

import numpy as np

# 18-color palette (vis_utils.py:27-46), RGB uint8
SEMANTIC_PALETTE = np.array([
    [0, 0, 0],          # 0 other/noise
    [112, 128, 144],    # 1 barrier
    [220, 20, 60],      # 2 bicycle
    [255, 127, 80],     # 3 bus
    [255, 158, 0],      # 4 car
    [233, 150, 70],     # 5 construction_vehicle
    [255, 61, 99],      # 6 motorcycle
    [0, 0, 230],        # 7 pedestrian
    [47, 79, 79],       # 8 traffic_cone
    [255, 140, 0],      # 9 trailer
    [255, 99, 71],      # 10 truck
    [0, 207, 191],      # 11 driveable_surface
    [175, 0, 75],       # 12 other_flat
    [75, 0, 75],        # 13 sidewalk
    [112, 180, 60],     # 14 terrain
    [222, 184, 135],    # 15 manmade
    [0, 175, 0],        # 16 vegetation
    [255, 255, 255],    # 17 free
], dtype=np.uint8)


def visualize_depth(depth: np.ndarray, vmin: float = 2.0,
                    vmax: float = 70.4) -> np.ndarray:
    """(H, W) depth -> (H, W, 3) uint8 turbo-like colormap."""
    import matplotlib
    d = np.clip((np.asarray(depth, np.float32) - vmin) / (vmax - vmin), 0, 1)
    cmap = matplotlib.colormaps.get_cmap('turbo')
    return (cmap(d)[..., :3] * 255).astype(np.uint8)


def visualize_semantic(labels: np.ndarray) -> np.ndarray:
    """(H, W) int labels -> (H, W, 3) uint8 palette colors."""
    lab = np.clip(np.asarray(labels, np.int64), 0,
                  len(SEMANTIC_PALETTE) - 1)
    return SEMANTIC_PALETTE[lab]


def tile_cameras(imgs: np.ndarray) -> np.ndarray:
    """(6, H, W, C) camera panels -> one (2H, 3W, C) tile: front row =
    cams 0..2, back row = cams 5..3 mirrored (base_exp.py:440-442 layout)."""
    top = np.concatenate([imgs[0], imgs[1], imgs[2]], axis=1)
    bottom = np.concatenate([imgs[5], imgs[4], imgs[3]], axis=1)
    return np.concatenate([top, bottom], axis=0)
