"""Torchvision ResNet checkpoint -> flax params converter.

The reference initializes its image backbone from torchvision
(`init_cfg=dict(type='Pretrained', checkpoint='torchvision://resnet50')`,
base_exp.py:73). This loads a torchvision state dict (from a local .pth file —
this environment has no network egress) and maps it onto
`vampire_tpu.models.resnet.ResNet` params.

Mapping (torchvision -> flax ResNet):
  conv1/bn1                 -> stem (ConvBN)
  layer{i}.{j}.conv{k}/bn{k}-> layer{i}_{j}/conv{k} (ConvBN)
  layer{i}.{j}.downsample   -> layer{i}_{j}/downsample
Conv kernels transpose OIHW -> HWIO. BN weight/bias -> scale/bias;
running_mean/var -> batch_stats.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_torchvision_resnet(state_dict: Dict[str, "object"],
                               depth: int = 50
                               ) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) pytrees for models.resnet.ResNet."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    convbn_into(params, stats, sd, 'stem', 'conv1', 'bn1')
    stage_blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                    101: (3, 4, 23, 3)}[depth]
    n_convs = 3 if depth >= 50 else 2
    for i, nb in enumerate(stage_blocks):
        for j in range(nb):
            base = f'layer{i + 1}.{j}'
            name = f'layer{i + 1}_{j}'
            blk_p: dict = {}
            blk_s: dict = {}
            for k in range(1, n_convs + 1):
                convbn_into(blk_p, blk_s, sd, f'conv{k}',
                            f'{base}.conv{k}', f'{base}.bn{k}')
            if f'{base}.downsample.0.weight' in sd:
                convbn_into(blk_p, blk_s, sd, 'downsample',
                            f'{base}.downsample.0', f'{base}.downsample.1')
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


def convbn_into(params: dict, stats: dict, sd: dict, flax_name: str,
                conv_key: str, bn_key: str) -> None:
    params[flax_name] = {
        'Conv_0': {'kernel': _conv(sd[conv_key + '.weight'])},
        'BatchNorm_0': {'scale': sd[bn_key + '.weight'],
                        'bias': sd[bn_key + '.bias']},
    }
    stats[flax_name] = {
        'BatchNorm_0': {'mean': sd[bn_key + '.running_mean'],
                        'var': sd[bn_key + '.running_var']},
    }


def load_torchvision_resnet(path: str, depth: int = 50) -> Tuple[dict, dict]:
    """Load a torchvision resnet .pth (torch CPU) and convert."""
    import torch
    sd = torch.load(path, map_location='cpu', weights_only=True)
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    return convert_torchvision_resnet(
        {k: v.numpy() for k, v in sd.items()}, depth)


def graft_into_variables(variables: dict, backbone_params: dict,
                         backbone_stats: dict,
                         prefix=('backbone', 'img_backbone')) -> dict:
    """Replace the image-backbone subtree of a full model variables dict.

    Pure: returns a new tree (fresh dicts along the modified path); the
    caller's `variables` is left untouched. Shapes must match exactly —
    a layout mismatch raises instead of silently reshaping.
    """
    import jax

    def check(o, n):
        n = np.asarray(n, dtype=o.dtype)
        if n.shape != o.shape:
            raise ValueError(
                f'pretrained kernel shape {n.shape} != model {o.shape}')
        return n

    def replace(tree, path, sub):
        new = dict(tree)
        if len(path) == 1:
            new[path[0]] = jax.tree.map(check, tree[path[0]], sub)
        else:
            new[path[0]] = replace(tree[path[0]], path[1:], sub)
        return new

    out = dict(variables)
    out['params'] = replace(variables['params'], prefix, backbone_params)
    out['batch_stats'] = replace(variables['batch_stats'], prefix,
                                 backbone_stats)
    return out
