"""Device mesh and sharding layout.

The reference's only parallelism is DDP data parallelism over NCCL
(base_cli.py:72,84,105). The TPU-native decomposition (SURVEY.md §2.4):

  * `dp`  — batch sharding (gradients psum over ICI, implicit in sharded
            autodiff under jit);
  * `cam` — camera-axis model sharding for the 6-view encoder + lifting: each
            device encodes N/cam cameras, and the masked camera mean's
            numerator/denominator sums become an ICI all-reduce that XLA
            inserts at the `sum over cameras` in FieldBackbone._lift
            (vectorized mode).

SyncBN falls out for free: batch statistics are computed over the *global*
batch because the jitted computation is written globally.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, cam: int = 1,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // cam
    assert dp * cam == len(devices), (dp, cam, len(devices))
    arr = np.asarray(devices).reshape(dp, cam)
    return Mesh(arr, ('dp', 'cam'))


def default_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    """The standard dp x cam policy (one place — trainer, cli and the
    multichip dryrun all use it): shard the 6-camera axis over 2 devices
    whenever the device count is even (> 1), else pure dp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    cam = 2 if (n % 2 == 0 and n > 1) else 1
    return make_mesh(dp=n // cam, cam=cam, devices=devices)


# leading-axis layout of a training batch: everything is batch-major except
# the camera-carrying arrays which also shard their camera axis. Value =
# the key's SINGLE-FRAME ndim (camera axis 1); multi-frame batches
# (sweep_idxes/key_idxes, data/nuscenes.py stack_frames) carry one extra
# frame axis at dim 1, moving the camera axis to dim 2.
_CAM_AXIS_KEYS = {'imgs': 5, 'sensor2ego': 4, 'intrin': 4, 'ida': 4,
                  'sensor2sensor': 4, 'depth_labels': 4, 'seg_labels': 4}


def batch_pspecs(batch: Dict[str, Any]) -> Dict[str, P]:
    specs = {}
    for k, v in batch.items():
        nd = getattr(v, 'ndim', None)
        base = _CAM_AXIS_KEYS.get(k)
        if base is not None and nd == base:
            specs[k] = P('dp', 'cam')
        elif base is not None and nd == base + 1:
            specs[k] = P('dp', None, 'cam')    # (B, F, N, ...)
        else:
            specs[k] = P('dp')
    return specs


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    specs = batch_pspecs(batch)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)
