"""SECOND-style FPN (mmdet3d `SECONDFPN`) in flax.linen, NHWC.

Per input scale: ConvTranspose(k=stride, s=stride, bias=False) when the
upsample stride >= 1 (stride 1 degenerates to a 1x1 conv), else
Conv(k=1/stride, s=1/stride, bias=False); each followed by BN(eps=1e-3,
momentum=0.01 torch = 0.99 flax) + ReLU; outputs are concatenated on channels.

Used twice in the reference:
  * image neck: in (256,512,1024,2048), strides (0.5,1,2,4), out 128x4
    -> 512ch at 1/8 scale (base_exp.py:75-89);
  * BEV neck: in (80,160,320,640), strides (1,2,4,8), out 64x4 -> 256ch
    at the 128x128 BEV scale (base_exp.py:134-137).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _kaiming_deconv(key, shape, dtype=jnp.float32):
    # linen ConvTranspose kernel: (*spatial, in_ch, out_ch); He normal fan_out
    fan_out = shape[-1]
    for k in shape[:-2]:
        fan_out *= k
    std = (2.0 / fan_out) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class SECONDFPN(nn.Module):
    in_channels: Tuple[int, ...]
    out_channels: Tuple[int, ...]
    upsample_strides: Tuple[float, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool) -> jnp.ndarray:
        assert len(feats) == len(self.in_channels)
        outs = []
        for i, x in enumerate(feats):
            stride = self.upsample_strides[i]
            out_ch = self.out_channels[i]
            if stride >= 1:
                s = int(stride)
                x = nn.ConvTranspose(out_ch, (s, s), strides=(s, s),
                                     padding='VALID', use_bias=False,
                                     dtype=self.dtype, param_dtype=jnp.float32,
                                     kernel_init=_kaiming_deconv,
                                     name=f'deblock{i}_conv')(x)
            else:
                s = int(round(1.0 / stride))
                x = nn.Conv(out_ch, (s, s), strides=(s, s), padding='VALID',
                            use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=_kaiming_deconv,
                            name=f'deblock{i}_conv')(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             name=f'deblock{i}_bn')(x.astype(jnp.float32))
            x = nn.relu(x).astype(self.dtype)
            outs.append(x)
        return jnp.concatenate(outs, axis=-1)
