"""3D hourglass U-Net over the ego voxel grid (NDHWC).

Re-implements `Unet3D`/`Hourglass3D` (base_vampire2.py:17-78): two stacked
hourglasses with skip connections, LeakyReLU(0.01), and align_corners=True
trilinear upsampling (done here as separable interpolation matmuls on the MXU
rather than a gather — shapes are static).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.sampling import resize_linear
from .resnet import kaiming_out


class Conv3d(nn.Module):
    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3, 3, 3),
                       strides=(self.stride,) * 3,
                       padding=[(1, 1)] * 3,
                       use_bias=self.use_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, kernel_init=kaiming_out)(x)


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.01)


class Hourglass3D(nn.Module):
    """base_vampire2.py:32-78. Returns (out, pre, post)."""
    mid_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, presqu: Optional[jnp.ndarray],
                 postsqu: Optional[jnp.ndarray]):
        m2 = 2 * self.mid_channels
        out = _leaky(Conv3d(m2, 2, dtype=self.dtype, name='conv1')(x))
        pre = Conv3d(m2, 1, dtype=self.dtype, name='conv2')(out)
        pre = _leaky(pre + postsqu) if postsqu is not None else _leaky(pre)
        out = _leaky(Conv3d(m2, 2, dtype=self.dtype, name='conv3')(pre))
        out = _leaky(Conv3d(m2, 1, dtype=self.dtype, name='conv4')(out))
        out = resize_linear(out, pre.shape[1:4], (1, 2, 3))
        out = Conv3d(m2, 1, dtype=self.dtype, name='conv5')(out)
        post = _leaky(out + presqu) if presqu is not None else _leaky(out + pre)
        out = resize_linear(post, x.shape[1:4], (1, 2, 3))
        out = Conv3d(self.mid_channels, 1, dtype=self.dtype, name='conv6')(out)
        return out, pre, post


class Unet3D(nn.Module):
    """base_vampire2.py:17-30: init conv + two hourglasses with residuals."""
    mid_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dres = Conv3d(self.mid_channels, 1, dtype=self.dtype,
                      name='init_dres')(x)
        out1, pre1, post1 = Hourglass3D(self.mid_channels, dtype=self.dtype,
                                        name='hg1')(dres, None, None)
        out1 = out1 + dres
        out2, _, _ = Hourglass3D(self.mid_channels, dtype=self.dtype,
                                 name='hg2')(out1, pre1, post1)
        return out2 + dres


class ConvSoftplus3D(nn.Module):
    """BaseLSS base_conv: Conv3d(bias=True) + Softplus(beta=100)
    (base_lss.py:117-123)."""
    mid_channels: int
    beta: float = 100.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.mid_channels, 1, use_bias=True, dtype=self.dtype,
                   name='conv')(x)
        # torch Softplus(beta): 1/beta * log(1 + exp(beta*x)), with the linear
        # region above threshold (20/beta) for stability
        xf = x.astype(jnp.float32)
        soft = jnp.where(xf * self.beta > 20.0, xf,
                         jnp.log1p(jnp.exp(jnp.minimum(xf * self.beta, 20.0)))
                         / self.beta)
        return soft.astype(x.dtype)
