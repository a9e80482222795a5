"""3D hourglass U-Net over the ego voxel grid.

Re-implements `Unet3D`/`Hourglass3D` (base_vampire2.py:17-78): two stacked
hourglasses with skip connections, LeakyReLU(0.01), and align_corners=True
trilinear upsampling (separable interpolation matmuls on the MXU).

TPU layout: the U-Net's 16-32 channels use only 16-32 of the MXU's 128
lanes, so the native NDHWC conv3d runs badly under-utilized. With
`z_channels=True` (default) the whole net runs in a (B, Y, X, Z*C) layout
where each 3x3x3 conv becomes ONE 2D 3x3 conv whose (Z*C_in, Z_out*C_out)
kernel is the block-banded expansion of the 3D kernel — 6.7x the FLOPs but
~full MXU lanes. Measured per full-res conv on v5e: forward 4.6 -> 3.0 ms,
backward 17.6 -> 5.9 ms (scripts/perf_conv3d.py). Exact conv3d semantics
(same parameters, same math — pinned by tests/test_unet3d.py).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..core.sampling import resize_linear
from .resnet import kaiming_out


def _banded_kernel(k: jnp.ndarray, z_in: int, z_out: int,
                   stride: int) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) conv3d kernel -> (3, 3, z_in*Cin, z_out*Cout)
    block-banded 2D kernel: out[zo] = sum_dz in[zo*stride + dz - 1] * k[dz]
    (stride-z folded into the band structure; padding 1 in z)."""
    Cin, Cout = k.shape[3], k.shape[4]
    kb = jnp.zeros((3, 3, z_in * Cin, z_out * Cout), k.dtype)
    for zo in range(z_out):
        for dz in range(3):
            zi = zo * stride + dz - 1
            if 0 <= zi < z_in:
                kb = kb.at[:, :, zi * Cin:(zi + 1) * Cin,
                           zo * Cout:(zo + 1) * Cout].set(k[dz])
    return kb


class Conv3d(nn.Module):
    """3x3x3 conv, padding 1, optional uniform stride.

    Native mode (`z_in=None`): x is (B, Z, Y, X, C), lax conv3d NDHWC.
    Z-channels mode (`z_in=Z`): x is (B, Y, X, Z*C); the banded 2D conv
    computes the identical conv3d (z-stride via the band layout).
    Parameters are the (3, 3, 3, Cin, Cout) 3D kernel in both modes.
    """
    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, z_in: Optional[int] = None):
        if z_in is None:
            cin = x.shape[-1]
        else:
            cin = x.shape[-1] // z_in
        k = self.param('kernel', kaiming_out,
                       (3, 3, 3, cin, self.features), jnp.float32)
        b = (self.param('bias', nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        if z_in is None:
            y = lax.conv_general_dilated(
                x.astype(self.dtype), k.astype(self.dtype),
                (self.stride,) * 3, [(1, 1)] * 3,
                dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
            if b is not None:
                y = y + b.astype(self.dtype)
            return y
        z_out = (z_in - 1) // self.stride + 1
        kb = _banded_kernel(k, z_in, z_out, self.stride)
        y = lax.conv_general_dilated(
            x.astype(self.dtype), kb.astype(self.dtype),
            (self.stride,) * 2, [(1, 1)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if b is not None:
            y = y + jnp.tile(b, z_out).astype(self.dtype)
        return y


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.01)


def _resize_zc(x: jnp.ndarray, z_in: int, ch: int,
               out_zyx: Tuple[int, int, int]) -> jnp.ndarray:
    """align_corners=True trilinear resize of a z-channels tensor:
    (B, Y, X, z_in*ch) -> (B, out_y, out_x, out_z*ch)."""
    B, Y, X, _ = x.shape
    oz, oy, ox = out_zyx
    x = x.reshape(B, Y, X, z_in, ch)
    x = resize_linear(x, (oy, ox, oz), (1, 2, 3))
    return x.reshape(B, oy, ox, oz * ch)


class Hourglass3D(nn.Module):
    """base_vampire2.py:32-78. Returns (out, pre, post).

    In z-channels mode every tensor is (B, Y, X, Z*C) with the z extent
    tracked statically alongside.
    """
    mid_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, presqu, postsqu, z_in: Optional[int] = None):
        m2 = 2 * self.mid_channels
        if z_in is None:
            out = _leaky(Conv3d(m2, 2, dtype=self.dtype, name='conv1')(x))
            pre = Conv3d(m2, 1, dtype=self.dtype, name='conv2')(out)
            pre = _leaky(pre + postsqu) if postsqu is not None else _leaky(pre)
            out = _leaky(Conv3d(m2, 2, dtype=self.dtype, name='conv3')(pre))
            out = _leaky(Conv3d(m2, 1, dtype=self.dtype, name='conv4')(out))
            out = resize_linear(out, pre.shape[1:4], (1, 2, 3))
            out = Conv3d(m2, 1, dtype=self.dtype, name='conv5')(out)
            post = (_leaky(out + presqu) if presqu is not None
                    else _leaky(out + pre))
            out = resize_linear(post, x.shape[1:4], (1, 2, 3))
            out = Conv3d(self.mid_channels, 1, dtype=self.dtype,
                         name='conv6')(out)
            return out, pre, post

        z1 = (z_in - 1) // 2 + 1
        z2 = (z1 - 1) // 2 + 1
        out = _leaky(Conv3d(m2, 2, dtype=self.dtype, name='conv1')(x, z_in))
        pre = Conv3d(m2, 1, dtype=self.dtype, name='conv2')(out, z1)
        pre = _leaky(pre + postsqu) if postsqu is not None else _leaky(pre)
        y1, x1 = pre.shape[1:3]
        out = _leaky(Conv3d(m2, 2, dtype=self.dtype, name='conv3')(pre, z1))
        out = _leaky(Conv3d(m2, 1, dtype=self.dtype, name='conv4')(out, z2))
        out = _resize_zc(out, z2, m2, (z1, y1, x1))
        out = Conv3d(m2, 1, dtype=self.dtype, name='conv5')(out, z1)
        post = (_leaky(out + presqu) if presqu is not None
                else _leaky(out + pre))
        out = _resize_zc(post, z1, m2, (z_in,) + x.shape[1:3])
        out = Conv3d(self.mid_channels, 1, dtype=self.dtype,
                     name='conv6')(out, z_in)
        return out, pre, post


class Unet3D(nn.Module):
    """base_vampire2.py:17-30: init conv + two hourglasses with residuals."""
    mid_channels: int
    dtype: Any = jnp.float32
    z_channels: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.z_channels:
            dres = Conv3d(self.mid_channels, 1, dtype=self.dtype,
                          name='init_dres')(x)
            out1, pre1, post1 = Hourglass3D(self.mid_channels,
                                            dtype=self.dtype,
                                            name='hg1')(dres, None, None)
            out1 = out1 + dres
            out2, _, _ = Hourglass3D(self.mid_channels, dtype=self.dtype,
                                     name='hg2')(out1, pre1, post1)
            return out2 + dres

        B, Z, Y, X, C = x.shape
        xz = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, Y, X, Z * C)
        dres = Conv3d(self.mid_channels, 1, dtype=self.dtype,
                      name='init_dres')(xz, Z)
        out1, pre1, post1 = Hourglass3D(self.mid_channels, dtype=self.dtype,
                                        name='hg1')(dres, None, None, Z)
        out1 = out1 + dres
        out2, _, _ = Hourglass3D(self.mid_channels, dtype=self.dtype,
                                 name='hg2')(out1, pre1, post1, Z)
        out = out2 + dres
        out = out.reshape(B, Y, X, Z, self.mid_channels)
        return jnp.transpose(out, (0, 3, 1, 2, 4))


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
