"""mmdet-style ResNet in flax.linen (NHWC, channels-last TPU layout).

Covers both uses in the reference:
  * image backbone: ResNet-50, pytorch-style blocks, out_indices (0,1,2,3),
    frozen stem (`frozen_stages=0`), BN trained (`norm_eval=False`)
    (base_exp.py:64-74);
  * BEV trunk: ResNet-18-ish, in 80ch, base_channels 160, 3 stages,
    strides (1,2,2), maxpool removed (bev_depth_head.py:130-134,153-163).

Weight-compatible with torchvision ResNets through
`vampire_tpu.utils.torch_weights.load_torchvision_resnet`.

BatchNorm runs in fp32 with running stats; under pjit the batch statistics are
computed over the *global* batch (the sharded computation is written globally),
which reproduces the reference's SyncBN (base_cli.py:78,91) without explicit
cross-replica collectives.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# Reference init: Conv weights ~ N(0, sqrt(2 / (prod(kernel) * out_channels)))
# (base_vampire2.py:216-224). This is Kaiming-normal with fan_out, which we use
# for every conv in the framework unless noted.
def kaiming_out(key, shape, dtype=jnp.float32):
    # linen conv kernel shape: (*kernel_spatial, in_ch, out_ch)
    import jax
    fan_out = shape[-1]
    for k in shape[:-2]:
        fan_out *= k
    std = (2.0 / fan_out) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm [+ ReLU]."""
    features: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    bn_momentum: float = 0.9   # torch momentum 0.1
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.kernel // 2, self.kernel // 2)] * 2,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=kaiming_out)(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_eps,
                         dtype=jnp.float32, param_dtype=jnp.float32)(
                             x.astype(jnp.float32))
        x = x.astype(self.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = ConvBN(self.planes, 3, self.stride, relu=True,
                     dtype=self.dtype, name='conv1')(x, train)
        out = ConvBN(self.planes, 3, 1, relu=False,
                     dtype=self.dtype, name='conv2')(out, train)
        if self.downsample:
            identity = ConvBN(self.planes, 1, self.stride, relu=False,
                              dtype=self.dtype, name='downsample')(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """pytorch-style bottleneck: stride lives in the 3x3 conv."""
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = ConvBN(self.planes, 1, 1, relu=True, dtype=self.dtype,
                     name='conv1')(x, train)
        out = ConvBN(self.planes, 3, self.stride, relu=True, dtype=self.dtype,
                     name='conv2')(out, train)
        out = ConvBN(self.planes * self.expansion, 1, 1, relu=False,
                     dtype=self.dtype, name='conv3')(out, train)
        if self.downsample:
            identity = ConvBN(self.planes * self.expansion, 1, self.stride,
                              relu=False, dtype=self.dtype,
                              name='downsample')(x, train)
        return nn.relu(out + identity)


_ARCH = {
    10: (BasicBlock, (1, 1, 1, 1), 1),   # test-size arch (not in mmdet)
    18: (BasicBlock, (2, 2, 2, 2), 1),
    34: (BasicBlock, (3, 4, 6, 3), 1),
    50: (Bottleneck, (3, 4, 6, 3), 4),
    101: (Bottleneck, (3, 4, 23, 3), 4),
}


class ResNet(nn.Module):
    """mmdet-compatible ResNet returning the feature pyramid.

    Args mirror the reference configs; `with_maxpool=False` + `prepend_input`
    reproduce the BEV trunk's deleted maxpool and `trunk_outs = [x] + stages`
    (bev_depth_head.py:134,152-163).
    """
    depth: int = 50
    num_stages: int = 4
    base_channels: int = 64
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    with_stem: bool = True
    with_maxpool: bool = True
    frozen_stem: bool = False   # frozen_stages=0 in mmdet terms
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        block_cls, stage_blocks, expansion = _ARCH[self.depth]
        outs = []
        if self.with_stem:
            # stem BN uses running stats when frozen (mmdet _freeze_stages)
            stem_train = train and not self.frozen_stem
            x = ConvBN(self.base_channels, 7, 2, relu=True, dtype=self.dtype,
                       name='stem')(x, stem_train)
            if self.frozen_stem:
                import jax
                x = jax.lax.stop_gradient(x)
            if self.with_maxpool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(self.num_stages):
            planes = self.base_channels * (2 ** i)
            n_blocks = stage_blocks[i]
            stride = self.strides[i]
            for j in range(n_blocks):
                s = stride if j == 0 else 1
                need_ds = (j == 0) and (s != 1 or
                                        x.shape[-1] != planes * expansion)
                x = block_cls(planes, s, need_ds, dtype=self.dtype,
                              name=f'layer{i + 1}_{j}')(x, train)
            if i in self.out_indices:
                outs.append(x)
        return outs
