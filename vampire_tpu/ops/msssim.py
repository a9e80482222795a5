"""Multi-scale SSIM in JAX (torchmetrics-compatible defaults).

Used by the RGB reconstruction loss (base_exp.py:286,547:
`MultiScaleStructuralSimilarityIndexMeasure(data_range=1.0)`), with gaussian
kernel 11/sigma 1.5, betas (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), relu
normalization, valid-region (unpadded) convolution, and 2x avg-pool between
scales. Note: every published experiment runs with rgb loss weight 0, so this
term never contributes to the flagship recipe — implemented for completeness.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BETAS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur_valid(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur with VALID padding; x: (B, H, W, C)."""
    c = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1),
                                        ('NHWC', 'HWIO', 'NHWC'))
    # depthwise separable blur via feature_group_count
    wh = jnp.broadcast_to(k.reshape(-1, 1, 1, 1), (k.size, 1, 1, c))
    ww = jnp.broadcast_to(k.reshape(1, -1, 1, 1), (1, k.size, 1, c))
    x = jax.lax.conv_general_dilated(x, wh, (1, 1), 'VALID',
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, ww, (1, 1), 'VALID',
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def _ssim_mcs(x: jnp.ndarray, y: jnp.ndarray, k: jnp.ndarray,
              data_range: float, k1: float, k2: float
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur_valid(x, k)
    mu_y = _blur_valid(y, k)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _blur_valid(x * x, k) - mu_xx
    sig_y = _blur_valid(y * y, k) - mu_yy
    sig_xy = _blur_valid(x * y, k) - mu_xy
    cs = (2 * sig_xy + c2) / (sig_x + sig_y + c2)
    ssim = ((2 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs
    return jnp.mean(ssim, axis=(1, 2, 3)), jnp.mean(cs, axis=(1, 2, 3))


def ms_ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0,
            kernel_size: int = 11, sigma: float = 1.5,
            betas: Sequence[float] = _BETAS,
            k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """MS-SSIM over a batch; inputs (B, H, W, C). Returns scalar mean."""
    k = jnp.asarray(_gaussian_kernel(kernel_size, sigma))
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    mcs_list = []
    ssim_val = None
    for i in range(len(betas)):
        ssim_val, cs = _ssim_mcs(x, y, k, data_range, k1, k2)
        mcs_list.append(cs)
        if i < len(betas) - 1:
            # 2x avg pool; VALID windowing drops a trailing odd row/col,
            # matching torch F.avg_pool2d(2) floor behavior (a zero-pad here
            # would average phantom black pixels into every border mean)
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), 'VALID') / 4.0
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), 'VALID') / 4.0
    # relu normalization (torchmetrics normalize='relu')
    mcs = jnp.stack([jax.nn.relu(m) for m in mcs_list[:-1]])   # (L-1, B)
    ssim_val = jax.nn.relu(ssim_val)
    betas_arr = jnp.asarray(betas, jnp.float32)
    prod = jnp.prod(mcs ** betas_arr[:-1, None], axis=0)
    return jnp.mean(prod * ssim_val ** betas_arr[-1])
