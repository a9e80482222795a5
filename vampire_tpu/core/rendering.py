"""Volume rendering: VolSDF-style densities and alpha compositing.

Re-derives `src/utils/render_utils.py` (Laplace-CDF densities with learnable
beta) and the compositing math of
`BaseVAMPIRE2.volume_rendering_from_multiple_views`
(`base_vampire2.py:391-467`) as pure functions over a sample axis.

Compositing runs in fp32: transmittance is exp(-cumsum(sigma*delta)) and the
exclusive cumulative sum over the ray axis is precision-sensitive. (The
reference leaves this in fp16 under AMP; we deliberately keep fp32 — it is
VPU-bound elementwise work and costs nothing on TPU.)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def laplace_density(sdf: jnp.ndarray, beta: jnp.ndarray,
                    bias: float = 0.0, beta_min: float = 1e-4) -> jnp.ndarray:
    """alpha * Laplace(loc=0, scale=beta).cdf(-(sdf - bias)).

    `ModifyLaplaceDensity` of the reference (`render_utils.py:30-46`):
      beta_eff = |beta| + beta_min; alpha = 1/beta_eff
      density  = alpha * (0.5 + 0.5*sign(s)*expm1(-|s|/beta_eff)), s = sdf - bias

    `beta` is a learnable scalar parameter (init 0.1).
    """
    s = sdf.astype(jnp.float32) - bias
    beta_eff = jnp.abs(beta).astype(jnp.float32) + beta_min
    alpha = 1.0 / beta_eff
    return alpha * (0.5 + 0.5 * jnp.sign(s) * jnp.expm1(-jnp.abs(s) / beta_eff))


def naive_density(x: jnp.ndarray) -> jnp.ndarray:
    """density_mode='naive': plain sigmoid (base_vampire2.py:191-192)."""
    return jax.nn.sigmoid(x.astype(jnp.float32))


def transmittance_weights(density: jnp.ndarray, delta: jnp.ndarray,
                          axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Alpha-compositing weights along `axis`.

    w_i = (1 - exp(-sigma_i*delta_i)) * exp(-sum_{j<i} sigma_j*delta_j)
    (base_vampire2.py:429-434). Returns (weights, acc = sum_i w_i).
    """
    sd = density.astype(jnp.float32) * delta.astype(jnp.float32)
    alpha = 1.0 - jnp.exp(-sd)
    # exclusive cumsum of sd along axis
    csum = jnp.cumsum(sd, axis=axis)
    excl = csum - sd
    trans = jnp.exp(-excl)
    w = alpha * trans
    return w, jnp.sum(w, axis=axis)


def composite(weights: jnp.ndarray, values: jnp.ndarray, axis: int) -> jnp.ndarray:
    """sum_i w_i * v_i along the sample axis."""
    return jnp.sum(weights.astype(jnp.float32) * values.astype(jnp.float32),
                   axis=axis)


def render_camera_rays(sdf: jnp.ndarray,
                       seg_logits: jnp.ndarray,
                       rgb: jnp.ndarray,
                       geom_xyz: jnp.ndarray,
                       camera_mids: jnp.ndarray,
                       density_fn,
                       bg_depth: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-camera rays (camera branch, base_vampire2.py:419-440).

    Args:
      sdf:        (B, N, S, h, w)    sampled (masked) SDF/density feature.
      seg_logits: (B, N, S, h, w, K) sampled semantic logits.
      rgb:        (B, N, S, h, w, 3) sampled rgb.
      geom_xyz:   (B, N, S+1, h, w, 3) ego points along rays (for deltas).
      camera_mids:(S,) depth bin midpoints.
      density_fn: maps SDF -> density (e.g. laplace_density partial).
      bg_depth:   background depth (d_bound[1]).

    Returns:
      (rgb_preds (B,N,3,h,w)-style channels-last (B,N,h,w,3),
       seg_preds (B,N,h,w,K), depth_preds (B,N,h,w)).
    """
    density = density_fn(sdf)                                     # (B,N,S,h,w)
    delta = jnp.linalg.norm(
        geom_xyz[:, :, 1:].astype(jnp.float32)
        - geom_xyz[:, :, :-1].astype(jnp.float32), axis=-1)       # (B,N,S,h,w)
    w, acc = transmittance_weights(density, delta, axis=2)        # (B,N,S,h,w)
    bg = (1.0 - acc) * bg_depth
    rgb_preds = composite(w[..., None], rgb, axis=2)
    seg_preds = composite(w[..., None], seg_logits, axis=2)
    mids = camera_mids.astype(jnp.float32)[None, None, :, None, None]
    depth_preds = composite(w, mids * jnp.ones_like(w), axis=2) + bg
    return rgb_preds, seg_preds, depth_preds


def render_bev_columns(density: jnp.ndarray,
                       seg_logits: jnp.ndarray,
                       rgb: jnp.ndarray,
                       bev_mids: jnp.ndarray,
                       delta_z: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite the z-flipped det-grid columns (BEV branch,
    base_vampire2.py:442-461). Inputs are already z-flipped (index 0 = top).

    Args:
      density: (B, S, Y, X) densities (after density_fn).
      seg_logits: (B, S, Y, X, K); rgb: (B, S, Y, X, 3).
      bev_mids: (S,) z-flipped cell-center heights.
      delta_z: constant z step (z_bound_det[2]).

    Returns:
      (bev_rgb (B,Y,X,3), bev_seg (B,Y,X,K), bev_height (B,Y,X)).
    """
    delta = jnp.full_like(density, delta_z, dtype=jnp.float32)
    w, _ = transmittance_weights(density, delta, axis=1)
    bev_rgb = composite(w[..., None], rgb, axis=1)
    bev_seg = composite(w[..., None], seg_logits, axis=1)
    mids = bev_mids.astype(jnp.float32)[None, :, None, None]
    bev_height = composite(w, mids * jnp.ones_like(w), axis=1)
    return bev_rgb, bev_seg, bev_height
