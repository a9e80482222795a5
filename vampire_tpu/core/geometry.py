"""Coordinate grids and camera geometry (pure jnp, fp32).

Re-derives the reference's buffer builders and projection math
(`src/layers/backbones/base_vampire2.py:243-388`) as pure functions. All grid
builders return numpy-backed jnp arrays computed once at trace time; the
projective transforms are fp32 islands (the reference wraps them in
`autocast(enabled=False)`, base_vampire2.py:485).

Conventions (matching the reference):
  * 4x4 homogeneous matrices, applied as `M @ [x, y, z, 1]^T`.
  * `frustum[d, v, u] = (u_pix, v_pix, depth, 1)` in *final_dim* pixel units.
  * voxel grids are indexed (Z, Y, X) with coordinates stored as (x, y, z, 1).
  * occ grid is indexed (X, Y, Z) with coordinates (x, y, z) — Occ3D layout.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PREC = jax.lax.Precision.HIGHEST


def arange_bound(bound: Sequence[float]) -> np.ndarray:
    """np.arange(*bound) with float32 semantics (torch.arange equivalent)."""
    lo, hi, step = bound
    n = int(math.ceil((hi - lo) / step - 1e-9))
    return (lo + step * np.arange(n)).astype(np.float32)


def centers_of(bound: Sequence[float]) -> np.ndarray:
    """Cell-center linspace: torch.linspace(lo+s/2, hi-s/2, (hi-lo)/s)."""
    lo, hi, step = bound
    n = int(round((hi - lo) / step))
    return np.linspace(lo + step / 2.0, hi - step / 2.0, n, dtype=np.float32)


def make_frustum(final_dim: Tuple[int, int], downsample_factor: int,
                 d_bound: Sequence[float]) -> np.ndarray:
    """(D, fH, fW, 4) pixel-space frustum (base_vampire2.py:253-271).

    x/y are raw *final_dim* pixel coordinates (0..W-1 / 0..H-1) laid out on the
    downsampled fH x fW grid; z is the depth-plane distance; w=1.
    """
    ogf_h, ogf_w = final_dim
    f_h, f_w = ogf_h // downsample_factor, ogf_w // downsample_factor
    d = arange_bound(d_bound)                                   # (D,)
    D = d.shape[0]
    xs = np.linspace(0, ogf_w - 1, f_w, dtype=np.float32)        # (fW,)
    ys = np.linspace(0, ogf_h - 1, f_h, dtype=np.float32)        # (fH,)
    d_c = np.broadcast_to(d[:, None, None], (D, f_h, f_w))
    x_c = np.broadcast_to(xs[None, None, :], (D, f_h, f_w))
    y_c = np.broadcast_to(ys[None, :, None], (D, f_h, f_w))
    ones = np.ones_like(d_c)
    return np.stack([x_c, y_c, d_c, ones], axis=-1)              # (D,fH,fW,4)


def make_camera_mids(d_bound: Sequence[float]) -> np.ndarray:
    """(D-1,) midpoints of adjacent depth planes (base_vampire2.py:243-246)."""
    t = arange_bound(d_bound)
    return 0.5 * (t[:-1] + t[1:])


def make_bev_mids(z_bound_det: Sequence[float]) -> np.ndarray:
    """z-flipped det-grid cell centers (base_vampire2.py:248-251)."""
    return centers_of(z_bound_det)[::-1].copy()


def make_voxel_coords(x_bound, y_bound, z_bound) -> np.ndarray:
    """(Z, Y, X, 4) homogeneous cell-center coords (base_vampire2.py:273-293)."""
    zs, ys, xs = centers_of(z_bound), centers_of(y_bound), centers_of(x_bound)
    zg, yg, xg = np.meshgrid(zs, ys, xs, indexing='ij')
    ones = np.ones_like(xg)
    return np.stack([xg, yg, zg, ones], axis=-1).astype(np.float32)


def make_norm_voxel_coords(x_bound, y_bound, z_bound) -> np.ndarray:
    """(Z, Y, X, 3) coords normalized to [-1, 1] in (x, y, z) order."""
    def norm(b):
        c = centers_of(b)
        return (c - b[0]) / (b[1] - b[0])
    zg, yg, xg = np.meshgrid(norm(z_bound), norm(y_bound), norm(x_bound),
                             indexing='ij')
    return (np.stack([xg, yg, zg], axis=-1) * 2.0 - 1.0).astype(np.float32)


def make_occ_coords(point_cloud_range=(-40.0, -40.0, -1.0, 40.0, 40.0, 5.4),
                    voxel_size=(0.4, 0.4, 0.4),
                    grid=(200, 200, 16)) -> np.ndarray:
    """(200, 200, 16, 3) Occ3D voxel centers, indexed (X, Y, Z)
    (base_vampire2.py:295-312)."""
    gx, gy, gz = grid
    ix, iy, iz = np.meshgrid(np.arange(gx), np.arange(gy), np.arange(gz),
                             indexing='ij')
    x = ix * voxel_size[0] + voxel_size[0] / 2 + point_cloud_range[0]
    y = iy * voxel_size[1] + voxel_size[1] / 2 + point_cloud_range[1]
    z = iz * voxel_size[2] + voxel_size[2] / 2 + point_cloud_range[2]
    return np.stack([x, y, z], axis=-1).astype(np.float32)


# ---------------------------------------------------------------------------
# Projective transforms (fp32 islands)
# ---------------------------------------------------------------------------

def get_geometry(frustum: jnp.ndarray,
                 sensor2ego: jnp.ndarray,
                 intrin: jnp.ndarray,
                 ida: jnp.ndarray,
                 bda: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Frustum pixel grid -> ego-frame xyz (base_vampire2.py:314-349).

    Args:
      frustum: (D, fH, fW, 4) pixel-space frustum.
      sensor2ego, intrin, ida: (B, N, 4, 4) per-camera matrices.
      bda: optional (B, 4, 4) BEV augmentation matrix.

    Returns:
      (B, N, D, fH, fW, 3) ego xyz.
    """
    f32 = jnp.float32
    frustum = frustum.astype(f32)
    sensor2ego, intrin, ida = (m.astype(f32) for m in (sensor2ego, intrin, ida))
    b, n = sensor2ego.shape[:2]
    # undo image-space augmentation
    pts = jnp.einsum('bnij,dhwj->bndhwi', jnp.linalg.inv(ida), frustum,
                     precision=_PREC)
    # pixel * depth -> camera homogeneous
    pts = jnp.concatenate([pts[..., :2] * pts[..., 2:3], pts[..., 2:]], axis=-1)
    combine = jnp.matmul(sensor2ego, jnp.linalg.inv(intrin), precision=_PREC)
    pts = jnp.einsum('bnij,bndhwj->bndhwi', combine, pts, precision=_PREC)
    if bda is not None:
        pts = jnp.einsum('bij,bndhwj->bndhwi', bda.astype(f32), pts,
                         precision=_PREC)
    return pts[..., :3]


def get_pixel(voxel_coords: jnp.ndarray,
              sensor2ego: jnp.ndarray,
              intrin: jnp.ndarray,
              ida: jnp.ndarray,
              bda: Optional[jnp.ndarray],
              eps: float = 1e-6) -> jnp.ndarray:
    """Ego-frame voxel centers -> per-camera (u, v, depth)
    (base_vampire2.py:351-388).

    Args:
      voxel_coords: (Z, Y, X, 4) homogeneous ego coords.
      sensor2ego, intrin, ida: (B, N, 4, 4).
      bda: optional (B, 4, 4).

    Returns:
      (B, N, Z, Y, X, 3): x/y are *final_dim* pixel coordinates after ida,
      z is the camera-frame depth (unclamped).
    """
    f32 = jnp.float32
    pts = voxel_coords.astype(f32)
    sensor2ego, intrin, ida = (m.astype(f32) for m in (sensor2ego, intrin, ida))
    if bda is not None:
        pts = jnp.einsum('bij,zyxj->bzyxi', jnp.linalg.inv(bda.astype(f32)),
                         pts, precision=_PREC)
        combine = jnp.matmul(intrin, jnp.linalg.inv(sensor2ego), precision=_PREC)
        pts = jnp.einsum('bnij,bzyxj->bnzyxi', combine, pts, precision=_PREC)
    else:
        combine = jnp.matmul(intrin, jnp.linalg.inv(sensor2ego), precision=_PREC)
        pts = jnp.einsum('bnij,zyxj->bnzyxi', combine, pts, precision=_PREC)
    z = pts[..., 2:3]
    # torch.clamp(z, min=eps): behind-camera depths are clamped, producing huge
    # pixel coords that the validity mask later rejects (z > d_bound[0]).
    pts = jnp.concatenate([pts[..., :2] / jnp.maximum(z, eps), pts[..., 2:]],
                          axis=-1)
    pts = jnp.einsum('bnij,bnzyxj->bnzyxi', ida, pts, precision=_PREC)
    return pts[..., :3]


def rotate_occ_coords(occ_coords: jnp.ndarray, bda: jnp.ndarray) -> jnp.ndarray:
    """Apply bda's 3x3 rotation to the occ grid (base_vampire2.py:598-601).

    Args:
      occ_coords: (X, Y, Z, 3).
      bda: (B, 4, 4).
    Returns:
      (B, X, Y, Z, 3).
    """
    rot = bda[:, :3, :3].astype(jnp.float32)
    return jnp.einsum('bij,xyzj->bxyzi', rot, occ_coords.astype(jnp.float32),
                      precision=_PREC)


def normalize_coords(xyz: jnp.ndarray, x_bound, y_bound, z_bound) -> jnp.ndarray:
    """Map ego xyz into the field grid's [-1, 1]^3 (grid_sample convention)."""
    lo = jnp.asarray([x_bound[0], y_bound[0], z_bound[0]], dtype=jnp.float32)
    ext = jnp.asarray([x_bound[1] - x_bound[0],
                       y_bound[1] - y_bound[0],
                       z_bound[1] - z_bound[0]], dtype=jnp.float32)
    return (xyz.astype(jnp.float32) - lo) / ext * 2.0 - 1.0


def inrange_mask(norm_xyz: jnp.ndarray) -> jnp.ndarray:
    """Validity mask for normalized coords: all components within [-1, 1]."""
    ok = (norm_xyz >= -1.0) & (norm_xyz <= 1.0)
    return ok[..., 0] & ok[..., 1] & ok[..., 2]
