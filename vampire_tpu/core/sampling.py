"""Trilinear field sampling (gather-based, XLA-friendly).

Implements the exact semantics of `torch.nn.functional.grid_sample` for 3D
volumes as used by the reference (`base_vampire2.py:419,442,507,590,594,608-609`):
  * coords are (x, y, z) in [-1, 1], x indexes the innermost (W) axis,
  * `align_corners=True`  : ix = (x + 1)/2 * (W - 1)
  * `align_corners=False` : ix = ((x + 1) * W - 1)/2
  * padding 'zeros'  : out-of-bounds corners contribute 0,
  * padding 'border' : coordinate is clamped to [0, size-1] first.

Volumes are channels-last (D, H, W, C) — the TPU-native layout (lanes on C).
All interpolation weights are computed in fp32; gathered values are accumulated
in fp32 and cast to `out_dtype`.

`sample_outer_product` is the fused lifting op: the reference materializes the
depth-distribution frustum tensor `depth ⊗ feat` of shape (B*N, C, D, h, w)
(~0.75 GB at B=4) and grid-samples it (`base_vampire2.py:553,507`); here the
trilinear sample distributes over the outer product, so we gather 8 scalars
from the depth volume and 4 C-vectors from the feature map per query instead —
the frustum tensor never exists.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    coord = coord.astype(jnp.float32)
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _corner(idx: jnp.ndarray, size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clamped int index + in-bounds mask."""
    inb = (idx >= 0) & (idx <= size - 1)
    return jnp.clip(idx, 0, size - 1), inb


def _prep_axis(coord, size, align_corners, border):
    """Returns (i0, i1, w1, inb0, inb1) for one axis."""
    x = _unnormalize(coord, size, align_corners)
    if border:
        x = jnp.clip(x, 0.0, float(size - 1))
    x0 = jnp.floor(x)
    w1 = x - x0
    i0 = x0.astype(jnp.int32)
    i1 = i0 + 1
    i0c, inb0 = _corner(i0, size)
    i1c, inb1 = _corner(i1, size)
    return (i0c, i1c), (1.0 - w1, w1), (inb0, inb1)



def map_unbatched(fn, *args):
    """Apply fn per leading-axis element via a static python unroll.

    jax.vmap rewrites jnp.take into a BATCHED gather, which forfeits XLA's
    fast row-gather path on TPU: a VMEM-resident-table take measured 2.8x
    slower under vmap(B=1), and batching gives no economy anyway
    (vmap(B=2) = 2x vmap(B=1); ROUND5.md job18). The leading axis here is
    the tiny per-device batch, so unrolling keeps every take on the fast
    path at zero cost.
    """
    B = args[0].shape[0]
    outs = [fn(*(a[b] for a in args)) for b in range(B)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)


def grid_sample_3d(vol: jnp.ndarray,
                   coords: jnp.ndarray,
                   align_corners: bool = True,
                   padding_mode: str = 'zeros',
                   out_dtype: Optional[jnp.dtype] = jnp.float32) -> jnp.ndarray:
    """Trilinear sample of a single volume.

    Args:
      vol: (D, H, W, C) channels-last volume.
      coords: (..., 3) normalized (x, y, z) coords in [-1, 1].
      align_corners / padding_mode: torch grid_sample semantics.
      out_dtype: accumulation happens in fp32; result is cast to this.

    Returns:
      (..., C) sampled values.
    """
    D, H, W, C = vol.shape
    border = padding_mode == 'border'
    lead = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    xi, xw, xm = _prep_axis(c[:, 0], W, align_corners, border)
    yi, yw, ym = _prep_axis(c[:, 1], H, align_corners, border)
    zi, zw, zm = _prep_axis(c[:, 2], D, align_corners, border)

    flat = vol.reshape(D * H * W, C)
    out = jnp.zeros((c.shape[0], C), dtype=jnp.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (zw[dz] * yw[dy] * xw[dx])
                inb = zm[dz] & ym[dy] & xm[dx]
                w = jnp.where(inb, w, 0.0)
                idx = (zi[dz] * H + yi[dy]) * W + xi[dx]
                vals = jnp.take(flat, idx, axis=0).astype(jnp.float32)
                out = out + vals * w[:, None]
    out = out.reshape(*lead, C)
    return out.astype(out_dtype) if out_dtype is not None else out


def batched_grid_sample_3d(vol: jnp.ndarray,
                           coords: jnp.ndarray,
                           align_corners: bool = True,
                           padding_mode: str = 'zeros',
                           out_dtype: Optional[jnp.dtype] = jnp.float32
                           ) -> jnp.ndarray:
    """vmap of grid_sample_3d over a leading batch axis.

    Args:
      vol: (B, D, H, W, C); coords: (B, ..., 3).
    Returns:
      (B, ..., C).
    """
    fn = functools.partial(grid_sample_3d, align_corners=align_corners,
                           padding_mode=padding_mode, out_dtype=out_dtype)
    return map_unbatched(fn, vol, coords)


def sample_outer_product(depth_vol: jnp.ndarray,
                         feat: jnp.ndarray,
                         coords: jnp.ndarray,
                         align_corners: bool = False,
                         out_dtype: Optional[jnp.dtype] = jnp.float32
                         ) -> jnp.ndarray:
    """Trilinear sample of the implicit volume `depth_vol ⊗ feat` (zeros padding).

    Equivalent to `grid_sample_3d(depth_vol[..., None] * feat[None], coords)`
    without materializing the (D, H, W, C) product: the trilinear weight sum
    factorizes as sum_{dy,dx} wy*wx*feat[y,x] * (sum_dz wz*depth[z,y,x]).

    Args:
      depth_vol: (D, H, W) depth distribution (e.g. softmax over D bins).
      feat: (H, W, C) per-pixel features.
      coords: (..., 3) normalized (x, y, z); x->W, y->H, z->D.

    Returns:
      (..., C) lifted features.
    """
    D, H, W = depth_vol.shape
    C = feat.shape[-1]
    lead = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    xi, xw, xm = _prep_axis(c[:, 0], W, align_corners, False)
    yi, yw, ym = _prep_axis(c[:, 1], H, align_corners, False)
    zi, zw, zm = _prep_axis(c[:, 2], D, align_corners, False)

    dflat = depth_vol.reshape(D * H * W)
    fflat = feat.reshape(H * W, C)
    out = jnp.zeros((c.shape[0], C), dtype=jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            inb2d = ym[dy] & xm[dx]
            w2d = jnp.where(inb2d, yw[dy] * xw[dx], 0.0)
            pix = yi[dy] * W + xi[dx]
            # depth interpolated along z at this (y, x) corner
            s = jnp.zeros_like(w2d)
            for dz in (0, 1):
                wz = jnp.where(zm[dz], zw[dz], 0.0)
                s = s + wz * jnp.take(dflat, zi[dz] * H * W + pix).astype(jnp.float32)
            fv = jnp.take(fflat, pix, axis=0).astype(jnp.float32)
            out = out + fv * (w2d * s)[:, None]
    out = out.reshape(*lead, C)
    return out.astype(out_dtype) if out_dtype is not None else out


def batched_sample_outer_product(depth_vol: jnp.ndarray,
                                 feat: jnp.ndarray,
                                 coords: jnp.ndarray,
                                 align_corners: bool = False,
                                 out_dtype: Optional[jnp.dtype] = jnp.float32
                                 ) -> jnp.ndarray:
    """vmap of sample_outer_product over a leading (batch*camera) axis."""
    fn = functools.partial(sample_outer_product, align_corners=align_corners,
                           out_dtype=out_dtype)
    return map_unbatched(fn, depth_vol, feat, coords)


# ---------------------------------------------------------------------------
# Separable align_corners=True linear interpolation (resize) as matmuls.
# Used for UpsamplingBilinear2d(x4 / x0.5) and the 3D U-Net's trilinear
# upsampling — static shapes, so the interpolation matrices are constants and
# the resize runs on the MXU instead of as a gather.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int):
    """(out_size, in_size) align_corners=True linear interpolation matrix.

    Returns numpy (NOT jnp): caching a device array created inside a trace
    would leak tracers across jit boundaries.
    """
    import numpy as np
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        x = i * scale
        x0 = int(np.floor(x))
        x1 = min(x0 + 1, in_size - 1)
        w = x - x0
        m[i, x0] += 1.0 - w
        m[i, x1] += w
    return m


# ---------------------------------------------------------------------------
# Fused-neighborhood sampling: ONE row-gather per query instead of 8.
#
# Measured on TPU v5e: XLA's row-gather costs ~13.5ns/row for narrow rows and
# goes byte-bound (~45GB/s effective) for wide ones. A trilinear sample
# therefore runs fastest when each table row holds EXACTLY the 2x2x2 corner
# footprint of one query (8*C values): one gather per point with zero
# over-read, then a VPU weighted reduction (no gather).
# ---------------------------------------------------------------------------

def build_neighborhood_table(vol: jnp.ndarray) -> jnp.ndarray:
    """(D, H, W, C) -> ((D+1)*(H+1)*(W+1), 2, 2, 2, C) corner-block table.

    Row (bz, by, bx) holds the 2x2x2 block of the zero-padded volume rooted
    at original coords (bz-1, by-1, bx-1) — every possible trilinear
    footprint, including ones straddling the border (zeros padding). Row
    layout is [c000|c001|...|c111] in (dz, dy, dx)-major corner order.

    Construction is delegated to ops.pallas_tables.corner_table (selectable
    8-way-concat / pairwise / one-hot-conv / Pallas streaming variants, all
    byte-identical; the 8-way default measures ~4.9 ms at flagship shapes,
    ~100 GB/s out — see ops/pallas_tables.py for the r4 variant shootout).
    """
    from ..ops.pallas_tables import corner_table
    D, H, W, C = vol.shape
    t = corner_table(vol)
    return t.reshape((D + 1) * (H + 1) * (W + 1), 2, 2, 2, C)


def _axis_window_weights(coord, size, align_corners, border):
    """Per-point (base_index_in_table, (a0, a1)) for one in-plane axis."""
    x = _unnormalize(coord, size, align_corners)
    if border:
        x = jnp.clip(x, 0.0, float(size - 1))
    x0f = jnp.floor(x)
    w1 = x - x0f
    w0 = 1.0 - w1
    x0 = x0f.astype(jnp.int32)
    b = jnp.clip(x0 + 1, 0, size)          # table base (orig rows b-1, b)
    def a(d):
        r = b - 1 + d                       # orig row of table offset d
        c0 = (r == x0) & (x0 >= 0) & (x0 <= size - 1)
        c1 = (r == x0 + 1) & (x0 + 1 >= 0) & (x0 + 1 <= size - 1)
        return jnp.where(c0, w0, 0.0) + jnp.where(c1, w1, 0.0)
    return b, jnp.stack([a(0), a(1)], axis=-1)


def corner_rows_weights(c: jnp.ndarray, vol_shape: Tuple[int, int, int],
                        align_corners: bool, border: bool
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query corner-table row + trilinear weights.

    The shared contract between build_neighborhood_table and every fused
    sampler (grid_sample_3d_fused, rendering.sample_and_composite_rays*):
    c (P, 3) normalized coords -> (rows (P,) int32 into the
    (D+1)(H+1)(W+1)-row table, w8 (P, 8) corner weights in (z, y, x)
    minor-to-major corner order, matching the table's row layout)."""
    D, H, W = vol_shape
    bx, ax = _axis_window_weights(c[:, 0], W, align_corners, border)
    by, ay = _axis_window_weights(c[:, 1], H, align_corners, border)
    bz, az = _axis_window_weights(c[:, 2], D, align_corners, border)
    rows = (bz * (H + 1) + by) * (W + 1) + bx
    w8 = (az[:, :, None, None] * ay[:, None, :, None]
          * ax[:, None, None, :]).reshape(-1, 8)
    return rows, w8


def grid_sample_3d_fused(vol: jnp.ndarray, coords: jnp.ndarray,
                         align_corners: bool = True,
                         padding_mode: str = 'zeros',
                         chunk: int = 65536,
                         table: Optional[jnp.ndarray] = None,
                         out_dtype=jnp.float32) -> jnp.ndarray:
    """grid_sample_3d with one row-gather per query point.

    Semantically identical to grid_sample_3d (torch semantics); `table` can be
    passed to amortize build_neighborhood_table across multiple sample calls
    on the same volume.
    """
    D, H, W, C = vol.shape
    border = padding_mode == 'border'
    lead = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    P = c.shape[0]
    if table is None:
        table = build_neighborhood_table(vol)
    flat = table.reshape(table.shape[0], -1)
    # the table may carry zero-padded channels (BackboneConfig.
    # table_pad_channels: rows padded to full 128-lane tiles, measured
    # faster to gather); the pad contributes exactly 0 to the weighted sum
    # and is sliced off below.
    Ct = flat.shape[1] // 8

    rows, w8 = corner_rows_weights(c, (D, H, W), align_corners, border)

    # don't pad small query sets (e.g. the 36,864 point queries) all the way
    # to a 65,536-row chunk — cap the chunk at P rounded up to a lane tile
    chunk = min(chunk, -(-P // 128) * 128)
    pad = (-P) % chunk
    rows_p = jnp.pad(rows, (0, pad))
    w8_p = jnp.pad(w8, ((0, pad), (0, 0)))
    n_chunks = (P + pad) // chunk

    def one_chunk(args):
        r, w = args
        t = jnp.take(flat, r, axis=0).reshape(chunk, 8, Ct)
        return jnp.sum(t.astype(jnp.float32) * w[:, :, None], axis=1)

    outs = jax.lax.map(one_chunk,
                       (rows_p.reshape(n_chunks, chunk),
                        w8_p.reshape(n_chunks, chunk, 8)))
    out = outs.reshape(-1, Ct)[:P, :C]
    return out.reshape(*lead, C).astype(out_dtype)


def batched_grid_sample_3d_fused(vol, coords, align_corners=True,
                                 padding_mode='zeros', chunk=65536,
                                 out_dtype=jnp.float32, tables=None):
    """vmap of grid_sample_3d_fused; pass `tables` (B-leading stack of
    build_neighborhood_table outputs) to amortize the table build across
    several sample sites on the same volume (measured: the per-site fp32
    table build costs ~90ms/frame at flagship shapes — far more than the
    gather it feeds)."""
    fn = functools.partial(grid_sample_3d_fused, align_corners=align_corners,
                           padding_mode=padding_mode, chunk=chunk,
                           out_dtype=out_dtype)
    if tables is None:
        return map_unbatched(fn, vol, coords)
    return map_unbatched(lambda v, c, t: fn(v, c, table=t), vol, coords,
                         tables)


def sample_outer_product_fused(depth_vol: jnp.ndarray, feat: jnp.ndarray,
                               coords: jnp.ndarray,
                               align_corners: bool = False,
                               chunk: int = 65536,
                               out_dtype=jnp.float32) -> jnp.ndarray:
    """sample_outer_product with one row-gather per query.

    Table rows are keyed by the (d0, y0, x0) corner base and hold exactly the
    query footprint: the 2x2x2 depth block (8 scalars) plus the 2x2 feature
    block (4*C) — the feature block is replicated across the depth axis, which
    is cheap (the per-camera image plane is small) and buys zero over-read.
    """
    D, H, W = depth_vol.shape
    C = feat.shape[-1]
    lead = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    P = c.shape[0]
    # fused [depth 2x2x2 | feat 2x2] row table; construction delegated to
    # ops.pallas_tables.lift_table (selectable variants, byte-identical)
    from ..ops.pallas_tables import lift_table
    flat = lift_table(depth_vol, feat)
    flat = flat.reshape((D + 1) * (H + 1) * (W + 1), 8 + 4 * C)

    # shared row/weight contract with build_neighborhood_table (the lift
    # table uses the same (D+1)(H+1)(W+1) corner-base keying)
    rows, w8 = corner_rows_weights(c, (D, H, W), align_corners, border=False)

    pad = (-P) % chunk
    rows_p = jnp.pad(rows, (0, pad))
    w8_p = jnp.pad(w8, ((0, pad), (0, 0)))
    n_chunks = (P + pad) // chunk

    def one_chunk(args):
        r, w8c = args
        t = jnp.take(flat, r, axis=0).astype(jnp.float32)
        dparts = t[:, :8].reshape(chunk, 2, 4)        # (p, 2z, 4yx)
        fparts = t[:, 8:].reshape(chunk, 4, C)        # (p, 4yx, C)
        # per-(y,x)-corner depth interpolated along z, times bilinear weight:
        # w[p, k] = sum_z w8[p, z, k] * depth[p, z, k]  (w8 already includes
        # the bilinear factors), then out = sum_k w[p, k] * feat[p, k]
        wzk = jnp.sum(w8c.reshape(chunk, 2, 4) * dparts, axis=1)  # (p, 4)
        return jnp.sum(fparts * wzk[:, :, None], axis=1)

    outs = jax.lax.map(one_chunk,
                       (rows_p.reshape(n_chunks, chunk),
                        w8_p.reshape(n_chunks, chunk, 8)))
    out = outs.reshape(-1, C)[:P]
    return out.reshape(*lead, C).astype(out_dtype)


def build_lift_pixel_table(depth_vol: jnp.ndarray,
                           feat: jnp.ndarray) -> jnp.ndarray:
    """((H+1)*(W+1), 4, D+C) lift table keyed by the 2D pixel corner base.

    Row (by, bx) holds, for the 2x2 pixel block rooted at (by-1, bx-1) of
    the zero-padded image plane, each pixel's FULL depth profile (D values)
    concatenated with its feature vector (C values). Pixel order within the
    row is (dy, dx)-major, matching _axis_window_weights' (a0, a1) order.

    Why (round 5): the fused (d0, y0, x0)-keyed lift table has ~1M rows
    (144 MB at flagship shapes) and HBM-resident tables gather at only
    20-105 M rows/s on v5e, while tables that fit VMEM (~<10 MB) gather at
    380-780 M rows/s (scripts/attrib job10, ROUND5.md). Keying by pixel
    alone gives 11,505 rows x 816 B = 9.4 MB — VMEM-resident — and the
    depth interpolation moves post-gather (a one-hot contraction over the
    gathered profiles, sample_outer_product_pixtab).
    """
    D, H, W = depth_vol.shape
    dp = jnp.moveaxis(depth_vol, 0, -1)            # (H, W, D)
    x = jnp.concatenate([dp, feat], axis=-1)       # (H, W, D+C)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    blk = jnp.stack([xp[i:i + H + 1, j:j + W + 1]
                     for i in (0, 1) for j in (0, 1)], axis=2)
    return blk.reshape((H + 1) * (W + 1), 4, x.shape[-1])


def sample_outer_product_pixtab(depth_vol: jnp.ndarray, feat: jnp.ndarray,
                                coords: jnp.ndarray,
                                align_corners: bool = False,
                                chunk: int = 8192,
                                out_dtype=jnp.float32) -> jnp.ndarray:
    """sample_outer_product via the VMEM-sized pixel-keyed table.

    Semantics identical to sample_outer_product / sample_outer_product_fused
    (torch grid_sample of the implicit depth (x) feat volume, zeros padding):
    one row-gather per query from the (H+1)(W+1)-row table, then the z
    interpolation as a two-nonzero one-hot contraction over each gathered
    pixel's depth profile. fp32 weights/accumulation, like every sampler
    here.
    """
    D, H, W = depth_vol.shape
    C = feat.shape[-1]
    lead = coords.shape[:-1]
    c = coords.reshape(-1, 3)
    P = c.shape[0]
    tab = build_lift_pixel_table(depth_vol, feat)
    flat = tab.reshape(tab.shape[0], -1)

    bx, ax = _axis_window_weights(c[:, 0], W, align_corners, False)
    by, ay = _axis_window_weights(c[:, 1], H, align_corners, False)
    rows = by * (W + 1) + bx
    w4 = (ay[:, :, None] * ax[:, None, :]).reshape(-1, 4)
    zi, zw, zm = _prep_axis(c[:, 2], D, align_corners, False)
    z0 = zi[0]
    z1 = zi[1]
    w0 = jnp.where(zm[0], zw[0], 0.0)
    w1 = jnp.where(zm[1], zw[1], 0.0)

    chunk = min(chunk, -(-P // 128) * 128)
    pad = (-P) % chunk
    padded = [jnp.pad(v, ((0, pad),) + ((0, 0),) * (v.ndim - 1))
              for v in (rows, w4, z0, z1, w0, w1)]
    n_chunks = (P + pad) // chunk

    def one_chunk(args):
        r, w4c, z0c, z1c, w0c, w1c = args
        t = jnp.take(flat, r, axis=0).reshape(chunk, 4, D + C)
        dparts = t[..., :D].astype(jnp.float32)       # (p, 4, D)
        fparts = t[..., D:].astype(jnp.float32)       # (p, 4, C)
        iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, D), 1)
        oh = (w0c[:, None] * (iota == z0c[:, None])
              + w1c[:, None] * (iota == z1c[:, None]))  # (p, D)
        dsel = jnp.sum(dparts * oh[:, None, :], axis=-1)  # (p, 4)
        return jnp.sum(fparts * (w4c * dsel)[:, :, None], axis=1)

    outs = jax.lax.map(one_chunk,
                       tuple(v.reshape((n_chunks, chunk) + v.shape[1:])
                             for v in padded))
    out = outs.reshape(-1, C)[:P]
    return out.reshape(*lead, C).astype(out_dtype)


def sample_outer_product_fused_multi(depth_vols: jnp.ndarray,
                                     feats: jnp.ndarray,
                                     coords: jnp.ndarray,
                                     align_corners: bool = False,
                                     chunk: int = 65536,
                                     out_dtype=jnp.float32) -> jnp.ndarray:
    """sample_outer_product_fused over N cameras with ONE gather.

    Per-camera tables are stacked into one (N*R, 8+4C) flat table and the
    per-camera row ids are offset by camera, so the whole lift issues a
    single chunked take over N*P rows instead of N sequential per-camera
    gathers (fewer op boundaries; the take engine sees one long stream).

    Args:
      depth_vols: (N, D, H, W) per-camera depth distributions.
      feats: (N, H, W, C).
      coords: (N, P, 3) normalized (x, y, z[depth]) query coords per camera.
    Returns:
      (N, P, C) sampled depth-weighted features.
    """
    from ..ops.pallas_tables import lift_table
    N, D, H, W = depth_vols.shape
    C = feats.shape[-1]
    P = coords.shape[1]
    R = (D + 1) * (H + 1) * (W + 1)
    flat = jax.vmap(lift_table)(depth_vols, feats)      # (N, R, 8+4C)
    flat = flat.reshape(N * R, 8 + 4 * C)

    rw = jax.vmap(lambda c: corner_rows_weights(
        c, (D, H, W), align_corners, border=False))(coords)
    rows = rw[0] + (jnp.arange(N, dtype=jnp.int32) * R)[:, None]  # (N, P)
    w8 = rw[1]                                                    # (N, P, 8)

    total = N * P
    rows_f = rows.reshape(total)
    w8_f = w8.reshape(total, 8)
    pad = (-total) % chunk
    rows_p = jnp.pad(rows_f, (0, pad))
    w8_p = jnp.pad(w8_f, ((0, pad), (0, 0)))
    n_chunks = (total + pad) // chunk

    def one_chunk(args):
        r, w8c = args
        t = jnp.take(flat, r, axis=0).astype(jnp.float32)
        dparts = t[:, :8].reshape(chunk, 2, 4)
        fparts = t[:, 8:].reshape(chunk, 4, C)
        wzk = jnp.sum(w8c.reshape(chunk, 2, 4) * dparts, axis=1)
        return jnp.sum(fparts * wzk[:, :, None], axis=1)

    outs = jax.lax.map(one_chunk,
                       (rows_p.reshape(n_chunks, chunk),
                        w8_p.reshape(n_chunks, chunk, 8)))
    return outs.reshape(-1, C)[:total].reshape(N, P, C).astype(out_dtype)


def sorted_segment_rows(rows: jnp.ndarray, payload: jnp.ndarray,
                        num_rows: int, num_chunks: int = 1) -> jnp.ndarray:
    """Scatter-free sum of `payload` (P, C) into (num_rows, C) by row id.

    XLA's scatter-add runs at ~8.4M rows/s on TPU v5e while take runs at
    ~46M rows/s (scripts/perf_backward.py) — so the transpose of a big
    gather is built from sorts + takes + two UNIQUE-index writes instead:

      sort by destination row; cumsum the sorted payload; per present row,
      segment_sum = csum[end_of_row] - csum[before_start_of_row]; write both
      with `.at[].set(unique_indices=True)` (no read-modify-write), dumping
      non-boundary lanes out of bounds.

    fp32 cumsum over P signed values drifts by ~eps * |running sum| ~
    eps * sqrt(P) * sigma; at P ~ 5.8M that is ~0.03% of a typical segment
    sum — acceptable for gradients (exactness is pinned loosely in
    tests/test_sampling.py).

    num_chunks > 1 processes the sorted payload in position-chunks carrying
    the running csum row, so only (P/num_chunks, C) f32 intermediates are
    live (the one-shot cumsum would materialize two (P, C) fp32 buffers).
    """
    P, C = payload.shape
    if num_chunks > 1 and P % num_chunks:
        # pad to a chunk multiple with zero payload on row 0 (contributes
        # nothing) instead of silently taking the full-materialization path
        pad = num_chunks - P % num_chunks
        rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
        payload = jnp.concatenate(
            [payload, jnp.zeros((pad, C), payload.dtype)])
        P += pad
    order = jnp.argsort(rows)
    r_s = jnp.take(rows, order)
    is_end = jnp.concatenate([r_s[1:] != r_s[:-1], jnp.ones((1,), bool)])
    is_start = jnp.concatenate([jnp.ones((1,), bool), r_s[1:] != r_s[:-1]])
    dump = num_rows + 1  # out of bounds -> dropped; survivors are unique
    end_idx = jnp.where(is_end, r_s, dump).astype(jnp.int32)
    start_idx = jnp.where(is_start, r_s, dump).astype(jnp.int32)
    A = jnp.zeros((num_rows + 1, C), jnp.float32)
    Bm = jnp.zeros((num_rows + 1, C), jnp.float32)
    if num_chunks <= 1:
        p_s = jnp.take(payload, order, axis=0).astype(jnp.float32)
        csum = jnp.cumsum(p_s, axis=0)
        A = A.at[end_idx].set(csum, mode='drop', unique_indices=True)
        # before-start of the row starting at sorted position i+1 is
        # csum[i]; the first segment's before-sum stays 0 (zero-init row)
        Bm = Bm.at[start_idx[1:]].set(csum[:-1], mode='drop',
                                      unique_indices=True)
    else:
        cp = P // num_chunks

        def step(carry, args):
            run, a, b = carry
            o_c, e_c, s_c, s0 = args
            p_c = jnp.take(payload, o_c, axis=0).astype(jnp.float32)
            csum = jnp.cumsum(p_c, axis=0) + run[None, :]
            a = a.at[e_c].set(csum, mode='drop', unique_indices=True)
            # local positions 1..cp-1 start segments -> pair with local
            # csum[0..cp-2]
            b = b.at[s_c].set(csum[:-1], mode='drop', unique_indices=True)
            # a segment starting at local position 0 pairs with the carry
            b = b.at[s0].set(run, mode='drop', unique_indices=True)
            return (csum[-1], a, b), None

        o_ch = order.reshape(num_chunks, cp)
        e_ch = end_idx.reshape(num_chunks, cp)
        s_ch = start_idx.reshape(num_chunks, cp)
        (run, A, Bm), _ = jax.lax.scan(
            step, (jnp.zeros((C,), jnp.float32), A, Bm),
            (o_ch, e_ch, s_ch[:, 1:], s_ch[:, 0]))
    return (A - Bm)[:num_rows]


def make_sample_matrix(coords_norm, size: int, align_corners: bool,
                       padding_mode: str = 'zeros'):
    """(out, size) numpy matrix encoding 1D linear grid_sample at static
    normalized coords — each row holds the two corner weights (border: clamp
    coordinate; zeros: out-of-bounds corners dropped).

    Sampling a static regular grid (occ / det grids) through three such
    matrices turns the big trilinear gathers into separable MXU matmuls with
    exactly torch grid_sample semantics.
    """
    import numpy as np
    coords_norm = np.asarray(coords_norm, np.float64)
    if align_corners:
        x = (coords_norm + 1.0) / 2.0 * (size - 1)
    else:
        x = ((coords_norm + 1.0) * size - 1.0) / 2.0
    if padding_mode == 'border':
        x = np.clip(x, 0.0, float(size - 1))
    m = np.zeros((coords_norm.shape[0], size), np.float32)
    x0 = np.floor(x)
    w1 = x - x0
    for d, w in ((0, 1.0 - w1), (1, w1)):
        idx = x0.astype(np.int64) + d
        inb = (idx >= 0) & (idx <= size - 1)
        np.add.at(m, (np.arange(m.shape[0])[inb], idx[inb]), w[inb])
    return m


def apply_sample_matrices(vol: jnp.ndarray, mats, axes: Tuple[int, ...],
                          out_dtype=jnp.float32) -> jnp.ndarray:
    """Contract (numpy or jnp) interpolation matrices along the given axes."""
    x = vol.astype(jnp.float32)
    for m, ax in zip(mats, axes):
        m = jnp.asarray(m)
        x = jnp.moveaxis(x, ax, -1)
        x = jnp.einsum('...i,oi->...o', x, m,
                       preferred_element_type=jnp.float32)
        x = jnp.moveaxis(x, -1, ax)
    return x.astype(out_dtype)


def resize_linear(x: jnp.ndarray, out_sizes: Tuple[int, ...],
                  axes: Tuple[int, ...]) -> jnp.ndarray:
    """align_corners=True multi-axis linear resize via interpolation matmuls.

    Matches torch's `F.interpolate(..., mode='bilinear'/'trilinear',
    align_corners=True)` and `nn.UpsamplingBilinear2d` exactly.
    """
    dt = x.dtype
    for ax, out_size in zip(axes, out_sizes):
        in_size = x.shape[ax]
        if in_size == out_size:
            continue
        m = jnp.asarray(_interp_matrix(in_size, out_size))
        x = jnp.moveaxis(x, ax, -1)
        x = jnp.einsum('...i,oi->...o', x.astype(jnp.float32), m,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        x = jnp.moveaxis(x, -1, ax)
    return x.astype(dt)
