"""Builders for the trilinear corner-block gather tables (4 variants).

The fused samplers (`core/sampling.py`) gather ONE table row per query, where
row (bz, by, bx) holds the full 2x2x2 corner footprint of the zero-padded
volume.

Measured build costs at flagship shapes, TPU v5e, in-jit K-rep timing that
divides away the ~25-30 ms axon fetch constant (scripts/perf_r4_tables.py,
round 4 — SUPERSEDES the r3 single-dispatch figures of ~25 ms ray +
~33 ms lift, which were fetch noise):

  corner (20,256,256,22)->488 MB : 8-way 4.9 ms | pairwise 4.6 |
                                   one-hot MXU conv 8.5 | pallas stream 10.8
  lift (86,64,176)x16 ->144 MB   : 8-way ~0.3 ms | pairwise 0.3 |
                                   conv 1.9 | pallas MosaicError

The XLA 8-way concat is therefore already near-optimal (~100 GB/s out) and
stays the default; the Pallas streaming kernels and the one-hot-conv trick
are retained as measured negative results (VERDICT r3 #6: "un-gate or
retire" — retired by data; they also twice correlated with a wedged device,
see _use_pallas). All variants are byte-identical (tests/test_tables.py).

Backwards: the table build is linear; the VJP (sum of 8 shifted slices of
the cotangent) runs as plain XLA, which handles slice-sum reads at full
bandwidth — only the scattered WRITE pattern of the forward was slow.

Reference semantics: `torch.nn.functional.grid_sample` corner footprints
(base_vampire2.py:419,507,590) — see core/sampling.py for the sampler side.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _use_pallas() -> bool:
    """Opt-in: the streaming kernels compile on this toolchain, but chip
    runs have twice correlated with a wedged device (axon tunnel, ~45 min
    recovery) — gated OFF until the runtime stabilizes. Enable with
    VAMPIRE_PALLAS_TABLES=1 on a stock TPU runtime."""
    import os
    if os.environ.get('VAMPIRE_PALLAS_TABLES') != '1':
        return False
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False


def _pad_rows(n_out: int, tile: int) -> int:
    """Number of source rows needed so every DMA window is in-bounds."""
    n_tiles = -(-n_out // tile)
    return n_tiles * tile + 1


# ---------------------------------------------------------------------------
# Corner table of a (D, H, W, C) volume -> (D+1, H+1, W+1, 8*C)
# Row (bz, by, bx), channel k*C+c (k in (dz, dy, dx) major order) =
#   padded_vol[bz+dz, by+dy, bx+dx, c].
# ---------------------------------------------------------------------------

def _corner_table_xla(vol: jnp.ndarray) -> jnp.ndarray:
    D, H, W, C = vol.shape
    p = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    parts = [p[k:k + D + 1, i:i + H + 1, j:j + W + 1]
             for k in (0, 1) for i in (0, 1) for j in (0, 1)]
    return jnp.concatenate(parts, axis=-1)


def _corner_table_pallas(vol: jnp.ndarray, ty: int = 16) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, H, W, C = vol.shape
    n_ty = -(-(H + 1) // ty)
    ypad = _pad_rows(H + 1, ty) - (H + 2)
    # Mosaic DMA slices require the tiled dims (last two) to stay aligned:
    # second-minor (x) to 8, minor (C) to a full 128-lane tile. The pads are
    # zeros; extra y rows only feed clipped output blocks, extra x/C lanes
    # are never read by the in-kernel slices.
    xp = (-(W + 2)) % 8
    cp = (-C) % 128
    p = jnp.pad(vol, ((1, 1), (1, 1 + ypad), (1, 1 + xp), (0, cp)))

    def kernel(p_ref, out_ref, scratch, sem):
        bz = pl.program_id(0)
        y0 = pl.program_id(1) * ty
        dma = pltpu.make_async_copy(
            p_ref.at[pl.ds(bz, 2), pl.ds(y0, ty + 1)], scratch, sem)
        dma.start()
        dma.wait()
        k = 0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    out_ref[0, :, :, k * C:(k + 1) * C] = \
                        scratch[dz, dy:dy + ty, dx:dx + W + 1, :C]
                    k += 1

    out = pl.pallas_call(
        kernel,
        grid=(D + 1, n_ty),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, ty, W + 1, 8 * C),
                               lambda bz, t: (bz, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D + 1, H + 1, W + 1, 8 * C),
                                       vol.dtype),
        scratch_shapes=[pltpu.VMEM((2, ty + 1, W + 2 + xp, C + cp),
                                   vol.dtype),
                        pltpu.SemaphoreType.DMA],
    )(p)
    return out


def _one_hot_corner_kernel(C: int, dtype) -> jnp.ndarray:
    """(2, 2, 2, C, 8*C) DHWIO kernel with K[dz,dy,dx,c, corner*C+c] = 1."""
    import numpy as np
    k = np.zeros((2, 2, 2, C, 8 * C), jnp.dtype(dtype).name)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                corner = (dz * 2 + dy) * 2 + dx
                for c in range(C):
                    k[dz, dy, dx, c, corner * C + c] = 1
    return jnp.asarray(k)


def _corner_table_conv(vol: jnp.ndarray) -> jnp.ndarray:
    """Identical table via a one-hot 2x2x2 conv: the 8-way shifted-slice
    concat IS a convolution with a permutation kernel, and XLA's TPU conv
    emitter streams output through the MXU pipeline instead of the slow
    minor-axis concat shuffle. Exact: each output element is one bf16 value
    x 1.0 accumulated in fp32 (preferred_element_type), cast back — a
    bit-exact round trip. ~90 GFLOP of 'wasted' MACs at flagship shape is
    ~0.5 ms of MXU time, far below the concat's measured bandwidth loss."""
    D, H, W, C = vol.shape
    p = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    out = jax.lax.conv_general_dilated(
        p[None], _one_hot_corner_kernel(C, vol.dtype), (1, 1, 1), 'VALID',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)
    return out[0].astype(vol.dtype)


def _one_hot_block2d_kernel(C: int, dtype) -> jnp.ndarray:
    """(2, 2, C, 4*C) HWIO kernel with K[dy,dx,c, blk*C+c] = 1."""
    import numpy as np
    k = np.zeros((2, 2, C, 4 * C), jnp.dtype(dtype).name)
    for dy in (0, 1):
        for dx in (0, 1):
            blk = dy * 2 + dx
            for c in range(C):
                k[dy, dx, c, blk * C + c] = 1
    return jnp.asarray(k)


def _lift_table_conv(depth: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
    """One-hot-conv construction of the lift table (see _corner_table_conv)."""
    D, H, W = depth.shape
    C = feat.shape[-1]
    dt = jnp.result_type(depth, feat)
    dp = jnp.pad(depth.astype(dt)[..., None],
                 ((1, 1), (1, 1), (1, 1), (0, 0)))
    dtab = jax.lax.conv_general_dilated(
        dp[None], _one_hot_corner_kernel(1, dt), (1, 1, 1), 'VALID',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'),
        preferred_element_type=jnp.float32)[0].astype(dt)
    fp = jnp.pad(feat.astype(dt), ((1, 1), (1, 1), (0, 0)))
    fblk = jax.lax.conv_general_dilated(
        fp[None], _one_hot_block2d_kernel(C, dt), (1, 1), 'VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)[0].astype(dt)
    ftab = jnp.broadcast_to(fblk[None], (D + 1,) + fblk.shape)
    return jnp.concatenate([dtab, ftab], axis=-1)


def _corner_table_xla_pairwise(vol: jnp.ndarray) -> jnp.ndarray:
    """Identical table via three 2-operand interleaves (x, then y, then z
    pairs) instead of one 8-way strided concat. Writes 1.75x the final
    bytes, but each step is a simple two-stream interleave XLA lowers far
    better than the 8-way minor-axis shuffle (measured on TPU v5e:
    scripts/perf_r3_tables_xla.py). Channel order matches exactly: z pairs
    outermost, then y, then x — the (dz, dy, dx)-major corner order."""
    D, H, W, C = vol.shape
    p = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    x2 = jnp.concatenate([p[:, :, :W + 1], p[:, :, 1:W + 2]], axis=-1)
    y2 = jnp.concatenate([x2[:, :H + 1], x2[:, 1:H + 2]], axis=-1)
    return jnp.concatenate([y2[:D + 1], y2[1:D + 2]], axis=-1)


def _lift_table_xla_pairwise(depth: jnp.ndarray,
                             feat: jnp.ndarray) -> jnp.ndarray:
    """Pairwise-interleave construction of the lift table (see
    _corner_table_xla_pairwise)."""
    D, H, W = depth.shape
    C = feat.shape[-1]
    dt = jnp.result_type(depth, feat)
    dp = jnp.pad(depth.astype(dt)[..., None],
                 ((1, 1), (1, 1), (1, 1), (0, 0)))
    dx2 = jnp.concatenate([dp[:, :, :W + 1], dp[:, :, 1:W + 2]], axis=-1)
    dy2 = jnp.concatenate([dx2[:, :H + 1], dx2[:, 1:H + 2]], axis=-1)
    dtab = jnp.concatenate([dy2[:D + 1], dy2[1:D + 2]], axis=-1)
    fp = jnp.pad(feat.astype(dt), ((1, 1), (1, 1), (0, 0)))
    fx2 = jnp.concatenate([fp[:, :W + 1], fp[:, 1:W + 2]], axis=-1)
    fblk = jnp.concatenate([fx2[:H + 1], fx2[1:H + 2]], axis=-1)
    ftab = jnp.broadcast_to(fblk[None], (D + 1,) + fblk.shape)
    return jnp.concatenate([dtab, ftab], axis=-1)


def _corner_table_bwd_impl(shape_dtype, g):
    """VJP of the corner-table build: sum the 8 shifted cotangent slices."""
    D, H, W, C = shape_dtype.shape
    gg = g.reshape(D + 1, H + 1, W + 1, 8, C)
    out = jnp.zeros((D, H, W, C), jnp.float32)
    k = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                out = out + gg[1 - dz:D + 1 - dz, 1 - dy:H + 1 - dy,
                               1 - dx:W + 1 - dx, k].astype(jnp.float32)
                k += 1
    return out.astype(shape_dtype.dtype)


def _xla_variant() -> str:
    import os
    return os.environ.get('VAMPIRE_TABLE_BUILD', '8way')


@jax.custom_vjp
def corner_table(vol: jnp.ndarray) -> jnp.ndarray:
    """(D, H, W, C) -> (D+1, H+1, W+1, 8*C) corner-block table.

    Construction variant by env: Pallas streaming build (opt-in, see
    _use_pallas), else VAMPIRE_TABLE_BUILD = '8way' (default) | 'pairwise'.
    All variants are byte-identical (tests/test_tables.py). The full-model
    A/B at the shipped flagship config has the 8-way concat ahead: 6.41 vs
    6.18 fps pipelined / 179.9 vs 185.7 ms single-frame (bench.py, ET off,
    lift topk 288); an earlier isolated sweep favored pairwise, but the
    in-graph fusion context decides, so the default follows the full-model
    measurement."""
    if _use_pallas():
        return _corner_table_pallas(vol)
    if _xla_variant() == 'pairwise':
        return _corner_table_xla_pairwise(vol)
    if _xla_variant() == 'conv':
        return _corner_table_conv(vol)
    return _corner_table_xla(vol)


def _corner_table_fwd(vol):
    return corner_table(vol), jax.ShapeDtypeStruct(vol.shape, vol.dtype)


def _corner_table_bwd(res, g):
    return (_corner_table_bwd_impl(res, g),)


corner_table.defvjp(_corner_table_fwd, _corner_table_bwd)


# ---------------------------------------------------------------------------
# Fused lift table: depth (D, h, w) + feat (h, w, C) ->
#   (D+1, h+1, w+1, 8 + 4*C)
# channels [0:8]   = depth corner block, (dz, dy, dx) major;
# channels [8:8+4C] = feat 2x2 block, (dy, dx) major, independent of bz.
# Matches the flat table of sampling.sample_outer_product_fused exactly.
# ---------------------------------------------------------------------------

def _lift_table_xla(depth: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
    D, H, W = depth.shape
    C = feat.shape[-1]
    dt = jnp.result_type(depth, feat)
    dp = jnp.pad(depth.astype(dt)[..., None], ((1, 1), (1, 1), (1, 1), (0, 0)))
    dtab = jnp.concatenate([dp[k:k + D + 1, i:i + H + 1, j:j + W + 1]
                            for k in (0, 1) for i in (0, 1) for j in (0, 1)],
                           axis=-1)                   # (D+1, H+1, W+1, 8)
    fp = jnp.pad(feat.astype(dt), ((1, 1), (1, 1), (0, 0)))
    fblk = jnp.concatenate([fp[i:i + H + 1, j:j + W + 1]
                            for i in (0, 1) for j in (0, 1)], axis=-1)
    ftab = jnp.broadcast_to(fblk[None], (D + 1,) + fblk.shape)
    return jnp.concatenate([dtab, ftab], axis=-1)


def _lift_table_pallas(depth: jnp.ndarray, feat: jnp.ndarray,
                       ty: int = 16) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D, H, W = depth.shape
    C = feat.shape[-1]
    dt = jnp.result_type(depth, feat)
    assert ty % 8 == 0, ty
    n_ty = -(-(H + 1) // ty)
    # pd is 3D, so its y axis is the sublane dim: DMA windows must be
    # 8-aligned -> fetch ty+8 rows (y0 = t*ty stays 8-aligned); its x axis
    # is the lane dim -> pad to a 128 multiple. pf keeps x on sublanes
    # (8-aligned) and C on lanes (128-aligned).
    ypad_d = n_ty * ty + 8 - (H + 2)
    ypad_f = _pad_rows(H + 1, ty) - (H + 2)
    xp_d = (-(W + 2)) % 128
    xp_f = (-(W + 2)) % 8
    cp = (-C) % 128
    # pd stays f32 in the kernel: Mosaic only supports the (ty, W+1) ->
    # (ty, W+1, 1) minor-dim insertion for 32-bit types; cast at the write
    pd = jnp.pad(depth.astype(jnp.float32),
                 ((1, 1), (1, 1 + ypad_d), (1, 1 + xp_d)))
    pf = jnp.pad(feat.astype(dt), ((1, 1 + ypad_f), (1, 1 + xp_f), (0, cp)))

    def kernel(pd_ref, pf_ref, out_ref, sd, sf, sem):
        bz = pl.program_id(0)
        y0 = pl.program_id(1) * ty
        dma_d = pltpu.make_async_copy(
            pd_ref.at[pl.ds(bz, 2), pl.ds(y0, ty + 8)], sd, sem.at[0])
        dma_f = pltpu.make_async_copy(
            pf_ref.at[pl.ds(y0, ty + 1)], sf, sem.at[1])
        dma_d.start()
        dma_f.start()
        dma_d.wait()
        dma_f.wait()
        k = 0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    out_ref[0, :, :, k:k + 1] = \
                        sd[dz, dy:dy + ty, dx:dx + W + 1][..., None] \
                        .astype(out_ref.dtype)
                    k += 1
        k2 = 0
        for dy in (0, 1):
            for dx in (0, 1):
                out_ref[0, :, :, 8 + k2 * C:8 + (k2 + 1) * C] = \
                    sf[dy:dy + ty, dx:dx + W + 1, :C]
                k2 += 1

    out = pl.pallas_call(
        kernel,
        grid=(D + 1, n_ty),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, ty, W + 1, 8 + 4 * C),
                               lambda bz, t: (bz, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D + 1, H + 1, W + 1, 8 + 4 * C), dt),
        scratch_shapes=[pltpu.VMEM((2, ty + 8, W + 2 + xp_d), jnp.float32),
                        pltpu.VMEM((ty + 1, W + 2 + xp_f, C + cp), dt),
                        pltpu.SemaphoreType.DMA((2,))],
    )(pd, pf)
    return out


@jax.custom_vjp
def lift_table(depth: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
    """Fused depth-corner + feature-block lift table (see module docstring)."""
    if _use_pallas():
        return _lift_table_pallas(depth, feat)
    if _xla_variant() == 'pairwise':
        return _lift_table_xla_pairwise(depth, feat)
    if _xla_variant() == 'conv':
        return _lift_table_conv(depth, feat)
    return _lift_table_xla(depth, feat)


def _lift_table_fwd(depth, feat):
    return lift_table(depth, feat), (
        jax.ShapeDtypeStruct(depth.shape, depth.dtype),
        jax.ShapeDtypeStruct(feat.shape, feat.dtype))


def _lift_table_bwd(res, g):
    dsd, fsd = res
    D, H, W = dsd.shape
    C = fsd.shape[-1]
    gd = g[..., :8]
    gf = g[..., 8:].reshape(D + 1, H + 1, W + 1, 4, C)
    ddepth = jnp.zeros((D, H, W), jnp.float32)
    k = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                ddepth = ddepth + gd[1 - dz:D + 1 - dz, 1 - dy:H + 1 - dy,
                                     1 - dx:W + 1 - dx, k].astype(jnp.float32)
                k += 1
    # the feat block was broadcast over the D+1 planes: sum that axis first
    gf = jnp.sum(gf.astype(jnp.float32), axis=0)      # (H+1, W+1, 4, C)
    dfeat = jnp.zeros((H, W, C), jnp.float32)
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            dfeat = dfeat + gf[1 - dy:H + 1 - dy, 1 - dx:W + 1 - dx, k]
            k += 1
    return ddepth.astype(dsd.dtype), dfeat.astype(fsd.dtype)


lift_table.defvjp(_lift_table_fwd, _lift_table_bwd)
