"""The image->field backbone: depth-lifting, 3D field, queries, rendering.

TPU-first re-design of `BaseVAMPIRE2` / `BaseLSS` / `BaseLSSImpaintor` /
`BaseBiLinear` (`src/layers/backbones/*.py`, 688-798 LoC each; the four differ
only in `base_conv`, the occ-query bda rotation, and the lifting source):

  * channels-last layouts (NHWC / NDHWC) throughout;
  * the frustum outer product `depth_softmax ⊗ features` is never
    materialized — `sample_outer_product` fuses it into the lifting gather
    (the reference builds a (B,6,16,86,h,w) tensor, base_vampire2.py:553);
  * the per-camera lift accumulates numerator/denominator camera by camera,
    so only one (B,Z,Y,X,C) volume is live instead of six;
  * geometry, density and alpha compositing are fp32 islands; conv stacks run
    in `dtype` (bf16 by default);
  * ragged point clouds arrive padded to a static size with a mask
    (replaces the per-sample Python loop at base_vampire2.py:579).

Output dict keys follow the reference 12-tuple (base_vampire2.py:637-649).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import BackboneConfig
from ..core import geometry as G
from ..core import rendering as R
from ..core import sampling as S
from .resnet import ResNet, kaiming_out
from .second_fpn import SECONDFPN
from .unet3d import ConvSoftplus3D, Unet3D


def _conv2d(features, name, use_bias=False, dtype=jnp.float32):
    return nn.Conv(features, (3, 3), padding=[(1, 1)] * 2, use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32,
                   kernel_init=kaiming_out, name=name)


def _conv3d(features, name, use_bias=True, dtype=jnp.float32,
            bias_init=nn.initializers.zeros):
    return nn.Conv(features, (3, 3, 3), padding=[(1, 1)] * 3,
                   use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
                   kernel_init=kaiming_out, bias_init=bias_init, name=name)


class Conv3dZ(nn.Module):
    """3x3x3 conv on (B, Z, Y, X, C), computed as a banded z-channels 2D
    conv (the Unet3D trick, unet3d._banded_kernel): NDHWC conv3d with
    C<=22 uses ~1/6 of the MXU lanes and measured ~3 ms per head conv at
    flagship shapes; the (3, 3, Z*Cin, Z*Cout) banded form runs the same
    math at full lane occupancy (~6x faster, attrib_r5). Param names and
    shapes ('kernel' (3,3,3,Cin,Cout), 'bias' (Cout,)) match nn.Conv —
    a checkpoint-compatible drop-in for _conv3d."""
    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        from .unet3d import _banded_kernel
        B, Z, Y, X, C = x.shape
        k = self.param('kernel', kaiming_out, (3, 3, 3, C, self.features),
                       jnp.float32)
        kb = _banded_kernel(k, Z, Z, 1)
        xz = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, Y, X, Z * C)
        y = jax.lax.conv_general_dilated(
            xz.astype(self.dtype), kb.astype(self.dtype), (1, 1),
            [(1, 1)] * 2, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            b = self.param('bias', self.bias_init, (self.features,),
                           jnp.float32)
            y = y + jnp.tile(b, Z).astype(self.dtype)
        y = y.reshape(B, Y, X, Z, self.features)
        return jnp.transpose(y, (0, 3, 1, 2, 4))


def _pick_outer_sampler(mode: str, train: bool, chunk: int = 0):
    """Resolve BackboneConfig.lift_sampler ('auto' = train-> pixtab,
    eval -> fused; see configs.py for the chip measurements). chunk > 0
    overrides the sampler's gather/reduce chunk (BackboneConfig.lift_chunk).
    """
    if mode == 'pixtab' or (mode == 'auto' and train):
        fn = S.sample_outer_product_pixtab
    elif mode in ('auto', 'fused'):
        fn = S.sample_outer_product_fused
    else:
        raise ValueError(f'unknown lift_sampler {mode!r}')
    if chunk:
        return functools.partial(fn, chunk=chunk)
    return fn


class FieldBackbone(nn.Module):
    """Camera images -> ego 3D feature field -> task outputs.

    lift_vectorized=False loops over cameras accumulating the masked-mean
    numerator/denominator (one live voxel volume — minimal HBM). True keeps
    the camera axis materialized so that, under a mesh with the camera axis
    sharded ('cam'), the sum over cameras becomes an ICI all-reduce (the
    multi-chip layout of SURVEY.md §2.4).
    """
    cfg: BackboneConfig
    dtype: Any = jnp.float32
    lift_vectorized: bool = False
    # dtype of the ray-sampling gather table (weights/accum stay fp32)
    sample_dtype: Any = jnp.bfloat16
    # rematerialize the per-camera lift in backward (saves ~1.5GB activations
    # per batch element at the cost of redoing the lift gathers). Default
    # OFF since round 3: the flagship B=1 train step fits HBM without it
    # and the recompute costs a measured 28 ms/step
    # (scripts/perf_trainstep_ablate.py no_lift_remat); enable for larger
    # per-device batches or memory-tight meshes.
    lift_remat: bool = False

    def setup(self):
        c = self.cfg
        self.frustum = jnp.asarray(
            G.make_frustum(c.final_dim, c.downsample_factor, c.d_bound))
        self.camera_mids = jnp.asarray(G.make_camera_mids(c.d_bound))
        self.bev_mids = jnp.asarray(G.make_bev_mids(c.z_bound_det))
        self.voxel_coords = jnp.asarray(
            G.make_voxel_coords(c.x_bound_seg, c.y_bound_seg, c.z_bound_seg))
        # block-major voxel constant for the compacted lift: (G, Q, 4) with
        # G = (Y/blk)*(X/blk) blocks of Q = Z*blk*blk voxels — geometry
        # computed from this is born block-major (no 94 MB transposes)
        blk = c.lift_block
        Zs_, Ys_, Xs_ = c.grid_zyx('seg')
        if blk and Ys_ % blk == 0 and Xs_ % blk == 0:
            vox = np.asarray(G.make_voxel_coords(
                c.x_bound_seg, c.y_bound_seg, c.z_bound_seg))
            v6 = vox.reshape(Zs_, Ys_ // blk, blk, Xs_ // blk, blk, 4)
            v6 = v6.transpose(1, 3, 0, 2, 4, 5)
            self.voxel_coords_bm = jnp.asarray(
                v6.reshape((Ys_ // blk) * (Xs_ // blk),
                           Zs_ * blk * blk, 4))
        self.norm_voxel_coords = jnp.asarray(
            G.make_norm_voxel_coords(c.x_bound_seg, c.y_bound_seg, c.z_bound_seg))
        self.output_coords = jnp.asarray(
            G.make_voxel_coords(c.x_bound_det, c.y_bound_det, c.z_bound_det))
        self.occ_coords = jnp.asarray(G.make_occ_coords(
            c.occ_pc_range, c.occ_voxel_size, c.occ_grid))

        # Static-grid queries as separable interpolation matrices (MXU
        # matmuls instead of trilinear gathers). The det/output grid is
        # always static; the occ grid is static for every variant except
        # 'vampire2' (which bda-rotates it, base_vampire2.py:598-601).
        Zs, Ys, Xs = c.grid_zyx('seg')
        def norm1d(centers, bound):
            return (centers - bound[0]) / (bound[1] - bound[0]) * 2.0 - 1.0
        det_z = norm1d(G.centers_of(c.z_bound_det), c.z_bound_seg)
        det_y = norm1d(G.centers_of(c.y_bound_det), c.y_bound_seg)
        det_x = norm1d(G.centers_of(c.x_bound_det), c.x_bound_seg)
        self._det_mats = (
            S.make_sample_matrix(det_z, Zs, True, 'zeros'),
            S.make_sample_matrix(det_y, Ys, True, 'zeros'),
            S.make_sample_matrix(det_x, Xs, True, 'zeros'))
        occ_c = G.make_occ_coords(c.occ_pc_range, c.occ_voxel_size, c.occ_grid)
        occ_x = norm1d(occ_c[:, 0, 0, 0], c.x_bound_seg)
        occ_y = norm1d(occ_c[0, :, 0, 1], c.y_bound_seg)
        occ_z = norm1d(occ_c[0, 0, :, 2], c.z_bound_seg)
        self._occ_mats_border = (
            S.make_sample_matrix(occ_z, Zs, True, 'border'),
            S.make_sample_matrix(occ_y, Ys, True, 'border'),
            S.make_sample_matrix(occ_x, Xs, True, 'border'))
        self._occ_mats_zeros = (
            S.make_sample_matrix(occ_z, Zs, True, 'zeros'),
            S.make_sample_matrix(occ_y, Ys, True, 'zeros'),
            S.make_sample_matrix(occ_x, Xs, True, 'zeros'))

        self.img_backbone = ResNet(depth=c.img_backbone_depth,
                                   out_indices=c.img_backbone_out_indices,
                                   frozen_stem=True, dtype=self.dtype,
                                   name='img_backbone')
        self.img_neck = SECONDFPN(in_channels=c.img_neck_in_channels,
                                  out_channels=c.img_neck_out_channels,
                                  upsample_strides=c.img_neck_upsample_strides,
                                  dtype=self.dtype, name='img_neck')
        D = c.depth_channels
        if c.variant != 'bilinear':
            self.mapping_along_depth = _conv2d(D, 'mapping_along_depth',
                                               dtype=self.dtype)
        self.channel_lower = _conv2d(c.mid_channels, 'channel_lower',
                                     dtype=self.dtype)
        if c.variant in ('vampire2', 'lss_inpaintor'):
            self.base_conv = Unet3D(c.mid_channels, dtype=self.dtype,
                                    name='base_conv')
        else:
            self.base_conv = ConvSoftplus3D(c.mid_channels, dtype=self.dtype,
                                            name='base_conv')
        # density bias init: sdf_bias - 10 (base_vampire2.py:235-241).
        # Conv3dZ = banded z-channels execution of the same conv (same
        # params; ~6x faster than NDHWC conv3d at these narrow channels)
        self.density_conv = Conv3dZ(
            1, dtype=self.dtype,
            bias_init=nn.initializers.constant(c.sdf_bias - 10.0),
            name='density_conv')
        self.seg_conv = Conv3dZ(c.num_classes, dtype=self.dtype,
                                name='seg_conv')
        self.rgb_conv = Conv3dZ(3, dtype=self.dtype, name='rgb_conv')
        if c.variant == 'bilinear':
            self.feature_conv = Conv3dZ(c.mid_channels, dtype=self.dtype,
                                        name='feature_conv')
        # learnable Laplace beta (render_utils.py:5-7)
        self.density_beta = self.param('density_beta',
                                       nn.initializers.constant(0.1), ())
        self.voxel_output = nn.Conv(c.output_channels, (1, 1), use_bias=True,
                                    dtype=jnp.float32, param_dtype=jnp.float32,
                                    kernel_init=kaiming_out,
                                    name='voxel_output')

    # ------------------------------------------------------------------
    def _coords_valid(self, pix):
        """Per-camera pixel coords -> (normalized sample coords, validity).

        Shared by the dense and block-compacted lifts (identical math to
        base_vampire2.py:483-506; layout-agnostic over the spatial dims).
        """
        c = self.cfg
        fH, fW = c.final_dim
        x, y, z = pix[..., 0], pix[..., 1], pix[..., 2]
        x_valid = (x > -0.5) & (x < fW - 0.5)
        y_valid = (y > -0.5) & (y < fH - 0.5)
        if c.variant == 'bilinear':
            z_valid = z > 0.0
        else:
            z_valid = (z > c.d_bound[0]) & (z < c.d_bound[1])
        valid = (x_valid & y_valid & z_valid).astype(jnp.float32)
        norm_x = 2.0 * (x / (fW - 1.0)) - 1.0
        norm_y = 2.0 * (y / (fH - 1.0)) - 1.0
        if c.variant == 'bilinear':
            norm_z = jnp.zeros_like(norm_x)
        else:
            norm_z = 2.0 * ((z - c.d_bound[0])
                            / (c.d_bound[1] - c.d_bound[0])) - 1.0
        norm_x = jnp.clip(norm_x, -2.0, 2.0)
        norm_y = jnp.clip(norm_y, -2.0, 2.0)
        norm_z = jnp.clip(norm_z, -2.0, 2.0)
        return jnp.stack([norm_x, norm_y, norm_z], axis=-1), valid

    def _density(self, x):
        if self.cfg.density_mode == 'naive':
            return R.naive_density(x)
        return R.laplace_density(x, self.density_beta, self.cfg.sdf_bias)

    def _get_cam_feats(self, imgs: jnp.ndarray, train: bool):
        """(B*N, H, W, 3) -> (B*N, h, w, Cimg) via ResNet50 + SECONDFPN."""
        feats = self.img_backbone(imgs.astype(self.dtype), train)
        return self.img_neck(feats, train)

    def _lift(self, depth: Optional[jnp.ndarray], feat: jnp.ndarray,
              mats: Dict[str, jnp.ndarray],
              train: bool = False) -> jnp.ndarray:
        """Project voxel centers into each camera, sample, masked-mean.

        depth: (B, N, h, w, D) softmax depth distribution (None for bilinear).
        feat:  (B, N, h, w, C).
        Returns (B, Z, Y, X, C) fp32.
        """
        c = self.cfg
        B, N = feat.shape[:2]
        Z, Y, X = c.grid_zyx('seg')
        BLK = c.lift_block
        K = c.lift_block_topk
        if (K and Y % BLK == 0 and X % BLK == 0
                and not self.lift_vectorized):
            # compact path computes its own geometry from the BLOCK-MAJOR
            # voxel constant, so coords/valid are born in (G, Q) layout and
            # the two ~94 MB block_major transposes never exist
            return self._lift_compact(depth, feat, mats, (Z, Y, X), BLK,
                                      min(K, (Y // BLK) * (X // BLK)),
                                      train)
        pix = G.get_pixel(self.voxel_coords, mats['sensor2ego'],
                          mats['intrin'], mats['ida'], mats.get('bda'))
        coords, valid = self._coords_valid(pix)     # (B, N, Z, Y, X, ...)

        outer_sampler = _pick_outer_sampler(c.lift_sampler, train,
                                            c.lift_chunk)

        def sample_cam(depth_n, feat_n, coords_n, valid_n):
            """One camera's voxel volume: (B, Z, Y, X, C)."""
            if c.variant == 'bilinear':
                vol = feat_n[:, None]     # (B, 1, h, w, C) depth-1 volume
                v = S.batched_grid_sample_3d_fused(vol, coords_n,
                                                   align_corners=False,
                                                   padding_mode='zeros')
            else:
                dvol = jnp.moveaxis(depth_n, -1, 1)  # (B, D, h, w)
                v = S.map_unbatched(lambda d, f, cc: outer_sampler(
                    d, f, cc, align_corners=False), dvol, feat_n, coords_n)
            return v * valid_n[..., None]

        if self.lift_vectorized:
            # keep the camera axis: under a camera-sharded mesh the sums over
            # axis 1 lower to an ICI all-reduce
            dep = (jnp.zeros(feat.shape[:2], feat.dtype) if depth is None
                   else depth)
            v = jax.vmap(sample_cam, in_axes=(1, 1, 1, 1), out_axes=1)(
                dep, feat, coords, valid)        # (B, N, Z, Y, X, C)
            numer = jnp.sum(v, axis=1)
            # per-channel camera count (base_vampire2.py:509-512)
            denom = jnp.sum((jnp.abs(v) > 0).astype(jnp.float32), axis=1)
            return numer / (denom + 1e-6)

        C = feat.shape[-1]
        # dense loop mode: accumulate over cameras so only one voxel volume
        # is live; jax.checkpoint rematerializes the gathers in backward
        def lift_one(n, acc):
            numer, denom = acc
            v = sample_cam(None if depth is None else depth[:, n],
                           feat[:, n], coords[:, n], valid[:, n])
            m = (jnp.abs(v) > 0).astype(jnp.float32)
            return numer + v, denom + m

        numer = jnp.zeros((B, Z, Y, X, C), jnp.float32)
        denom = jnp.zeros((B, Z, Y, X, C), jnp.float32)
        step = (jax.checkpoint(lift_one, static_argnums=0) if self.lift_remat
                else lift_one)
        for n in range(N):  # static unroll over the camera axis
            numer, denom = step(n, (numer, denom))
        return numer / (denom + 1e-6)

    def _lift_compact(self, depth, feat, mats, zyx, blk, topk,
                      train=False):
        """Block-compacted lift: gather only visible voxel blocks per camera.

        A camera's frustum covers <~35% of the (Y, X) ego grid, but the dense
        lift gathers all Z*Y*X queries per camera and masks afterwards — and
        the gather is ROW-LATENCY-bound on TPU (measured ~75-165M rows/s), so
        invalid rows cost as much as valid ones. Here the (Y, X) plane is
        tiled into blk x blk blocks, each camera selects its `topk` blocks by
        valid-query count (lax.top_k on the block-level mask counts), samples
        only those, and scatter-adds into block-major numerator/denominator
        accumulators. Exact (not approximate) whenever every block containing
        a valid query is selected — see BackboneConfig.lift_block_topk.

        Semantics otherwise identical to the dense masked-mean lift
        (base_vampire2.py:483-516).
        """
        from ..core import geometry as GEO
        c = self.cfg
        Z, Y, X = zyx
        B, N = feat.shape[:2]
        C = feat.shape[-1]
        GY, GX = Y // blk, X // blk
        Gn, Q = GY * GX, Z * blk * blk
        outer_sampler = _pick_outer_sampler(c.lift_sampler, train,
                                            c.lift_chunk)

        # geometry straight from the block-major voxel constant: get_pixel
        # treats spatial dims opaquely, so (G, Q, 1, 4) stands in for
        # (Z, Y, X, 4) and every per-voxel value is bit-identical to the
        # dense layout's — only the memory order differs
        pix = GEO.get_pixel(self.voxel_coords_bm[:, :, None],
                            mats['sensor2ego'], mats['intrin'],
                            mats['ida'], mats.get('bda'))[..., 0, :]
        coords_bm, valid_bm = self._coords_valid(pix)     # (B, N, G, Q, .)
        counts = jnp.sum(valid_bm, axis=-1)                      # (B, N, G)
        # coverage diagnostic (ADVICE r2): number of blocks holding valid
        # queries that the top-k selection DROPS — nonzero means a camera
        # rig outside the measured coverage margin silently loses
        # contributions. Sown under 'diagnostics' (free unless requested:
        # model.apply(..., mutable=['diagnostics'])).
        nonzero = jnp.sum((counts > 0).astype(jnp.int32), axis=-1)  # (B, N)
        sel_vals, _ = jax.lax.top_k(counts, topk)                   # (B,N,K)
        sel_nonzero = jnp.sum((sel_vals > 0).astype(jnp.int32), axis=-1)
        self.sow('diagnostics', 'lift_dropped_blocks',
                 jnp.sum(nonzero - sel_nonzero))

        # Per-(batch, camera) static loop, accumulating into a (G, Q, C)
        # pair per batch element. Every take/scatter here is UNBATCHED
        # (plain take over axis 0) — vmap/take_along_axis with a leading
        # batch dim lowers to XLA's batched gather, which forfeits the fast
        # row-gather path (2.8x slower on a VMEM-resident table at B=1,
        # ROUND5.md job18/job21). A fused all-cameras variant (one gather
        # over stacked camera-offset tables + one merged [numer|denom]
        # scatter, sampling.sample_outer_product_fused_multi) also measured
        # SLOWER in-model (occ_density block 58.6 -> 82.6 ms/frame): the
        # loop lets each camera's table build fuse into its own gather.
        def lift_one(b, n, acc):
            numer, denom = acc
            _, ids = jax.lax.top_k(counts[b, n], topk)           # (K,)
            cc = jnp.take(coords_bm[b, n], ids, axis=0)          # (K, Q, 3)
            vv = jnp.take(valid_bm[b, n], ids, axis=0)           # (K, Q)
            flat_cc = cc.reshape(topk * Q, 3)
            if c.variant == 'bilinear':
                vol = feat[b, n][None]
                v = S.grid_sample_3d_fused(vol, flat_cc,
                                           align_corners=False,
                                           padding_mode='zeros')
            else:
                dvol = jnp.moveaxis(depth[b, n], -1, 0)          # (D, h, w)
                v = outer_sampler(dvol, feat[b, n], flat_cc,
                                  align_corners=False)
            v = v.reshape(topk, Q, C) * vv[..., None]
            m = (jnp.abs(v) > 0).astype(jnp.float32)
            numer = numer.at[ids].add(v)
            denom = denom.at[ids].add(m)
            return numer, denom

        step = (jax.checkpoint(lift_one, static_argnums=(0, 1))
                if self.lift_remat else lift_one)
        outs = []
        for b in range(B):
            numer = jnp.zeros((Gn, Q, C), jnp.float32)
            denom = jnp.zeros((Gn, Q, C), jnp.float32)
            for n in range(N):
                numer, denom = step(b, n, (numer, denom))
            outs.append(numer / (denom + 1e-6))
        out = jnp.stack(outs)
        out = out.reshape(B, GY, GX, Z, blk, blk, C)
        out = jnp.transpose(out, (0, 3, 1, 4, 2, 5, 6))
        return out.reshape(B, Z, Y, X, C)

    def _query_points(self, fused_vol, tables, points):
        """Padded point queries (base_vampire2.py:576-596).

        points: (B, P, 3) ego xyz (padded). With `tables` present (a
        camera-render graph is alive and already paid for the corner-block
        table), samples the shared fused-field table in one row-gather per
        query. Without tables (metrics-only graphs, `camera_renders=False`),
        uses the direct 8-take sampler on the fused volume — building the
        ~0.5 GB corner table to serve 36k queries costs ~11 ms/frame
        (attrib_r5), vs ~3 ms for 8 narrow takes.
        Returns (pts_logits (B,P,K), pts_sdf (B,P)).
        """
        c = self.cfg
        K = c.num_classes
        norm = G.normalize_coords(points, c.x_bound_seg, c.y_bound_seg,
                                  c.z_bound_seg)
        # one take for logits (border) and sdf: for in-range points border ==
        # zeros sampling exactly, and the sdf is masked to 0 out of range just
        # like the reference (base_vampire2.py:594-595)
        if tables is not None:
            samp = S.batched_grid_sample_3d_fused(fused_vol, norm,
                                                  align_corners=True,
                                                  padding_mode='border',
                                                  tables=tables)
        else:
            samp = S.batched_grid_sample_3d(
                fused_vol.astype(self.sample_dtype), norm,
                align_corners=True, padding_mode='border')
        pts_logits = samp[..., 1:K + 1]
        pts_sdf = samp[..., 0] * G.inrange_mask(norm).astype(jnp.float32)
        return pts_logits, pts_sdf

    def _query_occ(self, seg_vol, sdf_vol, bda):
        """Occ3D grid queries (base_vampire2.py:597-611,647-648)."""
        c = self.cfg
        dens_vol = self._density(sdf_vol)
        if c.variant != 'vampire2':
            # static occ grid (lss/lss_inpaintor/bilinear): separable matmuls
            occ_logits = S.apply_sample_matrices(seg_vol,
                                                 self._occ_mats_border,
                                                 (1, 2, 3))
            occ_density = S.apply_sample_matrices(dens_vol,
                                                  self._occ_mats_zeros,
                                                  (1, 2, 3))[..., 0]
            # (B, Z', Y', X', C) -> (B, X, Y, Z, C)
            occ_logits = jnp.transpose(occ_logits, (0, 3, 2, 1, 4))
            occ_density = jnp.transpose(occ_density, (0, 3, 2, 1))
            return occ_logits, jnp.tanh(occ_density)
        if bda is not None:
            occ = G.rotate_occ_coords(self.occ_coords, bda)      # (B,X,Y,Z,3)
        else:
            B = seg_vol.shape[0]
            occ = jnp.broadcast_to(self.occ_coords[None],
                                   (B,) + self.occ_coords.shape)
        norm = G.normalize_coords(occ, c.x_bound_seg, c.y_bound_seg,
                                  c.z_bound_seg)
        occ_logits = S.batched_grid_sample_3d(seg_vol, norm,
                                              align_corners=True,
                                              padding_mode='border')
        occ_density = S.batched_grid_sample_3d(dens_vol, norm,
                                               align_corners=True,
                                               padding_mode='zeros')[..., 0]
        return occ_logits, jnp.tanh(occ_density)

    def _render_bev(self, fused, base_vol):
        """BEV rendering branch over the (always static) det grid
        (base_vampire2.py:391-467 BEV half): separable interpolation
        matmuls, z flipped (sky -> ground)."""
        c = self.cfg
        K = c.num_classes
        fused_bev = jnp.concatenate([fused, base_vol], axis=-1)
        vox = S.apply_sample_matrices(fused_bev, self._det_mats, (1, 2, 3))
        vox = jnp.flip(vox, axis=1)
        bev_density = self._density(vox[..., 0])
        bev_seg_l = vox[..., 1:K + 1]
        bev_rgb_v = vox[..., K + 1:K + 4]
        vox_out = vox[..., K + 4:]
        if c.cat_seg:
            vox_out = jnp.concatenate([vox_out, bev_seg_l], axis=-1)
        bev_rgb, bev_seg, bev_height = R.render_bev_columns(
            bev_density, bev_seg_l, bev_rgb_v, self.bev_mids, c.z_bound_det[2])
        return bev_rgb, bev_seg, bev_height, bev_density, vox_out

    def _render(self, geom_xyz, fused, tables, base_vol, train=False):
        """Both rendering branches (base_vampire2.py:391-467).

        geom_xyz: (B, N, D, fH, fW, 3). fused: (B, Z, Y, X, 1+K+3) fp32
        [sdf | seg | rgb]; tables: its shared bf16 corner-block tables.
        Returns camera renders + bev renders + bev density + voxel_output.
        """
        c = self.cfg
        K = c.num_classes
        geom_xyz = jnp.nan_to_num(geom_xyz, nan=-1e3)
        norm_geom = G.normalize_coords(geom_xyz[:, :, :-1], c.x_bound_seg,
                                       c.y_bound_seg, c.z_bound_seg)
        valid = G.inrange_mask(norm_geom).astype(jnp.float32)
        B, N, Snum, fh, fw = norm_geom.shape[:5]
        delta = jnp.linalg.norm(
            geom_xyz[:, :, 1:].astype(jnp.float32)
            - geom_xyz[:, :, :-1].astype(jnp.float32), axis=-1)
        # ray-major layout: (B, N*fh*fw rays, S, ...)
        def ray_major(x, tail):
            return jnp.moveaxis(x, 2, 4).reshape((B, N * fh * fw, Snum) + tail)
        coords_r = ray_major(norm_geom, (3,))
        valid_r = ray_major(valid, ())
        delta_r = ray_major(delta, ())
        Zs, Ys, Xs = c.grid_zyx('seg')
        # fused gather + per-ray compositing; with ray_pass_fracs configured
        # rays are length-sorted and only in-field samples are gathered (the
        # out-of-field "fog" tail is closed-form elementwise). Measured: a
        # LOSS for inference (sort/unsort reorders + serialized passes beat
        # the gather saving, configs.py), but in TRAINING the backward
        # scatter rows — ~4x slower per row than gathers — scale with the
        # gathered rows, so the compaction is applied when ray_pass_fracs
        # are configured and this is a train-mode forward.
        n_pass = -(-Snum // c.ray_chunk)
        n_et_pass = -(-Snum // c.ray_et_chunk)
        if c.ray_pass_fracs and len(c.ray_pass_fracs) != n_pass:
            raise ValueError(
                f'ray_pass_fracs has {len(c.ray_pass_fracs)} entries but the '
                f'ray axis makes {n_pass} passes (S={Snum}, chunk='
                f'{c.ray_chunk}); re-measure the curve or set () to disable')
        if c.ray_et_fracs and \
                len(c.ray_et_fracs) != n_et_pass - c.ray_et_prefix:
            raise ValueError(
                f'ray_et_fracs has {len(c.ray_et_fracs)} entries but needs '
                f'{n_et_pass - c.ray_et_prefix} (S={Snum}, chunk='
                f'{c.ray_et_chunk}, prefix={c.ray_et_prefix}); set () to '
                f'disable')
        use_compact = bool(train and c.ray_pass_fracs)
        use_et = bool((not train) and c.ray_et_fracs)
        if use_compact:
            sampler = functools.partial(
                R.sample_and_composite_rays_compact, chunk=c.ray_chunk,
                pass_fracs=c.ray_pass_fracs, remat=c.ray_remat)
        elif use_et:
            sampler = functools.partial(
                R.sample_and_composite_rays_earlyterm, chunk=c.ray_et_chunk,
                prefix=c.ray_et_prefix, caps_fracs=c.ray_et_fracs,
                tau=c.ray_et_tau, return_diag=True)
        else:
            sampler = R.sample_and_composite_rays
        outs = S.map_unbatched(
            lambda t, cc, vv, dd: sampler(
                t, (Zs, Ys, Xs), K, cc, vv, dd, self.camera_mids,
                self._density, c.d_bound[1]), tables, coords_r, valid_r,
            delta_r)
        rgb_p, seg_p, depth_p = outs[:3]
        if use_et:
            # coverage diagnostic (ADVICE r2): rays dropped by the static
            # cap schedule while still active and unsaturated (sd < tau) —
            # nonzero means the schedule's scene-family assumption was
            # violated and the bounded-error claim does not cover this
            # input. Sown under 'diagnostics'.
            self.sow('diagnostics', 'ray_et_uncovered_drops',
                     jnp.sum(outs[3]))
        rgb_p = rgb_p.reshape(B, N, fh, fw, 3)
        seg_p = seg_p.reshape(B, N, fh, fw, K)
        depth_p = depth_p.reshape(B, N, fh, fw)

        (bev_rgb, bev_seg, bev_height, bev_density,
         vox_out) = self._render_bev(fused, base_vol)
        return (rgb_p, seg_p, depth_p, bev_rgb, bev_seg, bev_height,
                bev_density, vox_out)

    # ------------------------------------------------------------------
    def __call__(self, imgs: jnp.ndarray, mats: Dict[str, jnp.ndarray],
                 points: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 camera_renders: bool = True) -> Dict[str, jnp.ndarray]:
        """Forward for the key frame (+ optional temporal sweep frames).

        camera_renders=False (inference-only graphs whose consumers read no
        per-camera rgb/seg/depth render — the three nuScenes metrics don't)
        skips the camera ray branch AND the shared corner-block table build
        it needs (~0.5 GB, ~11 ms/frame); point queries fall back to the
        direct 8-take sampler. The returned dict then carries None for
        rgb/seg/depth_preds. Training requires the renders (loss terms).

        Args:
          imgs: (B, N, H, W, 3) normalized key-frame images, or
            (B, F, N, H, W, 3) with sweep frames at dim 1, frame 0 = key
            (data/nuscenes.py stack_frames layout).
          mats: dict with 'sensor2ego'/'intrin'/'ida' (B, [F,] N, 4, 4) and
            'bda' (B, 4, 4) — the reference mats_dict slices.
          points: optional (B, P, 3) padded ego-frame query points.
          train: BN mode.

        Multi-sweep temporal fusion (the reference raises
        NotImplementedError for num_sweeps > 1, base_vampire2.py:690-693;
        this path is our design — see DEVIATIONS): the dataset composes every
        frame's sensor2ego into the KEY ego frame (sweepsensor2keyego,
        data/nuscenes.py:297), so a sweep camera is simply another
        ego-motion-compensated view of the key-frame field. Frames therefore
        fold into the camera axis — one batched encoder pass over F*N images
        (wider MXU batches, no second warp/resample pass, one live voxel
        volume) and the masked camera mean (base_vampire2.py:509-515) fuses
        all F*N views. Dynamic objects are uncorrected, like any flow-free
        warp fusion. Renders/queries use the key frame only; F == 1 in the
        multi-frame layout is bit-identical to the squeezed layout.

        Returns a dict mirroring the reference 12-tuple
        (base_vampire2.py:637-649).
        """
        c = self.cfg
        if imgs.ndim == 6:
            B, F, N, H, W, _ = imgs.shape
            imgs = imgs.reshape(B, F * N, H, W, 3)
            lift_mats = dict(mats, **{
                k: mats[k].reshape(B, F * N, 4, 4)
                for k in ('sensor2ego', 'intrin', 'ida')})
            key_mats = dict(mats, **{k: mats[k][:, 0]
                                     for k in ('sensor2ego', 'intrin', 'ida')})
        else:
            lift_mats = key_mats = mats
        B, NT, H, W, _ = imgs.shape                # NT = F * N views
        N = key_mats['sensor2ego'].shape[1]        # key-frame cameras
        feats = self._get_cam_feats(imgs.reshape(B * NT, H, W, 3), train)
        h, w = feats.shape[1:3]

        if c.variant != 'bilinear':
            depth_logits = self.mapping_along_depth(feats)
            depth = jax.nn.softmax(depth_logits.astype(jnp.float32), axis=-1)
            depth = depth.astype(self.dtype)
        else:
            depth = None
        low = self.channel_lower(feats)
        depth = None if depth is None else depth.reshape(B, NT, h, w, -1)
        low = low.reshape(B, NT, h, w, -1)

        voxel_feats = self._lift(depth, low, lift_mats, train)   # fp32
        if c.cat_pos:
            pos = jnp.broadcast_to(self.norm_voxel_coords[None],
                                   (B,) + self.norm_voxel_coords.shape)
            voxel_feats = jnp.concatenate([voxel_feats, pos], axis=-1)
        base = self.base_conv(voxel_feats.astype(self.dtype))
        sdf_vol = self.density_conv(base).astype(jnp.float32)
        seg_vol = self.seg_conv(base).astype(jnp.float32)
        if c.variant == 'bilinear':
            rgb_vol = jax.nn.sigmoid(
                self.rgb_conv(self.feature_conv(base)).astype(jnp.float32))
        else:
            rgb_vol = jax.nn.sigmoid(self.rgb_conv(base).astype(jnp.float32))
        base_f32 = base.astype(jnp.float32)

        # ONE shared corner-block table of the fused field [sdf | seg | rgb]
        # (bf16, like the reference's fp16-under-AMP sampled volume) serves
        # the point queries AND the camera-ray sampling. Channels are
        # zero-padded to table_pad_channels so rows are whole 128-lane
        # tiles (exact — the pad is sliced off after the weighted sum;
        # configs.py table_pad_channels).
        fused = jnp.concatenate([sdf_vol, seg_vol, rgb_vol], axis=-1)
        if camera_renders:
            fused_t = fused.astype(self.sample_dtype)
            cp = c.table_pad_channels
            if cp:
                if cp < fused_t.shape[-1]:
                    raise ValueError(
                        f'table_pad_channels={cp} < fused channel count '
                        f'{fused_t.shape[-1]} (must be >= 1+num_classes+3)')
                if cp > fused_t.shape[-1]:
                    fused_t = jnp.pad(
                        fused_t,
                        ((0, 0),) * 4 + ((0, cp - fused_t.shape[-1]),))
            tables = S.map_unbatched(S.build_neighborhood_table, fused_t)
        else:
            tables = None

        pts_logits = pts_sdf = None
        if points is not None:
            pts_logits, pts_sdf = self._query_points(fused, tables, points)

        occ_logits, occ_density = self._query_occ(seg_vol, sdf_vol,
                                                  mats.get('bda'))

        if camera_renders:
            geom_xyz = G.get_geometry(self.frustum, key_mats['sensor2ego'],
                                      key_mats['intrin'], key_mats['ida'],
                                      key_mats.get('bda'))
            (rgb_p, seg_p, depth_p, bev_rgb, bev_seg, bev_height,
             bev_density, vox_out) = self._render(geom_xyz, fused, tables,
                                                  base_f32, train=train)

            # x4 upsample of the camera renders (base_vampire2.py:616-626)
            up = c.upsample_factor
            fH, fW = c.feat_hw
            def up4(x):
                return S.resize_linear(x, (fH * up, fW * up), (2, 3))
            rgb_p = up4(rgb_p)
            seg_p = up4(seg_p)
            depth_p = up4(depth_p[..., None])[..., 0]
        else:
            rgb_p = seg_p = depth_p = None
            (bev_rgb, bev_seg, bev_height, bev_density,
             vox_out) = self._render_bev(fused, base_f32)

        # BEV feature for the det head (base_vampire2.py:627-632)
        gate = jnp.tanh(bev_density) if c.density_mode == 'sdf' else bev_density
        vo = vox_out * gate[..., None]                  # (B, Zd, Y, X, C)
        B_, Zd, Yd, Xd, Cv = vo.shape
        # channel order c*Zd+z matches the reference's (C, Z) flatten
        vo = jnp.transpose(vo, (0, 2, 3, 4, 1)).reshape(B_, Yd, Xd, Cv * Zd)
        bev_feat = self.voxel_output(vo.astype(jnp.float32))
        _, oY, oX = self.cfg.grid_zyx('det')
        if oY == 256:
            bev_feat = S.resize_linear(bev_feat, (oY // 2, oX // 2), (1, 2))

        return dict(
            bev_feature=bev_feat,            # (B, 128, 128, 80) fp32
            rgb_preds=rgb_p,                 # (B, N, 256, 704, 3)
            seg_logits_preds=seg_p,          # (B, N, 256, 704, K)
            depth_preds=depth_p,             # (B, N, 256, 704)
            bev_rgb_preds=bev_rgb,           # (B, Y, X, 3)
            bev_seg_logits_preds=bev_seg,    # (B, Y, X, K)
            bev_height_preds=bev_height,     # (B, Y, X)
            bev_density=bev_density,         # (B, Zd, Y, X)
            pts_logits=pts_logits,           # (B, P, K) or None
            pts_sdf=pts_sdf,                 # (B, P) or None
            occ_logits=occ_logits,           # (B, 200, 200, 16, K)
            occ_density=occ_density,         # (B, 200, 200, 16)
        )
