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

from typing import Tuple

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


def sample_and_composite_rays(table: jnp.ndarray,
                              vol_shape: Tuple[int, int, int],
                              num_classes: int,
                              coords: jnp.ndarray,
                              valid: jnp.ndarray,
                              deltas: jnp.ndarray,
                              camera_mids: jnp.ndarray,
                              density_fn,
                              bg_depth: float,
                              chunk_rays: int = 384
                              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused field-sampling + alpha compositing over whole rays.

    Semantically identical to grid_sample_3d_fused(fused_vol, coords) * valid
    followed by render_camera_rays, but chunked per RAY so the sampled field
    tensor (S x 22 floats per ray, ~0.5 GB/frame) never materializes in HBM —
    each chunk gathers its corner rows, composites in VMEM, and writes only
    the per-ray results. Chunks are rematerialized in backward (re-gather
    instead of storing gathered rows). chunk_rays=384 is the measured
    optimum at flagship shapes (47.3 / 49.8 / 50.9 / 74.6 ms for
    384/768/1536/192, ROUND5.md job30).

    Args:
      table: build_neighborhood_table(fused_vol) where fused_vol is
        (Z, Y, X, 1 + K + 3) channels [sdf | seg logits | rgb].
      vol_shape: (Z, Y, X) of the fused volume.
      num_classes: K.
      coords: (Rays, S, 3) normalized sample coords (x, y, z), align_corners
        =True, zeros padding (the camera-branch semantics).
      valid: (Rays, S) in-range mask (float or bool).
      deltas: (Rays, S) per-sample path lengths.
      camera_mids: (S,) depth-bin midpoints.
      density_fn: SDF -> density.
      bg_depth: background depth for (1 - acc).

    Returns:
      (rgb (Rays, 3), seg (Rays, K), depth (Rays,)) fp32.
    """
    from . import sampling as S
    D, H, W = vol_shape
    K = num_classes
    C = 1 + K + 3
    flat = table.reshape(table.shape[0], -1)
    # Ct >= C when the table carries lane-alignment channel padding
    # (BackboneConfig.table_pad_channels); the zero pad is sliced off after
    # the (exact) weighted sum.
    Ct = flat.shape[1] // 8
    R, S_n = coords.shape[:2]
    pad = (-R) % chunk_rays
    coords_p = jnp.pad(coords, ((0, pad), (0, 0), (0, 0)))
    valid_p = jnp.pad(valid.astype(jnp.float32), ((0, pad), (0, 0)))
    deltas_p = jnp.pad(deltas.astype(jnp.float32), ((0, pad), (0, 0)))
    n_chunks = (R + pad) // chunk_rays
    mids = camera_mids.astype(jnp.float32)

    @jax.checkpoint
    def one_chunk(args):
        cc, val, dl = args                       # (cr, S, 3), (cr, S), (cr, S)
        rows, w8 = S.corner_rows_weights(cc.reshape(-1, 3), (D, H, W),
                                         True, False)
        t = jnp.take(flat, rows, axis=0).reshape(-1, 8, Ct)
        samp = jnp.sum(t.astype(jnp.float32) * w8[:, :, None], axis=1)
        samp = samp.reshape(chunk_rays, S_n, Ct)[..., :C] * val[..., None]
        sdf = samp[..., 0]
        seg = samp[..., 1:K + 1]
        rgb = samp[..., K + 1:K + 4]
        density = density_fn(sdf)
        sd = density * dl
        alpha = 1.0 - jnp.exp(-sd)
        trans = jnp.exp(-(jnp.cumsum(sd, axis=-1) - sd))
        w = alpha * trans                                       # (cr, S)
        acc = jnp.sum(w, axis=-1)
        rgb_o = jnp.sum(w[..., None] * rgb, axis=1)
        seg_o = jnp.sum(w[..., None] * seg, axis=1)
        depth_o = jnp.sum(w * mids[None, :], axis=1) \
            + (1.0 - acc) * bg_depth
        return jnp.concatenate([rgb_o, seg_o, depth_o[:, None]], axis=-1)

    outs = jax.lax.map(one_chunk,
                       (coords_p.reshape(n_chunks, chunk_rays, S_n, 3),
                        valid_p.reshape(n_chunks, chunk_rays, S_n),
                        deltas_p.reshape(n_chunks, chunk_rays, S_n)))
    out = outs.reshape(-1, C)[:R]
    return out[:, :3], out[:, 3:K + 3], out[:, K + 3]


def _make_ray_pass(flat, Ct, C, K, vol_shape, density_fn):
    """One chunk-pass of the pass-structured ray samplers (compact and
    early-term share this exactly): gather + composite `sc` samples of `kj`
    rays given each ray's carried optical depth `sd_in`; returns per-ray
    [rgb(3) | seg(K) | depth | w | sd] partial sums."""
    from . import sampling as S
    D, H, W = vol_shape

    def one_pass(cc, vl, dl, sd_in, m_sl):
        kj, sc = vl.shape
        rows, w8 = S.corner_rows_weights(cc.reshape(-1, 3), (D, H, W),
                                         True, False)
        t = jnp.take(flat, rows, axis=0).reshape(-1, 8, Ct)
        samp = jnp.sum(t.astype(jnp.float32) * w8[:, :, None], axis=1)
        samp = samp.reshape(kj, sc, Ct)[..., :C] * vl[..., None]
        sdf = samp[..., 0]
        density = density_fn(sdf)
        sd = density * dl
        local = jnp.cumsum(sd, axis=-1) - sd
        trans = jnp.exp(-(sd_in[:, None] + local))
        w = (1.0 - jnp.exp(-sd)) * trans                        # (kj, sc)
        rgb_o = jnp.sum(w[..., None] * samp[..., K + 1:K + 4], axis=1)
        seg_o = jnp.sum(w[..., None] * samp[..., 1:K + 1], axis=1)
        depth_o = jnp.sum(w * m_sl[None, :], axis=1)
        w_o = jnp.sum(w, axis=1)
        sd_o = jnp.sum(sd, axis=1)
        return jnp.concatenate(
            [rgb_o, seg_o, depth_o[:, None], w_o[:, None], sd_o[:, None]],
            axis=-1)

    return one_pass


def _fog_and_finalize(acc, dl_sorted, fog_m, mids, d0, bg_depth, order, K):
    """Shared tail of the pass-structured samplers: closed-form fog
    compositing over the untouched (ray, sample) mask `fog_m` (sorted ray
    order), bg-depth completion, unsort, output split.

    Accumulator layout: rgb [0:3] | seg [3:3+K] | depth K+3 | w K+4 | sd K+5.
    """
    sd_f = d0 * dl_sorted * fog_m
    local = jnp.cumsum(sd_f, axis=-1) - sd_f
    trans = jnp.exp(-(acc[:, K + 5][:, None] + local))
    wf = (1.0 - jnp.exp(-sd_f)) * trans * fog_m
    depth_f = jnp.sum(wf * mids[None, :], axis=1)
    w_f = jnp.sum(wf, axis=1)
    acc_w = acc[:, K + 4] + w_f
    depth = acc[:, K + 3] + depth_f + (1.0 - acc_w) * bg_depth
    out = jnp.concatenate([acc[:, :K + 3], depth[:, None]], axis=-1)
    inv = jnp.argsort(order)
    out = jnp.take(out, inv, axis=0)
    return out[:, :3], out[:, 3:K + 3], out[:, K + 3]


def sample_and_composite_rays_compact(table: jnp.ndarray,
                                      vol_shape: Tuple[int, int, int],
                                      num_classes: int,
                                      coords: jnp.ndarray,
                                      valid: jnp.ndarray,
                                      deltas: jnp.ndarray,
                                      camera_mids: jnp.ndarray,
                                      density_fn,
                                      bg_depth: float,
                                      chunk: int,
                                      pass_fracs: Tuple[float, ...],
                                      remat: bool = True
                                      ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                 jnp.ndarray]:
    """Length-sorted compacted version of `sample_and_composite_rays`.

    Rays traverse the convex field box once: each ray's in-range samples are
    a prefix [0, L) of the sample axis (the frustum starts at d_bound[0],
    inside the box). Out-of-range samples still contribute to compositing —
    zeros-padding makes the sampled field 0 there, and density_fn(0) is a
    nonzero constant "fog" (exactly as in the reference's grid_sample +
    Laplace density, base_vampire2.py:419-434) — but that contribution is
    value-free (rgb = seg = 0) and needs NO gather: it is closed-form
    elementwise math in (d0, delta).

    So: sort rays by L descending; process the sample axis in `chunk`-sized
    passes where pass j only touches the first K_j = ceil(pass_fracs[j] *
    rays) sorted rays (static shapes); carry per-ray accumulated optical
    depth across passes so transmittance continues exactly; then add the
    analytic fog term for every (ray, sample) the passes did not touch, and
    unsort. Exact (fp reassociation aside) whenever K_j covers every ray
    with L > j*chunk — pass_fracs carry a measured worst-case margin
    (tests/test_rendering.py).

    Args/returns: as `sample_and_composite_rays`, plus `chunk`/`pass_fracs`
    (BackboneConfig.ray_chunk / ray_pass_fracs).
    """
    import numpy as np
    K = num_classes
    C = 1 + K + 3
    flat = table.reshape(table.shape[0], -1)
    Ct = flat.shape[1] // 8   # >= C with lane-alignment channel padding
    R, S_n = coords.shape[:2]
    n_pass = -(-S_n // chunk)
    assert len(pass_fracs) == n_pass, (len(pass_fracs), n_pass)
    mids = camera_mids.astype(jnp.float32)
    val = valid.astype(jnp.float32)
    dl_all = deltas.astype(jnp.float32)
    d0 = density_fn(jnp.zeros((), jnp.float32))

    has = jnp.any(val > 0, axis=1)
    L = jnp.where(has, S_n - jnp.argmax(val[:, ::-1] > 0, axis=1), 0)
    order = jnp.argsort(-L)
    coords_s = jnp.take(coords, order, axis=0)
    val_s = jnp.take(val, order, axis=0)
    dl_s = jnp.take(dl_all, order, axis=0)

    caps = [min(R, int(np.ceil(f * R / 256.0) * 256)) for f in pass_fracs]
    # non-increasing caps: the fog term assumes every ray's processed
    # samples are a contiguous prefix of the sample axis
    for j in range(n_pass - 2, -1, -1):
        caps[j] = max(caps[j], caps[j + 1])

    # accumulators (sorted ray order): rgb(3) | seg(K) | depth_w | acc_w | sd
    acc = jnp.zeros((R, C + 2), jnp.float32)

    one_pass = _make_ray_pass(flat, Ct, C, K, vol_shape, density_fn)
    # remat=True re-gathers each pass's rows in backward (minimal memory);
    # False stores the gathered/composited residuals instead — trades HBM
    # for skipping the backward re-gather (see BackboneConfig.ray_remat)
    if remat:
        one_pass = jax.checkpoint(one_pass)
    for j, kj in enumerate(caps):
        s0 = j * chunk
        s1 = min(S_n, s0 + chunk)
        upd = one_pass(coords_s[:kj, s0:s1], val_s[:kj, s0:s1],
                       dl_s[:kj, s0:s1], acc[:kj, C + 1], mids[s0:s1])
        acc = acc.at[:kj].add(upd)

    # analytic fog for all (ray, s) the passes did not touch: sorted ray at
    # position p was processed for s < processed[p] = sum of chunks with
    # k_j > p; beyond that the sampled field is 0 -> density d0.
    pos = jnp.arange(R)
    processed = sum(
        jnp.where(pos < kj, min(S_n, (j + 1) * chunk) - j * chunk, 0)
        for j, kj in enumerate(caps))
    s_idx = jnp.arange(S_n)[None, :]
    fog_m = (s_idx >= processed[:, None]).astype(jnp.float32)
    return _fog_and_finalize(acc, dl_s, fog_m, mids, d0, bg_depth, order, K)


def sample_and_composite_rays_earlyterm(table: jnp.ndarray,
                                        vol_shape: Tuple[int, int, int],
                                        num_classes: int,
                                        coords: jnp.ndarray,
                                        valid: jnp.ndarray,
                                        deltas: jnp.ndarray,
                                        camera_mids: jnp.ndarray,
                                        density_fn,
                                        bg_depth: float,
                                        chunk: int,
                                        prefix: int,
                                        caps_fracs: Tuple[float, ...],
                                        tau: float = 7.0,
                                        return_diag: bool = False):
    """Transmittance-sorted early-termination variant of the ray sampler.

    Combines BOTH structural sources of wasted gather rows (the reference
    composites all samples of every ray, base_vampire2.py:419-434):

      * rays that have EXITED the convex field box (valid samples are a
        prefix [0, L)) — their remaining compositing contribution is the
        closed-form zeros-padding "fog", no gather needed (exact, as in
        `sample_and_composite_rays_compact`);
      * rays whose carried optical depth `sd` has saturated — remaining
        transmittance exp(-sd) <= exp(-tau) makes every further sample's
        weight negligible (the classic volume-rendering early exit).

    Pipeline: `prefix` dense chunk-passes over ALL rays accumulate carried
    optical depth; then ONE sort (key = carried sd, exited rays forced
    last); remaining passes run on shrinking static ray counts
    ceil(caps_fracs[j] * R) — sd only grows, so the sort order remains the
    right priority for every later pass. Dropped rays are either exited
    (exact fog added in closed form) or carry sd at drop time; the absolute
    output error per dropped ray is bounded by exp(-sd_drop) * value range,
    <= exp(-tau) when the caps cover every ray with sd < tau. The returned
    diagnostic counts (ray, pass) drops that violate that coverage
    (sd < tau, not exited) so mis-sized caps are detectable, not silent.

    caps_fracs are static per-config constants — measured on representative
    scene statistics with margin (see BackboneConfig.ray_et_fracs), so the
    COST is data-independent; only the (bounded) error is data-dependent.

    Args: as `sample_and_composite_rays`, plus
      chunk: samples per pass; prefix: number of dense passes before the
      sort; caps_fracs: per-post-sort-pass ray fractions (len must be
      ceil(S/chunk) - prefix); tau: coverage threshold for the diagnostic;
      return_diag: also return the violation count.

    Returns (rgb (R,3), seg (R,K), depth (R,)) fp32 [, diag ()].
    """
    import numpy as np
    K = num_classes
    C = 1 + K + 3
    flat = table.reshape(table.shape[0], -1)
    Ct = flat.shape[1] // 8   # >= C with lane-alignment channel padding
    R, S_n = coords.shape[:2]
    n_pass = -(-S_n // chunk)
    assert 0 < prefix <= n_pass
    assert len(caps_fracs) == n_pass - prefix, (len(caps_fracs), n_pass, prefix)
    mids = camera_mids.astype(jnp.float32)
    val = valid.astype(jnp.float32)
    dl_all = deltas.astype(jnp.float32)
    d0 = density_fn(jnp.zeros((), jnp.float32))

    one_pass = jax.checkpoint(
        _make_ray_pass(flat, Ct, C, K, vol_shape, density_fn))

    # accumulator layout: rgb [0:3] | seg [3:3+K] | depth K+3 | w K+4 | sd K+5
    acc = jnp.zeros((R, C + 2), jnp.float32)
    for j in range(prefix):
        s0, s1 = j * chunk, min(S_n, (j + 1) * chunk)
        upd = one_pass(coords[:, s0:s1], val[:, s0:s1], dl_all[:, s0:s1],
                       acc[:, C + 1], mids[s0:s1])
        acc = acc + upd

    # one transmittance sort; exited rays (all in-field samples consumed)
    # go last — their tail is exact closed-form fog
    has = jnp.any(val > 0, axis=1)
    L = jnp.where(has, S_n - jnp.argmax(val[:, ::-1] > 0, axis=1), 0)
    exited = L <= prefix * chunk
    key = acc[:, C + 1] + jnp.where(exited, 1e9, 0.0)
    order = jnp.argsort(key)
    acc = jnp.take(acc, order, axis=0)
    exited_s = jnp.take(exited, order)

    caps = [min(R, int(np.ceil(f * R / 256.0) * 256)) for f in caps_fracs]
    for j in range(len(caps) - 2, -1, -1):
        caps[j] = max(caps[j], caps[j + 1])

    diag = jnp.zeros((), jnp.int32)
    pos = jnp.arange(R)
    for j, kj in enumerate(caps):
        s0 = (prefix + j) * chunk
        s1 = min(S_n, s0 + chunk)
        # lazy reorder: slice the sample window first, then take the rows
        idx = order[:kj]
        cc = jnp.take(coords[:, s0:s1], idx, axis=0)
        vl = jnp.take(val[:, s0:s1], idx, axis=0)
        dl = jnp.take(dl_all[:, s0:s1], idx, axis=0)
        upd = one_pass(cc, vl, dl, acc[:kj, C + 1], mids[s0:s1])
        acc = acc.at[:kj].add(upd)
        if return_diag:
            dropped_bad = (pos >= kj) & (~exited_s) & (acc[:, C + 1] < tau)
            diag = diag + jnp.sum(dropped_bad.astype(jnp.int32))

    # closed-form fog for EXITED rays' untouched samples
    processed = prefix * chunk + sum(
        jnp.where(pos < kj, min(S_n, (prefix + j + 1) * chunk)
                  - (prefix + j) * chunk, 0)
        for j, kj in enumerate(caps))
    s_idx = jnp.arange(S_n)[None, :]
    fog_m = ((s_idx >= processed[:, None])
             & exited_s[:, None]).astype(jnp.float32)
    dl_s = jnp.take(dl_all, order, axis=0)
    res = _fog_and_finalize(acc, dl_s, fog_m, mids, d0, bg_depth, order, K)
    return res + (diag,) if return_diag else res


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
