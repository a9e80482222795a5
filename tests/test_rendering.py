"""Golden tests for densities and alpha compositing vs a torch oracle
re-deriving base_vampire2.py:391-467 and render_utils.py."""
import jax
import numpy as np
import torch

import jax.numpy as jnp

from vampire_tpu.core import rendering as R


def test_laplace_density_matches_reference():
    """render_utils.py:30-46 (ModifyLaplaceDensity)."""
    sdf = np.linspace(-3, 2, 41).astype(np.float32)
    beta, bias, beta_min = 0.1, -1.0, 1e-4
    got = np.asarray(R.laplace_density(jnp.asarray(sdf), beta, bias, beta_min))
    t = torch.from_numpy(sdf)
    beta_eff = abs(beta) + beta_min
    alpha = 1 / beta_eff
    want = alpha * (0.5 + 0.5 * (t - bias).sign()
                    * torch.expm1(-(t - bias).abs() / beta_eff))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)
    # deep-inside point -> density ~ alpha; far-outside -> ~0
    assert got[0] > 0.99 * alpha
    assert got[-1] < 1e-3


def test_transmittance_weights_match_torch_cumsum():
    rng = np.random.RandomState(0)
    density = rng.rand(2, 3, 5, 4, 4).astype(np.float32) * 3
    delta = rng.rand(2, 3, 5, 4, 4).astype(np.float32)
    w, acc = R.transmittance_weights(jnp.asarray(density), jnp.asarray(delta),
                                     axis=2)
    td, tdel = torch.from_numpy(density), torch.from_numpy(delta)
    sd = td * tdel
    alpha = 1 - torch.exp(-sd)
    trans = torch.exp(-torch.cat(
        [torch.zeros_like(sd[:, :, :1]), torch.cumsum(sd[:, :, :-1], dim=2)],
        dim=2))
    want = alpha * trans
    np.testing.assert_allclose(np.asarray(w), want.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), want.sum(dim=2).numpy(),
                               rtol=1e-4, atol=1e-6)


def test_render_camera_rays_end_to_end():
    """Full camera branch vs torch oracle with Laplace density."""
    rng = np.random.RandomState(1)
    B, N, S, h, w, K = 1, 2, 6, 3, 4, 5
    sdf = rng.randn(B, N, S, h, w).astype(np.float32)
    seg = rng.randn(B, N, S, h, w, K).astype(np.float32)
    rgb = rng.rand(B, N, S, h, w, 3).astype(np.float32)
    geom = np.cumsum(rng.rand(B, N, S + 1, h, w, 3).astype(np.float32), axis=2)
    mids = np.linspace(2.4, 69.6, S).astype(np.float32)
    beta, bias = 0.1, -1.0
    density_fn = lambda s: R.laplace_density(s, beta, bias)
    rgb_p, seg_p, depth_p = R.render_camera_rays(
        jnp.asarray(sdf), jnp.asarray(seg), jnp.asarray(rgb), jnp.asarray(geom),
        jnp.asarray(mids), density_fn, bg_depth=70.4)

    # torch oracle (base_vampire2.py:423-440)
    t_sdf = torch.from_numpy(sdf)
    beta_eff = abs(beta) + 1e-4
    dens = (1 / beta_eff) * (0.5 + 0.5 * (t_sdf - bias).sign()
                             * torch.expm1(-(t_sdf - bias).abs() / beta_eff))
    t_geom = torch.from_numpy(geom)
    delta = torch.norm(t_geom[:, :, 1:] - t_geom[:, :, :-1], dim=-1)
    sd = dens * delta
    alpha = 1 - torch.exp(-sd)
    trans = torch.exp(-torch.cat(
        [torch.zeros_like(sd[:, :, :1]), torch.cumsum(sd[:, :, :-1], dim=2)],
        dim=2))
    wts = alpha * trans
    acc = wts.sum(dim=2)
    bg = (1 - acc) * 70.4
    want_rgb = (wts[..., None] * torch.from_numpy(rgb)).sum(dim=2)
    want_seg = (wts[..., None] * torch.from_numpy(seg)).sum(dim=2)
    want_depth = (wts * torch.from_numpy(mids)[None, None, :, None, None]
                  ).sum(dim=2) + bg
    np.testing.assert_allclose(np.asarray(rgb_p), want_rgb.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg_p), want_seg.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth_p), want_depth.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_render_bev_columns():
    rng = np.random.RandomState(2)
    B, S, Y, X, K = 2, 10, 4, 4, 3
    dens = rng.rand(B, S, Y, X).astype(np.float32)
    seg = rng.randn(B, S, Y, X, K).astype(np.float32)
    rgb = rng.rand(B, S, Y, X, 3).astype(np.float32)
    mids = np.linspace(2.8, -0.8, S).astype(np.float32)
    bev_rgb, bev_seg, bev_h = R.render_bev_columns(
        jnp.asarray(dens), jnp.asarray(seg), jnp.asarray(rgb),
        jnp.asarray(mids), 0.4)

    td = torch.from_numpy(dens)
    sd = td * 0.4
    alpha = 1 - torch.exp(-sd)
    trans = torch.exp(-torch.cat(
        [torch.zeros_like(sd[:, :1]), torch.cumsum(sd[:, :-1], dim=1)], dim=1))
    wts = alpha * trans
    want_rgb = (wts[..., None] * torch.from_numpy(rgb)).sum(dim=1)
    want_h = (wts * torch.from_numpy(mids)[None, :, None, None]).sum(dim=1)
    np.testing.assert_allclose(np.asarray(bev_rgb), want_rgb.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bev_h), want_h.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_sample_and_composite_rays_matches_unfused():
    """The fused gather+composite path must equal grid_sample_3d_fused
    followed by render_camera_rays exactly (same table dtype)."""
    from vampire_tpu.core import sampling as S
    rng = np.random.RandomState(5)
    Z, Y, X, K = 5, 8, 8, 4
    C = 1 + K + 3
    N, Sn, h, w = 2, 7, 3, 4
    vol = rng.randn(Z, Y, X, C).astype(np.float32)
    geom = rng.uniform(-60, 60, (1, N, Sn + 1, h, w, 3)).astype(np.float32)
    geom = np.sort(geom, axis=2)  # monotone along the ray for sane deltas
    xb, yb, zb = (-51.2, 51.2, 0.4), (-51.2, 51.2, 0.4), (-5.0, 3.0, 0.4)
    from vampire_tpu.core import geometry as G
    norm = G.normalize_coords(jnp.asarray(geom[:, :, :-1]), xb, yb, zb)
    valid = G.inrange_mask(norm).astype(jnp.float32)
    delta = jnp.linalg.norm(jnp.asarray(geom[:, :, 1:])
                            - jnp.asarray(geom[:, :, :-1]), axis=-1)
    mids = jnp.linspace(2.0, 70.4, Sn)
    dens_fn = lambda x: jax.nn.sigmoid(x)

    # unfused oracle
    samp = S.grid_sample_3d_fused(jnp.asarray(vol), norm.reshape(-1, 3),
                                  align_corners=True, padding_mode='zeros')
    samp = samp.reshape(1, N, Sn, h, w, C) * valid[..., None]
    want_rgb, want_seg, want_depth = R.render_camera_rays(
        samp[..., 0], samp[..., 1:K + 1], samp[..., K + 1:K + 4],
        jnp.asarray(geom), mids, dens_fn, 70.4)

    table = S.build_neighborhood_table(jnp.asarray(vol))
    def rm(x, tail):
        return jnp.moveaxis(x, 2, 4).reshape((1, N * h * w, Sn) + tail)
    rgb, seg, depth = jax.vmap(
        lambda t, cc, vv, dd: R.sample_and_composite_rays(
            t, (Z, Y, X), K, cc, vv, dd, mids, dens_fn, 70.4,
            chunk_rays=8))(table[None], rm(norm, (3,)), rm(valid, ()),
                           rm(delta, ()))
    np.testing.assert_allclose(rgb.reshape(1, N, h, w, 3), want_rgb,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(seg.reshape(1, N, h, w, K), want_seg,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(depth.reshape(1, N, h, w), want_depth,
                               rtol=1e-4, atol=1e-4)


def test_compact_rays_match_dense():
    """Length-sorted compacted sampler == dense fused sampler.

    Three regimes: (a) full caps (every pass covers all rays) on arbitrary
    masks; (b) reduced caps on prefix-style masks they cover — the fog tail
    must reproduce the dense zeros-padding density(0) contribution exactly;
    (c) laplace density (nonzero fog) instead of sigmoid.
    """
    from vampire_tpu.core import sampling as S
    rng = np.random.RandomState(11)
    Z, Y, X, K = 5, 8, 8, 4
    C = 1 + K + 3
    Rays, Sn = 300, 16
    vol = rng.randn(Z, Y, X, C).astype(np.float32)
    table = S.build_neighborhood_table(jnp.asarray(vol))
    coords = jnp.asarray(rng.uniform(-1.4, 1.4, (Rays, Sn, 3))
                         .astype(np.float32))
    from vampire_tpu.core import geometry as G
    valid_geom = G.inrange_mask(coords).astype(jnp.float32)
    delta = jnp.asarray(rng.uniform(0.3, 1.2, (Rays, Sn)).astype(np.float32))
    mids = jnp.linspace(2.0, 70.4, Sn)

    # prefix-style validity: random per-ray length, in-range before, far
    # out-of-range after (mirrors the frustum leaving the field box)
    L = rng.randint(0, Sn + 1, Rays)
    prefix_coords = np.asarray(coords).copy()
    for r in range(Rays):
        prefix_coords[r, L[r]:, :] = 1.9  # out of range -> valid 0
        prefix_coords[r, :L[r], :] = np.clip(prefix_coords[r, :L[r], :],
                                             -0.95, 0.95)
    prefix_coords = jnp.asarray(prefix_coords)
    prefix_valid = G.inrange_mask(prefix_coords).astype(jnp.float32)

    for name, dens_fn in (('sigmoid', lambda x: jax.nn.sigmoid(x)),
                          ('laplace', lambda x: R.laplace_density(x, 0.2,
                                                                  -1.0))):
        for cc, vv, fracs in (
                (coords, valid_geom, (1.0, 1.0)),        # (a) full caps
                (prefix_coords, prefix_valid, (1.0, 1.0)),
                (prefix_coords, prefix_valid, (1.0, 0.6)),  # (b) real caps
        ):
            want = R.sample_and_composite_rays(
                table, (Z, Y, X), K, cc, vv, delta, mids, dens_fn, 70.4,
                chunk_rays=64)
            got = R.sample_and_composite_rays_compact(
                table, (Z, Y, X), K, cc, vv, delta, mids, dens_fn, 70.4,
                chunk=8, pass_fracs=fracs)
            for a, b in zip(want, got):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=2e-5, atol=2e-5,
                                           err_msg=f'{name} fracs={fracs}')

    # remat=True (re-gather in backward) is bit-identical in value AND
    # gradient to the default remat=False path (stores residuals; chip A/B
    # 674 vs 780 ms/step made False the default)
    def loss(tb, remat):
        outs = R.sample_and_composite_rays_compact(
            tb, (Z, Y, X), K, prefix_coords, prefix_valid, delta, mids,
            lambda x: jax.nn.sigmoid(x), 70.4, chunk=8,
            pass_fracs=(1.0, 0.6), remat=remat)
        return sum(jnp.sum(o * o) for o in outs)
    v1, g1 = jax.value_and_grad(loss)(table, True)
    v2, g2 = jax.value_and_grad(loss)(table, False)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_flagship_ray_pass_coverage_margin():
    """Per-pass sorted-ray capacities cover the worst-case length curve of
    the flagship frustum geometry across camera rigs and the full reference
    bda augmentation range, with margin (the BackboneConfig.ray_pass_fracs
    default, applied to train-mode forwards)."""
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.core import geometry as G
    from vampire_tpu.data.synthetic import camera_rig
    cfg = flagship_config()
    c = cfg.backbone
    frustum = jnp.asarray(G.make_frustum(c.final_dim, c.downsample_factor,
                                         c.d_bound))
    Sn = frustum.shape[0] - 1
    n_pass = -(-Sn // c.ray_chunk)
    ray_pass_fracs = c.ray_pass_fracs
    assert len(ray_pass_fracs) == n_pass

    def bda_mat(rot_deg, scale, fx, fy):
        a = np.deg2rad(rot_deg)
        m = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                      [0, 0, 1]], np.float32) * scale
        if fx:
            m = np.diag([-1.0, 1.0, 1.0]).astype(np.float32) @ m
        if fy:
            m = np.diag([1.0, -1.0, 1.0]).astype(np.float32) @ m
        out = np.eye(4, dtype=np.float32)
        out[:3, :3] = m
        return out

    rng = np.random.RandomState(3)
    draws = [(0, 1.0, 0, 0), (22.5, 1.05, 1, 1), (-22.5, 1.05, 1, 0),
             (22.5, 0.95, 0, 1), (-22.5, 0.95, 0, 0)]
    draws += [(rng.uniform(-22.5, 22.5), rng.uniform(0.95, 1.05),
               rng.randint(2), rng.randint(2)) for _ in range(4)]
    xb, yb, zb = c.x_bound_seg, c.y_bound_seg, c.z_bound_seg
    worst = np.zeros(n_pass)
    for seed in (0, 1, 2):
        rig = camera_rig(1, 6, c.final_dim, seed=seed)
        for rot, sc, fx, fy in draws:
            bda = jnp.asarray(bda_mat(rot, sc, fx, fy))[None]
            geom = np.asarray(G.get_geometry(
                frustum, jnp.asarray(rig['sensor2ego']),
                jnp.asarray(rig['intrin']), jnp.asarray(rig['ida']),
                bda))[0][:, :-1]
            nx = (geom[..., 0] - xb[0]) / (xb[1] - xb[0]) * 2 - 1
            ny = (geom[..., 1] - yb[0]) / (yb[1] - yb[0]) * 2 - 1
            nz = (geom[..., 2] - zb[0]) / (zb[1] - zb[0]) * 2 - 1
            v = ((np.abs(nx) <= 1) & (np.abs(ny) <= 1) & (np.abs(nz) <= 1))
            v = v.transpose(0, 2, 3, 1).reshape(-1, Sn)
            any_v = v.any(1)
            L = np.where(any_v, Sn - v[:, ::-1].argmax(1), 0)
            fr = np.array([(L > c.ray_chunk * j).mean()
                           for j in range(n_pass)])
            worst = np.maximum(worst, fr)
    # every pass capacity exceeds the worst observed demand by >=5%
    for j, f in enumerate(ray_pass_fracs):
        assert min(1.0, worst[j] * 1.05) <= f + 1e-9, (j, worst[j], f)


def test_earlyterm_rays_match_dense():
    """Transmittance-sorted early-termination sampler vs the dense sampler.

    (a) full caps, arbitrary masks -> exact; (b) caps covering every
    non-exited ray on prefix-style masks -> exact (the exited tail is
    closed-form fog); (c) caps that drop saturated rays -> error bounded by
    exp(-tau) * value scale, and the coverage diagnostic is zero.
    """
    from vampire_tpu.core import sampling as S
    from vampire_tpu.core import geometry as G
    rng = np.random.RandomState(13)
    Z, Y, X, K = 5, 8, 8, 4
    C = 1 + K + 3
    Rays, Sn = 320, 16
    vol = rng.randn(Z, Y, X, C).astype(np.float32)
    delta = jnp.asarray(rng.uniform(0.3, 1.2, (Rays, Sn)).astype(np.float32))
    mids = jnp.linspace(2.0, 70.4, Sn)

    coords = jnp.asarray(rng.uniform(-1.4, 1.4, (Rays, Sn, 3))
                         .astype(np.float32))
    valid_any = G.inrange_mask(coords).astype(jnp.float32)

    # prefix-style validity; half the rays exit early (L <= 4 <= prefix*chunk)
    L = np.where(rng.rand(Rays) < 0.5, rng.randint(0, 5, Rays),
                 rng.randint(8, Sn + 1, Rays))
    prefix_coords = np.asarray(coords).copy()
    for r in range(Rays):
        prefix_coords[r, L[r]:, :] = 1.9
        prefix_coords[r, :L[r], :] = np.clip(prefix_coords[r, :L[r], :],
                                             -0.95, 0.95)
    prefix_coords = jnp.asarray(prefix_coords)
    prefix_valid = G.inrange_mask(prefix_coords).astype(jnp.float32)
    frac_long = float((L > 4).mean())

    dens = lambda x: R.laplace_density(x, 0.2, -1.0)
    for cc, vv, fracs, tag in (
            (coords, valid_any, (1.0, 1.0, 1.0), 'full-caps'),
            (prefix_coords, prefix_valid, (1.0, 1.0, 1.0), 'full-caps-prefix'),
            # caps cover every non-exited ray (+margin); exited tail = fog
            (prefix_coords, prefix_valid,
             (min(1.0, frac_long + 0.1),) * 3, 'fog-tail'),
    ):
        want = R.sample_and_composite_rays(
            jnp.asarray(S.build_neighborhood_table(jnp.asarray(vol))),
            (Z, Y, X), K, cc, vv, delta, mids, dens, 70.4, chunk_rays=64)
        got = R.sample_and_composite_rays_earlyterm(
            jnp.asarray(S.build_neighborhood_table(jnp.asarray(vol))),
            (Z, Y, X), K, cc, vv, delta, mids, dens, 70.4,
            chunk=4, prefix=1, caps_fracs=fracs)
        for a, b in zip(want, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=3e-5, atol=3e-5, err_msg=tag)

    # (c) saturating field: big positive channel-0 -> laplace density ~ 1/beta
    vol_sat = vol.copy()
    vol_sat[..., 0] = -3.0   # sdf - bias << 0 -> density ~ alpha = 5
    table_s = jnp.asarray(S.build_neighborhood_table(jnp.asarray(vol_sat)))
    tau = 7.0
    want = R.sample_and_composite_rays(
        table_s, (Z, Y, X), K, prefix_coords, prefix_valid, delta, mids,
        dens, 70.4, chunk_rays=64)
    got = R.sample_and_composite_rays_earlyterm(
        table_s, (Z, Y, X), K, prefix_coords, prefix_valid, delta, mids,
        dens, 70.4, chunk=4, prefix=1, caps_fracs=(0.5, 0.25, 0.1),
        tau=tau, return_diag=True)
    diag = int(got[3])
    assert diag == 0, diag   # every dropped ray was saturated or exited
    scale = np.abs(vol_sat).max() * 8 + 70.4
    for a, b in zip(want, got[:3]):
        err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
        assert err <= np.exp(-tau) * scale, (err, np.exp(-tau) * scale)


def test_flagship_ray_et_caps_cover_scene_family():
    """The documented OPT-IN early-termination cap schedule (configs.py
    ray_et_fracs comment; default is off — measured 54 ms/frame slower on
    TPU, scripts/perf_r3_variants.py) covers the worst-case demand of the
    scripts/ray_et_study.py scene family: at every post-sort pass, the
    fraction of rays still active (in-field) AND unsaturated (carried
    optical depth < tau) must fit under the cap — so every ray the schedule
    drops carries the exp(-tau) error bound. Uses one rig seed x 4 scenes
    (the full study sweeps 3 rigs)."""
    import dataclasses
    import sys
    sys.path.insert(0, '/root/repo/scripts')
    from ray_et_study import build_scene
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.core import geometry as G
    from vampire_tpu.data.synthetic import camera_rig

    cfg = flagship_config()
    c = dataclasses.replace(
        cfg.backbone, ray_et_fracs=(0.71, 0.47, 0.37, 0.14, 0.06, 0.03))
    frustum = jnp.asarray(G.make_frustum(c.final_dim, c.downsample_factor,
                                         c.d_bound))
    Sn = frustum.shape[0] - 1
    chunk, prefix, tau = c.ray_et_chunk, c.ray_et_prefix, c.ray_et_tau
    n_et = -(-Sn // chunk) - prefix
    assert len(c.ray_et_fracs) == n_et

    rig = camera_rig(1, 6, c.final_dim, seed=0)
    geom = np.asarray(G.get_geometry(
        frustum, jnp.asarray(rig['sensor2ego']), jnp.asarray(rig['intrin']),
        jnp.asarray(rig['ida']), jnp.asarray(rig['bda'])))[0]
    Z, Y, X = c.grid_zyx('seg')
    norm = np.stack([
        (geom[..., 0] - c.x_bound_seg[0]) / (c.x_bound_seg[1] - c.x_bound_seg[0]) * 2 - 1,
        (geom[..., 1] - c.y_bound_seg[0]) / (c.y_bound_seg[1] - c.y_bound_seg[0]) * 2 - 1,
        (geom[..., 2] - c.z_bound_seg[0]) / (c.z_bound_seg[1] - c.z_bound_seg[0]) * 2 - 1,
    ], axis=-1)[:, :-1][:, :, ::2, ::2]
    delta = np.linalg.norm(geom[:, 1:] - geom[:, :-1], axis=-1)[:, :, ::2, ::2]
    coords = np.moveaxis(norm, 1, 3).reshape(-1, Sn, 3)
    dl = np.moveaxis(delta, 1, 3).reshape(-1, Sn)
    valid = (np.abs(coords) <= 1.0).all(-1)
    L = np.where(valid.any(1), Sn - valid[:, ::-1].argmax(1), 0)

    rng = np.random.RandomState(0)
    from vampire_tpu.core import rendering as RR
    for kind in ('open', 'suburb', 'urban', 'fog'):
        sdf = build_scene(kind, rng, Z, Y, X, c.z_bound_seg, c.y_bound_seg,
                          c.x_bound_seg)
        ix = np.clip(np.rint((coords[..., 0] + 1) / 2 * (X - 1)), 0,
                     X - 1).astype(np.int64)
        iy = np.clip(np.rint((coords[..., 1] + 1) / 2 * (Y - 1)), 0,
                     Y - 1).astype(np.int64)
        iz = np.clip(np.rint((coords[..., 2] + 1) / 2 * (Z - 1)), 0,
                     Z - 1).astype(np.int64)
        samp = sdf[iz, iy, ix] * valid
        dens = np.asarray(RR.laplace_density(jnp.asarray(samp), 0.1,
                                             c.sdf_bias))
        sd = np.cumsum(dens * dl, axis=1)
        for j in range(n_et):
            s_j = prefix * chunk + j * chunk
            demand = ((L > s_j) & (sd[:, s_j - 1] < tau)).mean()
            cap = c.ray_et_fracs[j]
            assert demand * 1.05 <= cap + 1e-9, (kind, j, demand, cap)
