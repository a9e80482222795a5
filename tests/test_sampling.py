"""Golden tests: trilinear sampling vs torch.nn.functional.grid_sample."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vampire_tpu.core import sampling as S


def _rand_vol(d, h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(d, h, w, c).astype(np.float32)


def _rand_coords(n, seed=1, lo=-1.4, hi=1.4):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, 3) * (hi - lo) + lo).astype(np.float32)


@pytest.mark.parametrize('align_corners', [True, False])
@pytest.mark.parametrize('padding', ['zeros', 'border'])
def test_grid_sample_3d_matches_torch(align_corners, padding):
    vol = _rand_vol(7, 9, 11, 5)
    coords = _rand_coords(257)
    got = np.asarray(S.grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords),
                                      align_corners=align_corners,
                                      padding_mode=padding))
    # torch: input (N, C, D, H, W), grid (N, Do, Ho, Wo, 3) with (x, y, z)
    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
    t_grid = torch.from_numpy(coords)[None, :, None, None, :]
    want = F.grid_sample(t_vol, t_grid, mode='bilinear', padding_mode=padding,
                         align_corners=align_corners)
    want = want[0, :, :, 0, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_exact_corner_values():
    vol = _rand_vol(4, 4, 4, 2)
    # align_corners=True: (-1,-1,-1) hits voxel [0,0,0]; (1,1,1) hits [-1,-1,-1]
    coords = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    got = np.asarray(S.grid_sample_3d(jnp.asarray(vol), coords, True, 'zeros'))
    np.testing.assert_allclose(got[0], vol[0, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(got[1], vol[-1, -1, -1], rtol=1e-6)


def test_batched_grid_sample():
    vols = np.stack([_rand_vol(5, 6, 7, 3, seed=i) for i in range(2)])
    coords = np.stack([_rand_coords(33, seed=i + 5) for i in range(2)])
    got = np.asarray(S.batched_grid_sample_3d(jnp.asarray(vols),
                                              jnp.asarray(coords), True, 'zeros'))
    for b in range(2):
        single = np.asarray(S.grid_sample_3d(jnp.asarray(vols[b]),
                                             jnp.asarray(coords[b]), True, 'zeros'))
        np.testing.assert_allclose(got[b], single, rtol=1e-6)


def test_sample_outer_product_matches_materialized():
    """Fused lifting == grid_sample of the materialized depth⊗feat volume."""
    rng = np.random.RandomState(7)
    D, H, W, C = 6, 8, 10, 4
    depth = rng.rand(D, H, W).astype(np.float32)
    feat = rng.randn(H, W, C).astype(np.float32)
    coords = _rand_coords(301, seed=9)

    got = np.asarray(S.sample_outer_product(jnp.asarray(depth), jnp.asarray(feat),
                                            jnp.asarray(coords),
                                            align_corners=False))
    # materialized oracle via torch grid_sample (align_corners=False, zeros),
    # exactly how the reference samples img_feats_with_depth
    # (base_vampire2.py:553,507)
    vol = depth[None, :, :, :] * feat.transpose(2, 0, 1)[:, None, :, :]  # C,D,H,W
    t_vol = torch.from_numpy(vol)[None]
    t_grid = torch.from_numpy(coords)[None, :, None, None, :]
    want = F.grid_sample(t_vol, t_grid, mode='bilinear', padding_mode='zeros',
                         align_corners=False)[0, :, :, 0, 0].permute(1, 0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_linear_matches_torch_bilinear():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 16, 44, 3).astype(np.float32)  # NHWC
    got = np.asarray(S.resize_linear(jnp.asarray(x), (64, 176), (1, 2)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(t, scale_factor=4, mode='bilinear',
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_linear_downscale_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(1, 32, 32, 2).astype(np.float32)
    got = np.asarray(S.resize_linear(jnp.asarray(x), (16, 16), (1, 2)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = torch.nn.UpsamplingBilinear2d(scale_factor=0.5)(t)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_resize_linear_trilinear_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 5, 8, 8, 2).astype(np.float32)  # NDHWC
    got = np.asarray(S.resize_linear(jnp.asarray(x), (10, 16, 16), (1, 2, 3)))
    t = torch.from_numpy(x).permute(0, 4, 1, 2, 3)
    want = F.interpolate(t, size=(10, 16, 16), mode='trilinear',
                         align_corners=True).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_matrices_match_grid_sample():
    """Separable static-grid sampling == trilinear gather (both paddings)."""
    rng = np.random.RandomState(11)
    Zs, Ys, Xs, C = 6, 9, 10, 4
    vol = rng.randn(1, Zs, Ys, Xs, C).astype(np.float32)
    # static per-axis normalized coords, some out of range
    zc = np.linspace(-1.3, 1.2, 5)
    yc = np.linspace(-0.9, 0.95, 7)
    xc = np.linspace(-1.0, 1.1, 8)
    zz, yy, xx = np.meshgrid(zc, yc, xc, indexing='ij')
    coords = np.stack([xx, yy, zz], -1).astype(np.float32)  # (5,7,8,3) xyz
    for padding in ('zeros', 'border'):
        mats = (S.make_sample_matrix(zc, Zs, True, padding),
                S.make_sample_matrix(yc, Ys, True, padding),
                S.make_sample_matrix(xc, Xs, True, padding))
        got = np.asarray(S.apply_sample_matrices(jnp.asarray(vol), mats,
                                                 (1, 2, 3)))[0]
        want = np.asarray(S.grid_sample_3d(jnp.asarray(vol[0]),
                                           jnp.asarray(coords),
                                           align_corners=True,
                                           padding_mode=padding))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_fused_matches_reference():
    """One-gather fused sampler == 8-corner sampler, both paddings."""
    rng = np.random.RandomState(13)
    vol = rng.randn(6, 9, 11, 5).astype(np.float32)
    coords = _rand_coords(1000, seed=14)
    for padding in ('zeros', 'border'):
        for ac in (True, False):
            want = np.asarray(S.grid_sample_3d(jnp.asarray(vol),
                                               jnp.asarray(coords), ac, padding))
            got = np.asarray(S.grid_sample_3d_fused(jnp.asarray(vol),
                                                    jnp.asarray(coords), ac,
                                                    padding, chunk=256))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_padded_table_sampling_bit_exact():
    """Lane-alignment channel padding (BackboneConfig.table_pad_channels):
    sampling through a zero-channel-padded corner table is BIT-identical to
    the unpadded table — the pad contributes exactly 0 to the fp32 weighted
    sum and is sliced off."""
    from vampire_tpu.core import rendering as R
    rng = np.random.RandomState(21)
    vol = rng.randn(5, 9, 11, 22).astype(np.float32)
    vol_p = np.concatenate(
        [vol, np.zeros((5, 9, 11, 10), np.float32)], axis=-1)
    tab = S.build_neighborhood_table(jnp.asarray(vol))
    tab_p = S.build_neighborhood_table(jnp.asarray(vol_p))

    coords = _rand_coords(700, seed=22)
    want = np.asarray(S.grid_sample_3d_fused(
        jnp.asarray(vol), jnp.asarray(coords), True, 'zeros', chunk=256,
        table=tab))
    got = np.asarray(S.grid_sample_3d_fused(
        jnp.asarray(vol), jnp.asarray(coords), True, 'zeros', chunk=256,
        table=tab_p))
    np.testing.assert_array_equal(got, want)

    # ray sampler: same bit-exactness through compositing
    Rr, Sn, K = 64, 7, 18
    cc = jnp.asarray(_rand_coords(Rr * Sn, seed=23).reshape(Rr, Sn, 3))
    valid = jnp.asarray((rng.rand(Rr, Sn) > 0.2).astype(np.float32))
    dl = jnp.asarray(rng.rand(Rr, Sn).astype(np.float32) + 0.5)
    mids = jnp.asarray(np.linspace(2.0, 70.0, Sn).astype(np.float32))
    dens = lambda x: jax.nn.sigmoid(x)
    a = R.sample_and_composite_rays(tab, (5, 9, 11), K, cc, valid, dl,
                                    mids, dens, 70.4, chunk_rays=32)
    b = R.sample_and_composite_rays(tab_p, (5, 9, 11), K, cc, valid, dl,
                                    mids, dens, 70.4, chunk_rays=32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_sample_outer_product_fused_matches():
    rng = np.random.RandomState(15)
    D, H, W, C = 7, 8, 10, 4
    depth = rng.rand(D, H, W).astype(np.float32)
    feat = rng.randn(H, W, C).astype(np.float32)
    coords = _rand_coords(777, seed=16)
    want = np.asarray(S.sample_outer_product(jnp.asarray(depth),
                                             jnp.asarray(feat),
                                             jnp.asarray(coords), False))
    got = np.asarray(S.sample_outer_product_fused(jnp.asarray(depth),
                                                  jnp.asarray(feat),
                                                  jnp.asarray(coords), False,
                                                  chunk=128))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sample_outer_product_pixtab_matches():
    """Pixel-keyed lift table sampler == reference outer-product sampler
    (round-5 VMEM-table path, field.py lift_sampler='pixtab')."""
    rng = np.random.RandomState(21)
    D, H, W, C = 7, 8, 10, 4
    depth = rng.rand(D, H, W).astype(np.float32)
    feat = rng.randn(H, W, C).astype(np.float32)
    coords = _rand_coords(777, seed=22)
    want = np.asarray(S.sample_outer_product(jnp.asarray(depth),
                                             jnp.asarray(feat),
                                             jnp.asarray(coords), False))
    got = np.asarray(S.sample_outer_product_pixtab(jnp.asarray(depth),
                                                   jnp.asarray(feat),
                                                   jnp.asarray(coords), False,
                                                   chunk=128))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sorted_segment_rows_matches_scatter_add():
    """sorted_segment_rows (scatter-free transpose-of-gather) == scatter-add,
    including rows with no queries, duplicate-heavy rows, and the chunked
    (carried-cumsum) variant."""
    rng = np.random.RandomState(7)
    P, R, C = 4096, 300, 11
    rows = rng.randint(0, R, P).astype(np.int32)
    rows[:50] = 42          # heavy duplication on one row
    payload = rng.randn(P, C).astype(np.float32)
    want = np.zeros((R, C), np.float32)
    np.add.at(want, rows, payload)
    for nc in (1, 4, 8):
        got = np.asarray(S.sorted_segment_rows(jnp.asarray(rows),
                                               jnp.asarray(payload), R,
                                               num_chunks=nc))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4,
                                   err_msg=f'num_chunks={nc}')
    # single-row edge case: everything lands on row 0
    rows0 = np.zeros(64, np.int32)
    pay0 = rng.randn(64, 3).astype(np.float32)
    got0 = np.asarray(S.sorted_segment_rows(jnp.asarray(rows0),
                                            jnp.asarray(pay0), 5,
                                            num_chunks=4))
    want0 = np.zeros((5, 3), np.float32)
    want0[0] = pay0.sum(0)
    np.testing.assert_allclose(got0, want0, rtol=1e-4, atol=1e-4)


def test_sorted_segment_rows_nondivisible_chunks():
    """P not divisible by num_chunks pads instead of silently falling back
    to the full-materialization path."""
    rng = np.random.RandomState(12)
    P, R, C = 1000, 50, 4          # 1000 % 8 != 0
    rows = rng.randint(0, R, P).astype(np.int32)
    payload = rng.randn(P, C).astype(np.float32)
    want = np.zeros((R, C), np.float32)
    np.add.at(want, rows, payload)
    got = np.asarray(S.sorted_segment_rows(jnp.asarray(rows),
                                           jnp.asarray(payload), R,
                                           num_chunks=8))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
