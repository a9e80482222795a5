"""Golden tests for coordinate grids and projections vs the reference math.

The torch implementations here are small, independent re-derivations of the
formulas in `base_vampire2.py:243-388` used purely as oracles.
"""
import numpy as np
import pytest
import torch

from vampire_tpu.configs import BackboneConfig
from vampire_tpu.core import geometry as G


CFG = BackboneConfig()


def test_frustum_shape_and_values():
    fr = G.make_frustum(CFG.final_dim, CFG.downsample_factor, CFG.d_bound)
    assert fr.shape == (86, 64, 176, 4)
    # torch oracle (base_vampire2.py:253-271)
    d = torch.arange(2.0, 70.4, 0.8)
    assert fr.shape[0] == d.shape[0]
    np.testing.assert_allclose(fr[:, 0, 0, 2], d.numpy(), rtol=1e-6)
    np.testing.assert_allclose(fr[0, 0, :, 0],
                               torch.linspace(0, 703, 176).numpy(), rtol=1e-6)
    np.testing.assert_allclose(fr[0, :, 0, 1],
                               torch.linspace(0, 255, 64).numpy(), rtol=1e-6)
    assert np.all(fr[..., 3] == 1.0)


def test_camera_and_bev_mids():
    mids = G.make_camera_mids(CFG.d_bound)
    assert mids.shape == (85,)
    np.testing.assert_allclose(mids[0], 2.4, rtol=1e-6)
    np.testing.assert_allclose(mids[-1], 69.6, rtol=1e-5)
    bev = G.make_bev_mids(CFG.z_bound_det)
    assert bev.shape == (10,)
    np.testing.assert_allclose(bev[0], 2.8, rtol=1e-6)
    np.testing.assert_allclose(bev[-1], -0.8, rtol=1e-6)


def test_voxel_coords():
    vc = G.make_voxel_coords(CFG.x_bound_seg, CFG.y_bound_seg, CFG.z_bound_seg)
    assert vc.shape == (20, 256, 256, 4)
    np.testing.assert_allclose(vc[0, 0, 0], [-51.0, -51.0, -4.8, 1.0], rtol=1e-6)
    np.testing.assert_allclose(vc[-1, -1, -1], [51.0, 51.0, 2.8, 1.0], rtol=1e-6)
    oc = G.make_voxel_coords(CFG.x_bound_det, CFG.y_bound_det, CFG.z_bound_det)
    assert oc.shape == (10, 256, 256, 4)


def test_occ_coords():
    occ = G.make_occ_coords()
    assert occ.shape == (200, 200, 16, 3)
    np.testing.assert_allclose(occ[0, 0, 0], [-39.8, -39.8, -0.8], rtol=1e-6)
    np.testing.assert_allclose(occ[-1, -1, -1], [39.8, 39.8, 5.2], rtol=1e-5)


def _random_mats(b, n, seed=0):
    rng = np.random.RandomState(seed)
    def rot_t():
        # random rotation + translation, well-conditioned
        q = rng.randn(3, 3)
        u, _, vt = np.linalg.svd(q)
        r = u @ vt
        m = np.eye(4, dtype=np.float64)
        m[:3, :3] = r
        m[:3, 3] = rng.randn(3)
        return m
    s2e = np.stack([[rot_t() for _ in range(n)] for _ in range(b)]).astype(np.float32)
    intr = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr[..., 0, 0] = 1200 + 50 * rng.rand(b, n)
    intr[..., 1, 1] = 1200 + 50 * rng.rand(b, n)
    intr[..., 0, 2] = 800 + 10 * rng.rand(b, n)
    intr[..., 1, 2] = 450 + 10 * rng.rand(b, n)
    ida = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    ida[..., 0, 0] = 0.44
    ida[..., 1, 1] = 0.44
    ida[..., 0, 3] = rng.randn(b, n)
    ida[..., 1, 3] = -140 + rng.randn(b, n)
    bda = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    th = 0.1 * rng.randn(b)
    bda[:, 0, 0] = np.cos(th); bda[:, 0, 1] = -np.sin(th)
    bda[:, 1, 0] = np.sin(th); bda[:, 1, 1] = np.cos(th)
    return s2e, intr, ida, bda


def _torch_get_geometry(frustum, s2e, intr, ida, bda):
    """Oracle: base_vampire2.py:314-349."""
    frustum = torch.from_numpy(np.asarray(frustum))
    s2e, intr, ida, bda = map(torch.from_numpy, (s2e, intr, ida, bda))
    b, n = s2e.shape[:2]
    ida_m = ida.view(b, n, 1, 1, 1, 4, 4)
    points = ida_m.inverse().matmul(frustum.unsqueeze(-1))
    points = torch.cat((points[..., :2, :] * points[..., 2:3, :],
                        points[..., 2:, :]), dim=5)
    combine = s2e.matmul(torch.inverse(intr))
    points = combine.view(b, n, 1, 1, 1, 4, 4).matmul(points)
    bda_m = bda.unsqueeze(1).repeat(1, n, 1, 1).view(b, n, 1, 1, 1, 4, 4)
    points = (bda_m @ points).squeeze(-1)
    return points[..., :3].numpy()


def _torch_get_pixel(voxels, s2e, intr, ida, bda):
    """Oracle: base_vampire2.py:351-388."""
    voxels = torch.from_numpy(np.asarray(voxels))
    s2e, intr, ida, bda = map(torch.from_numpy, (s2e, intr, ida, bda))
    b, n = s2e.shape[:2]
    bda_m = bda.unsqueeze(1).repeat(1, n, 1, 1).view(b, n, 1, 1, 1, 4, 4)
    points = bda_m.inverse().matmul(voxels.unsqueeze(-1))
    combine = intr.matmul(torch.inverse(s2e))
    points = combine.view(b, n, 1, 1, 1, 4, 4).matmul(points)
    z = points[..., 2:3, :]
    points = torch.cat((points[..., :2, :] / torch.clamp(z, min=1e-6),
                        points[..., 2:, :]), dim=5)
    points = ida.view(b, n, 1, 1, 1, 4, 4).matmul(points).squeeze(-1)
    return points[..., :3].numpy()


def test_get_geometry_matches_torch():
    fr = G.make_frustum(CFG.final_dim, CFG.downsample_factor, CFG.d_bound)
    fr_small = fr[::8, ::16, ::16]  # keep the oracle fast
    s2e, intr, ida, bda = _random_mats(2, 3)
    import jax.numpy as jnp
    got = np.asarray(G.get_geometry(jnp.asarray(fr_small), s2e, intr, ida, bda))
    want = _torch_get_geometry(fr_small, s2e, intr, ida, bda)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_get_pixel_matches_torch():
    vc = G.make_voxel_coords(CFG.x_bound_seg, CFG.y_bound_seg, CFG.z_bound_seg)
    vc_small = vc[::4, ::32, ::32]
    s2e, intr, ida, bda = _random_mats(2, 3, seed=1)
    import jax.numpy as jnp
    got = np.asarray(G.get_pixel(jnp.asarray(vc_small), s2e, intr, ida, bda))
    want = _torch_get_pixel(vc_small, s2e, intr, ida, bda)
    # huge coords appear for near-plane points (clamped z); compare where sane
    sane = np.abs(want) < 1e5
    np.testing.assert_allclose(got[sane], want[sane], rtol=3e-3, atol=0.1)


def test_normalize_and_mask():
    import jax.numpy as jnp
    xyz = jnp.asarray([[0.0, 0.0, -1.0], [-51.2, -51.2, -5.0],
                       [51.2, 51.2, 3.0], [60.0, 0.0, 0.0]])
    norm = G.normalize_coords(xyz, CFG.x_bound_seg, CFG.y_bound_seg, CFG.z_bound_seg)
    np.testing.assert_allclose(np.asarray(norm[1]), [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(norm[2]), [1, 1, 1], atol=1e-6)
    mask = G.inrange_mask(norm)
    assert mask.tolist() == [True, True, True, False]
