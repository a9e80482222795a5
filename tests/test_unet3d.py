"""Unet3D formulation tests: native conv3d vs torch oracle, and the
z-in-channels banded-2D-conv layout vs native (exact conv3d semantics)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vampire_tpu.models.unet3d import Conv3d, Unet3D


def _run_conv(stride, z_channels, x, k, b=None):
    mod = Conv3d(features=k.shape[-1], stride=stride, use_bias=b is not None)
    variables = {'params': ({'kernel': jnp.asarray(k)} if b is None else
                            {'kernel': jnp.asarray(k),
                             'bias': jnp.asarray(b)})}
    if z_channels:
        B, Z, Y, X, C = x.shape
        xz = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1, 4)).reshape(
            B, Y, X, Z * C)
        y = mod.apply(variables, xz, Z)
        zo = (Z - 1) // stride + 1
        y = y.reshape(y.shape[0], y.shape[1], y.shape[2], zo, k.shape[-1])
        return np.asarray(jnp.transpose(y, (0, 3, 1, 2, 4)))
    return np.asarray(mod.apply(variables, jnp.asarray(x)))


def test_conv3d_matches_torch_both_modes():
    rng = np.random.RandomState(0)
    B, Z, Y, X, Cin, Cout = 2, 7, 10, 12, 5, 6
    x = rng.randn(B, Z, Y, X, Cin).astype(np.float32)
    k = (rng.randn(3, 3, 3, Cin, Cout) * 0.2).astype(np.float32)
    b = rng.randn(Cout).astype(np.float32)
    for stride in (1, 2):
        want = F.conv3d(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                        torch.from_numpy(k).permute(4, 3, 0, 1, 2),
                        bias=torch.from_numpy(b), stride=stride, padding=1)
        want = want.permute(0, 2, 3, 4, 1).numpy()
        got_native = _run_conv(stride, False, x, k, b)
        got_zc = _run_conv(stride, True, x, k, b)
        np.testing.assert_allclose(got_native, want, rtol=1e-4, atol=1e-4,
                                   err_msg=f'native stride={stride}')
        np.testing.assert_allclose(got_zc, want, rtol=1e-4, atol=1e-4,
                                   err_msg=f'zchannels stride={stride}')


def test_unet3d_zchannels_matches_native():
    """Whole-net equivalence: same params, both layouts (fp32)."""
    rng = np.random.RandomState(1)
    B, Z, Y, X, C = 1, 5, 16, 16, 4
    x = jnp.asarray(rng.randn(B, Z, Y, X, C + 3).astype(np.float32))
    net_n = Unet3D(C, z_channels=False)
    net_z = Unet3D(C, z_channels=True)
    v = net_n.init(jax.random.PRNGKey(0), x)
    out_n = np.asarray(net_n.apply(v, x))
    out_z = np.asarray(net_z.apply(v, x))
    assert out_n.shape == (B, Z, Y, X, C)
    np.testing.assert_allclose(out_z, out_n, rtol=2e-4, atol=2e-4)
    # gradients agree too (the layout must be transparent to training)
    g_n = jax.grad(lambda vv: jnp.sum(net_n.apply(vv, x) ** 2))(v)
    g_z = jax.grad(lambda vv: jnp.sum(net_z.apply(vv, x) ** 2))(v)
    for a, b in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_z)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-3)
