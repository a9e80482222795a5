"""Corner/lift gather-table builders: construction variants must be
byte-identical, and the custom VJP must match autodiff of the concat build.

(The Pallas streaming variants are TPU-only and gated off by default —
ops/pallas_tables.py _use_pallas; these tests pin the XLA paths and the
shared semantics every variant must reproduce.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from vampire_tpu.core import sampling as S
from vampire_tpu.ops import pallas_tables as PT


def test_corner_table_variants_identical():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.randn(5, 9, 7, 6).astype(np.float32))
    a = np.asarray(PT._corner_table_xla(vol))
    b = np.asarray(PT._corner_table_xla_pairwise(vol))
    assert np.array_equal(a, b)
    # one-hot MXU conv variant: fp32 accumulate of value x 1.0 is exact
    c = np.asarray(PT._corner_table_conv(vol))
    assert np.array_equal(a, c)
    # bf16 in -> bf16 out must round-trip bit-exactly through the conv too
    vb = vol.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(PT._corner_table_conv(vb)).view(np.uint16),
        np.asarray(PT._corner_table_xla(vb)).view(np.uint16))
    # and both equal the historical build_neighborhood_table row layout
    t = np.asarray(S.build_neighborhood_table(vol))
    assert np.array_equal(a.reshape(t.shape[0], 2, 2, 2, 6), t)


def test_corner_table_custom_vjp_matches_autodiff():
    rng = np.random.RandomState(1)
    vol = jnp.asarray(rng.randn(4, 6, 5, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 7, 6, 24).astype(np.float32))

    g_auto = jax.grad(lambda v: jnp.sum(PT._corner_table_xla(v) * w))(vol)
    g_custom = jax.grad(lambda v: jnp.sum(PT.corner_table(v) * w))(vol)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-6, atol=1e-6)


def test_lift_table_variants_identical_and_vjp():
    rng = np.random.RandomState(2)
    depth = jnp.asarray(rng.rand(7, 6, 9).astype(np.float32))
    feat = jnp.asarray(rng.randn(6, 9, 4).astype(np.float32))
    a = np.asarray(PT._lift_table_xla(depth, feat))
    b = np.asarray(PT._lift_table_xla_pairwise(depth, feat))
    assert np.array_equal(a, b)
    c = np.asarray(PT._lift_table_conv(depth, feat))
    assert np.array_equal(a, c)

    w = jnp.asarray(rng.randn(*a.shape).astype(np.float32))
    ga = jax.grad(lambda d, f: jnp.sum(PT._lift_table_xla(d, f) * w),
                  argnums=(0, 1))(depth, feat)
    gc = jax.grad(lambda d, f: jnp.sum(PT.lift_table(d, f) * w),
                  argnums=(0, 1))(depth, feat)
    for x, y in zip(gc, ga):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)
