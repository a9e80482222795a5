"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from vampire_tpu.data.synthetic import synthetic_batch, tiny_config
from vampire_tpu.models.vampire import Vampire
from vampire_tpu.parallel.mesh import make_mesh, batch_pspecs
from vampire_tpu.training.train_state import create_train_state
from vampire_tpu.training.train_step import build_train_step, split_mats


def test_mesh_construction():
    mesh = make_mesh(dp=4, cam=2)
    assert mesh.shape == {'dp': 4, 'cam': 2}


def test_dryrun_multichip_entrypoint():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_vectorized_lift_matches_loop():
    """Camera-sharded (vectorized) lift must equal the loop lift exactly."""
    cfg = tiny_config()
    batch = synthetic_batch(cfg, batch_size=1, n_points=64, seed=3)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)
    m_loop = Vampire(cfg.backbone, cfg.head, dtype=jnp.float32,
                     lift_vectorized=False)
    m_vec = Vampire(cfg.backbone, cfg.head, dtype=jnp.float32,
                    lift_vectorized=True)
    variables = jax.jit(lambda: m_loop.init(
        jax.random.PRNGKey(1), batch['imgs'], mats, points=batch['points'],
        train=False))()
    fo1, _ = jax.jit(lambda v: m_loop.apply(
        v, batch['imgs'], mats, points=batch['points'], train=False))(variables)
    fo2, _ = jax.jit(lambda v: m_vec.apply(
        v, batch['imgs'], mats, points=batch['points'], train=False))(variables)
    for k in ('bev_feature', 'occ_logits', 'depth_preds'):
        np.testing.assert_allclose(np.asarray(fo1[k]), np.asarray(fo2[k]),
                                   rtol=1e-5, atol=1e-5)
