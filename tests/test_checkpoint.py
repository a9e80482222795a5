"""Fast checkpoint-semantics tests (no model compile): the EMA sidecar is
part of the weights, and pretrained grafting is pure + shape-strict."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vampire_tpu.data.synthetic import tiny_config
from vampire_tpu.training.train_state import TrainState
from vampire_tpu.training.trainer import Trainer


def _tiny_state(seed):
    rng = np.random.RandomState(seed)
    params = {'w': jnp.asarray(rng.randn(3, 3), jnp.float32)}
    return TrainState(
        step=jnp.asarray(7, jnp.int32), params=params,
        batch_stats={'m': jnp.asarray(rng.randn(3), jnp.float32)},
        opt_state={'mu': {'w': jnp.zeros((3, 3), jnp.float32)}},
        ema_params={'w': jnp.asarray(rng.randn(3, 3), jnp.float32)})


def test_weights_only_restore_includes_ema(tmp_path):
    """-v/--use-ema must evaluate the TRAINED EMA sidecar, not the fresh
    init copy: weights_only restore brings ema_params along (the reference
    evaluates the EMA .pth, ema.py:101-117, base_cli.py:107-132)."""
    cfg = dataclasses.replace(tiny_config())
    tr = Trainer(cfg, workdir=str(tmp_path))
    trained = _tiny_state(0)
    tr.save_checkpoint(trained, epoch=0)

    fresh = _tiny_state(1)   # different params AND different ema
    got = tr.restore_checkpoint(fresh, step=0, weights_only=True)
    np.testing.assert_array_equal(np.asarray(got.params['w']),
                                  np.asarray(trained.params['w']))
    np.testing.assert_array_equal(np.asarray(got.ema_params['w']),
                                  np.asarray(trained.ema_params['w']))
    # weights only: optimizer state and step stay fresh
    assert int(got.step) == int(fresh.step)
    np.testing.assert_array_equal(np.asarray(got.opt_state['mu']['w']),
                                  np.asarray(fresh.opt_state['mu']['w']))


def test_graft_is_pure_and_shape_strict():
    from vampire_tpu.utils.torch_weights import graft_into_variables
    old_kernel = np.zeros((2, 2), np.float32)
    variables = {
        'params': {'backbone': {'img_backbone': {'k': old_kernel},
                                'other': {'x': np.ones(2)}}},
        'batch_stats': {'backbone': {'img_backbone': {'m': np.zeros(2)}}},
    }
    new = graft_into_variables(variables,
                               {'k': np.ones((2, 2), np.float64)},
                               {'m': np.ones(2)})
    # grafted in the returned tree...
    assert new['params']['backbone']['img_backbone']['k'].sum() == 4
    assert new['params']['backbone']['img_backbone']['k'].dtype == np.float32
    # ...but the caller's tree is untouched (was mutated in place before)
    assert variables['params']['backbone']['img_backbone']['k'].sum() == 0
    # sibling subtrees are shared, not copied
    assert new['params']['backbone']['other'] is \
        variables['params']['backbone']['other']
    with pytest.raises(ValueError, match='shape'):
        graft_into_variables(variables, {'k': np.ones((4, 1))},
                             {'m': np.ones(2)})
