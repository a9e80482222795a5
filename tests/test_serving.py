"""Serving surface: micro-batched queue correctness + TCP round-trip."""
import numpy as np
import pytest

from vampire_tpu.data.synthetic import synthetic_batch, tiny_config
from vampire_tpu.serving import (InferenceServer, ReplicaPool, TcpClient,
                                 serve_tcp)


@pytest.fixture(scope='module')
def server():
    cfg = tiny_config()
    srv = InferenceServer(cfg, max_batch=2, max_wait_ms=20,
                          with_det=True).warmup().start()
    yield srv
    srv.stop()


def _sample(cfg, seed):
    b = synthetic_batch(cfg, batch_size=1, n_points=cfg.train.max_points,
                        seed=seed, mode='val')
    return {k: np.asarray(v)[0] for k, v in b.items() if k != 'meta'}


def test_single_and_batched_requests_match(server):
    cfg = server.cfg
    s0, s1 = _sample(cfg, 1), _sample(cfg, 2)
    # sequential (each its own padded batch)
    r0 = server.infer(s0)
    # concurrent pair (should merge into one micro-batch)
    f0, f1 = server.submit(s0), server.submit(s1)
    r0b, r1 = f0.result(timeout=300), f1.result(timeout=300)
    assert server.stats['requests'] >= 3
    for k in ('occ_logits', 'pts_logits', 'depth_preds'):
        assert np.isfinite(r0[k]).all()
        # same sample -> identical output whether padded-solo or batched
        np.testing.assert_allclose(r0[k], r0b[k], rtol=2e-4, atol=2e-4)
        assert r1[k].shape == r0[k].shape
    # detection output present and finite: (boxes (M,9), scores, labels)
    boxes, scores, labels = r0['det']
    assert boxes.shape[1] == 9 and np.isfinite(boxes).all()
    assert scores.shape == labels.shape
    d = r0['depth_preds']
    lo, hi = cfg.backbone.d_bound[:2]
    assert (d >= lo - 1e-3).all() and (d <= hi + 1e-3).all()


def test_missing_input_key_raises(server):
    """A request missing a required input fails loudly (no silent synthetic
    substitution); a request without 'points' is allowed (camera-only)."""
    cfg = server.cfg
    s = _sample(cfg, 4)
    bad = {k: v for k, v in s.items() if k != 'intrin'}
    with pytest.raises(KeyError):
        server.submit(bad).result(timeout=300)
    no_pts = {k: v for k, v in s.items() if k != 'points'}
    out = server.submit(no_pts).result(timeout=300)
    assert np.isfinite(out['occ_logits']).all()


def test_stop_fails_queued_requests(server):
    """stop() resolves still-queued futures with an error instead of leaving
    infer() callers blocked forever. Reuses the module server's variables so
    the constructor skips the (never exercised) model-init compile."""
    cfg = server.cfg
    srv = InferenceServer(cfg, variables=server.variables, max_batch=1,
                          with_det=False)
    # never started: submissions sit in the queue
    fut = srv.submit({})
    srv.stop()
    with pytest.raises(RuntimeError, match='stopped'):
        fut.result(timeout=10)


def test_replica_pool_distributes(server):
    """ReplicaPool spreads requests across replicas and returns identical
    results to a single server (same weights). Replica 2 shares the first
    server's variables, so both compute the same function."""
    cfg = server.cfg
    srv2 = InferenceServer(cfg, variables=server.variables, max_batch=2,
                           max_wait_ms=20, with_det=False).warmup().start()
    try:
        pool = ReplicaPool([server, srv2])
        s = _sample(cfg, 5)
        want = server.infer(s)
        before2 = srv2.stats['requests']
        futs = [pool.submit(_sample(cfg, 5)) for _ in range(4)]
        outs = [f.result(timeout=300) for f in futs]
        for o in outs:
            np.testing.assert_allclose(o['pts_logits'], want['pts_logits'],
                                       rtol=2e-4, atol=2e-4)
        assert srv2.stats['requests'] > before2, \
            'second replica never received work'
        assert pool.stats['requests'] >= 4
    finally:
        srv2.stop()


def test_tcp_roundtrip(server):
    cfg = server.cfg
    srv = serve_tcp(server)
    try:
        host, port = srv.server_address
        cl = TcpClient(host, port)
        out = cl.infer(_sample(cfg, 3))
        assert np.isfinite(out['pts_logits']).all()
        assert out['seg_preds'].shape == (6, *cfg.backbone.final_dim)
        cl.close()
    finally:
        srv.shutdown()

def test_outputs_selection_metrics_only(server):
    """outputs='metrics' compiles a graph without the camera-render branch:
    the response carries exactly the metric outputs (occ/pts/det), values
    matching the full server's, and no render keys (whose compute XLA then
    dead-code-eliminates — the perf claim is measured on-chip in
    scripts/perf_r4_metrics_only.py; this pins the API semantics)."""
    cfg = server.cfg
    srv = InferenceServer(cfg, variables=server.variables, max_batch=1,
                          outputs='metrics').warmup().start()
    try:
        s = _sample(cfg, 6)
        want = server.infer(s)
        got = srv.infer(s)
        assert set(got) == {'occ_logits', 'occ_density', 'pts_logits', 'det'}
        for k in ('occ_logits', 'occ_density', 'pts_logits'):
            np.testing.assert_allclose(got[k], want[k], rtol=2e-4, atol=2e-4)
        boxes, scores, labels = got['det']
        assert boxes.shape[1] == 9 and np.isfinite(boxes).all()
    finally:
        srv.stop()


def test_outputs_selection_validation():
    cfg = tiny_config()
    with pytest.raises(ValueError, match='unknown output groups'):
        InferenceServer(cfg, outputs=('occ', 'nope'))


def test_outputs_selection_render_groups(server):
    """Explicit render groups expose the full render tensors (rgb/height)
    that the historical default set argmaxes away; 'det' absent from outputs
    disables decode."""
    cfg = server.cfg
    srv = InferenceServer(cfg, variables=server.variables, max_batch=1,
                          outputs=('camera_renders', 'bev_renders')
                          ).warmup().start()
    try:
        got = srv.infer(_sample(cfg, 7))
        assert set(got) == {'depth_preds', 'seg_preds', 'rgb_preds',
                            'bev_seg', 'bev_height', 'bev_rgb'}
        assert np.isfinite(got['rgb_preds']).all()
        assert got['bev_rgb'].shape[-1] == 3
    finally:
        srv.stop()
