"""Persistent-process inference serving: warm model, micro-batched queue.

The reference has no serving story (research eval scripts only); this is the
production-deployment surface of the TPU rebuild: one process owns the chip,
compiles the flagship forward ONCE at startup (persistent XLA cache makes
warm restarts take seconds), and a dispatcher thread drains a request queue
into fixed-size micro-batches — static shapes mean exactly one compiled
program regardless of arrival pattern; partial batches are padded by
repeating the last sample and the padding rows are dropped on the way out
(the same static-shape discipline as data/nuscenes.py's loader tail).

Two front-ends:
  * in-process: `InferenceServer.submit(sample) -> Future` (thread-safe) or
    the synchronous `infer(sample)`;
  * TCP: `serve_tcp(server, port)` — length-prefixed pickles, stdlib-only
    (`TcpClient` is the matching client).
"""
from __future__ import annotations

import pickle
import queue
import socket
import socketserver
import struct
import threading
from concurrent.futures import Future
from typing import Any, Dict, Optional, Sequence

import numpy as np


class InferenceServer:
    """Micro-batching inference engine for the flagship multi-task model.

    Args:
      cfg: VampireConfig.
      variables: flax variables dict; None initializes fresh (random) params
        — useful for load tests; production passes restored checkpoint
        params (see Trainer.restore_checkpoint).
      max_batch: micro-batch size (the ONE compiled batch shape).
      max_wait_ms: dispatcher linger: how long to wait for more requests
        before running a partial (padded) batch.
      with_det: also decode detection boxes (device decode; host NMS).
      outputs: which output groups the compiled graph computes — any subset
        of OUTPUT_GROUPS ('occ', 'lidarseg', 'det', 'camera_renders',
        'bev_renders'), or the string 'metrics' = ('occ','lidarseg','det').
        Because the graph is jitted, XLA dead-code-eliminates every branch
        whose outputs are not requested — dropping 'camera_renders' removes
        the per-camera ray gather + compositing + upsample, the single
        largest line of the frame (~60 ms; the metrics consume only
        occ/pts/det, reference base_exp.py:634-677). Default None keeps the
        full historical output set.
    """

    OUTPUT_GROUPS = ('occ', 'lidarseg', 'det', 'camera_renders',
                     'bev_renders')

    def __init__(self, cfg, variables=None, dtype=None, max_batch: int = 1,
                 max_wait_ms: float = 5.0, with_det: bool = True,
                 seed: int = 0, outputs=None):
        import jax
        import jax.numpy as jnp
        from ..data.synthetic import synthetic_batch
        from ..models.vampire import Vampire
        from ..models.centerpoint_head import decode_preds
        from ..training.train_step import split_mats
        from ..utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()

        self.cfg = cfg
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        if outputs == 'metrics':
            outputs = ('occ', 'lidarseg', 'det')
        if outputs is not None:
            outputs = tuple(outputs)
            bad = set(outputs) - set(self.OUTPUT_GROUPS)
            if bad:
                raise ValueError(f'unknown output groups {sorted(bad)}; '
                                 f'valid: {self.OUTPUT_GROUPS}')
            with_det = 'det' in outputs
        self.outputs = outputs
        self.with_det = with_det
        dtype = dtype or (jnp.bfloat16 if cfg.train.compute_dtype
                          == 'bfloat16' else jnp.float32)
        self.model = Vampire(cfg.backbone, cfg.head, dtype=dtype)

        ex = synthetic_batch(cfg, batch_size=max_batch,
                             n_points=cfg.train.max_points, seed=seed,
                             mode='val')
        self._example = {k: np.asarray(v) for k, v in ex.items()
                         if k != 'meta'}
        mats = split_mats(self._example)
        if variables is None:
            variables = jax.jit(lambda: self.model.init(
                jax.random.PRNGKey(seed), jnp.asarray(ex['imgs']), mats,
                points=jnp.asarray(ex['points']), train=False))()
        self.variables = variables

        head_cfg = cfg.head

        groups = self.outputs

        need_renders = groups is None or 'camera_renders' in groups

        def fwd(v, imgs, mats, points):
            fo, preds = self.model.apply(v, imgs, mats, points=points,
                                         train=False,
                                         camera_renders=need_renders)
            out = {}
            if groups is None or 'occ' in groups:
                out['occ_logits'] = fo['occ_logits']
                out['occ_density'] = fo['occ_density']
            if groups is None or 'lidarseg' in groups:
                out['pts_logits'] = fo['pts_logits']
            if groups is None or 'camera_renders' in groups:
                out['depth_preds'] = fo['depth_preds']
                out['seg_preds'] = jnp.argmax(fo['seg_logits_preds'], -1)
                if groups is not None:
                    out['rgb_preds'] = fo['rgb_preds']
            if groups is None or 'bev_renders' in groups:
                out['bev_seg'] = jnp.argmax(fo['bev_seg_logits_preds'], -1)
                if groups is not None:
                    out['bev_height'] = fo['bev_height_preds']
                    out['bev_rgb'] = fo['bev_rgb_preds']
            if self.with_det:
                out['det'] = decode_preds(preds, head_cfg)
            return out

        self._fwd = jax.jit(fwd)
        self._q: "queue.Queue" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        self.stats = dict(requests=0, batches=0, padded_rows=0)

    # ------------------------------------------------------------------
    def warmup(self):
        """Compile + run once (slow first time; persistent-cache fast after)."""
        from ..training.train_step import split_mats
        import jax
        ex = self._example
        out = self._fwd(self.variables, ex['imgs'], split_mats(ex),
                        ex['points'])
        jax.tree.map(np.asarray, jax.device_get(out))
        return self

    def start(self):
        self._stop.clear()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None
        # fail anything still queued so blocked infer() callers don't hang
        while True:
            try:
                _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError('InferenceServer stopped'))

    # ------------------------------------------------------------------
    def submit(self, sample: Dict[str, np.ndarray]) -> Future:
        """sample: one frame — imgs (N,H,W,3), sensor2ego/intrin/ida
        (N,4,4), bda (4,4), points (P,3) [optional num_points]. Returns a
        Future resolving to the per-frame output dict."""
        fut: Future = Future()
        self._q.put((sample, fut))
        return fut

    def infer(self, sample: Dict[str, np.ndarray]) -> Dict[str, Any]:
        return self.submit(sample).result()

    # ------------------------------------------------------------------
    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            reqs = [first]
            deadline = None if self.max_batch == 1 else \
                (self.max_wait and _now() + self.max_wait)
            while len(reqs) < self.max_batch:
                timeout = None if deadline is None else deadline - _now()
                if timeout is not None and timeout <= 0:
                    break
                try:
                    reqs.append(self._q.get(timeout=timeout or 0))
                except queue.Empty:
                    break
            try:
                self._run_batch(reqs)
            except Exception as e:  # pragma: no cover - defensive
                for _, fut in reqs:
                    if not fut.done():
                        fut.set_exception(e)

    def _run_batch(self, reqs):
        from ..training.train_step import split_mats
        import jax
        n = len(reqs)
        batch = {}
        for k in ('imgs', 'sensor2ego', 'intrin', 'ida', 'bda', 'points'):
            rows = []
            for r in reqs:
                if k in r[0]:
                    rows.append(np.asarray(r[0][k]))
                elif k == 'points':
                    # camera-only request: zero point cloud (pts_logits in
                    # the response are then meaningless padding)
                    rows.append(np.zeros_like(self._example[k][0]))
                else:
                    raise KeyError(f"request missing input '{k}'")
            rows += [rows[-1]] * (self.max_batch - n)   # pad: repeat last
            batch[k] = np.stack(rows)
        out = self._fwd(self.variables, batch['imgs'], split_mats(batch),
                        batch['points'])
        out = jax.tree.map(np.asarray, jax.device_get(out))
        self.stats['requests'] += n
        self.stats['batches'] += 1
        self.stats['padded_rows'] += self.max_batch - n
        for i, (sample, fut) in enumerate(reqs):
            res = _index_tree(out, i)
            if self.with_det:
                from ..evaluation.det_evaluator import apply_circle_nms
                res['det'] = apply_circle_nms(out['det'], self.cfg.head, i)
            fut.set_result(res)


def _index_tree(out, i):
    res = {}
    for k, v in out.items():
        if k == 'det':
            continue
        res[k] = v[i]
    return res


def _now():
    import time
    return time.monotonic()


class ReplicaPool:
    """Round-robin front-end over several InferenceServer replicas.

    The measured serving optimum on v5e is micro-batch 1 per chip: B=2 runs
    +36%/frame super-linear, root-caused in scripts/perf_r4_batch2.py — NOT
    HBM spill (temps scale exactly 2x, 3.65 GB << 16 GB) but (a) the row
    gather engine losing ~20%/row with the doubled HBM-resident table set
    (10.4 -> 12.5 ns/row in isolation) and (b) XLA switching fusion
    strategies at B=2. So throughput scales by REPLICATING chips — one
    InferenceServer per chip/process — and fanning requests out. The pool
    exposes the same submit/infer surface as a single server, so
    `serve_tcp(ReplicaPool([...]))` works unchanged.
    """

    def __init__(self, servers: Sequence[InferenceServer]):
        assert servers, 'need at least one replica'
        self._servers = list(servers)
        self._rr = 0
        self._lock = threading.Lock()

    def submit(self, sample: Dict[str, np.ndarray]) -> Future:
        # round-robin, skewed toward the emptiest queue when loads diverge
        with self._lock:
            best = min(range(len(self._servers)),
                       key=lambda i: (self._servers[i]._q.qsize(),
                                      (i - self._rr) % len(self._servers)))
            self._rr = (best + 1) % len(self._servers)
        return self._servers[best].submit(sample)

    def infer(self, sample: Dict[str, np.ndarray]) -> Dict[str, Any]:
        return self.submit(sample).result()

    @property
    def stats(self):
        out: Dict[str, int] = {}
        for s in self._servers:
            for k, v in s.stats.items():
                out[k] = out.get(k, 0) + v
        return out

    def stop(self):
        for s in self._servers:
            s.stop()


# ---------------------------------------------------------------------------
# TCP front-end: length-prefixed pickles (stdlib only).
# ---------------------------------------------------------------------------

def _send_msg(sock, obj):
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack('>Q', len(data)) + data)


def _recv_msg(sock):
    hdr = _recv_exact(sock, 8)
    if hdr is None:
        return None
    (n,) = struct.unpack('>Q', hdr)
    data = _recv_exact(sock, n)
    return None if data is None else pickle.loads(data)


def _recv_exact(sock, n):
    buf = b''
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def serve_tcp(server, host: str = '127.0.0.1',
              port: int = 0):
    """Expose an InferenceServer (or ReplicaPool) over TCP; returns the ThreadingTCPServer
    (call .shutdown() to stop; .server_address for the bound port)."""

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            while True:
                msg = _recv_msg(self.request)
                if msg is None:
                    return
                try:
                    out = server.infer(msg)
                    _send_msg(self.request, dict(ok=True, result=out))
                except Exception as e:
                    _send_msg(self.request, dict(ok=False, error=repr(e)))

    srv = socketserver.ThreadingTCPServer((host, port), Handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


class TcpClient:
    def __init__(self, host: str, port: int):
        self._sock = socket.create_connection((host, port))

    def infer(self, sample: Dict[str, np.ndarray]) -> Dict[str, Any]:
        _send_msg(self._sock, sample)
        resp = _recv_msg(self._sock)
        if resp is None:
            raise ConnectionError('server closed connection')
        if not resp['ok']:
            raise RuntimeError(resp['error'])
        return resp['result']

    def close(self):
        self._sock.close()
