"""Multi-host (multi-process) distributed runtime.

TPU-native replacement for the reference's torch.distributed plumbing
(`/root/reference/src/utils/torch_dist.py:8-43`, `base_cli.py:105`): JAX's
single-controller-per-process SPMD model replaces init_process_group; the
cross-host gradient all-reduce is inserted by XLA from the sharded autodiff
(DCN for the cross-host hop, ICI within a host), and the eval-results
gather (`torch_dist.all_gather_object`, base_exp.py:920-927) becomes
`multihost_utils.process_allgather`.

Usage:
  * each process calls `initialize()` first (env-driven on TPU pods, where
    jax.distributed.initialize() autodetects; explicit coordinator/rank for
    CPU clusters and tests);
  * build ONE global mesh over jax.devices() (all processes); jax.devices()
    orders devices by process, so the 'dp' axis tiles process-locally and
    batch shards stay host-local;
  * per-process DataLoaders carry (rank, world_size) and the same seed; the
    local batches assemble into logical global arrays with
    `make_global_batch`.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize, idempotent and env-overridable.

    On TPU pods all three args autodetect. For CPU multi-process runs (tests,
    local bring-up) pass them explicitly or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    # must not touch the backend (jax.devices/process_count) before
    # jax.distributed.initialize — it would initialize XLA single-process
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        'JAX_COORDINATOR_ADDRESS')
    if num_processes is None and 'JAX_NUM_PROCESSES' in os.environ:
        num_processes = int(os.environ['JAX_NUM_PROCESSES'])
    if process_id is None and 'JAX_PROCESS_ID' in os.environ:
        process_id = int(os.environ['JAX_PROCESS_ID'])
    if coordinator_address is None and num_processes is None:
        # single-process (or TPU-pod autodetect unavailable): no-op
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_batch(batch: Dict[str, Any], mesh, specs: Dict[str, Any]
                      ) -> Dict[str, Any]:
    """Assemble per-process local batches into logical global jax.Arrays.

    batch: this process's rows (the loader's (rank, world) block layout —
    data/nuscenes.py DataLoader). Under a single process this reduces to a
    plain sharded device_put.
    """
    from jax.sharding import NamedSharding
    out = {}
    for k, v in batch.items():
        sh = NamedSharding(mesh, specs[k])
        arr = np.asarray(v)
        if jax.process_count() == 1:
            out[k] = jax.device_put(arr, sh)
        else:
            out[k] = jax.make_array_from_process_local_data(sh, arr)
    return out


def process_allgather(obj: Any) -> list:
    """`torch_dist.all_gather_object` (torch_dist.py:30-43): gather an
    arbitrary picklable object from every process; every process receives
    the per-process list. Two-phase (sizes, then padded bytes) because the
    underlying array allgather needs uniform shapes."""
    if jax.process_count() == 1:
        return [obj]
    import pickle
    from jax.experimental import multihost_utils
    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.array([buf.size], np.int64))).reshape(-1)
    m = int(sizes.max())
    padded = np.zeros(m, np.uint8)
    padded[:buf.size] = buf
    bufs = np.asarray(multihost_utils.process_allgather(padded))
    bufs = bufs.reshape(jax.process_count(), m)
    return [pickle.loads(bufs[p, :int(sizes[p])].tobytes())
            for p in range(jax.process_count())]


def host_local_rows(tree: Any, mesh) -> Any:
    """Fetch the HOST-LOCAL rows of batch-sharded ('dp'-leading) global
    arrays — each process gets exactly the rows its DataLoader produced
    (the (rank, world) block layout). Single-process: plain device_get."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    specs = jax.tree.map(lambda _: P('dp'), tree)
    return jax.device_get(multihost_utils.global_array_to_host_local_array(
        tree, mesh, specs))


def is_main_process() -> bool:
    return jax.process_index() == 0
