"""Multi-PROCESS (multi-host analog) dry-run: N processes x M CPU devices.

Each process is one "host": jax.distributed.initialize over a local
coordinator, a global (dp x cam) mesh spanning all processes' devices,
per-process DataLoader-block batches assembled into logical global arrays
(parallel/distributed.make_global_batch), ONE full sharded train step of
the tiny config, and a process_allgather round-trip — the plumbing the
reference gets from torch DDP + all_gather_object
(/root/reference/src/utils/torch_dist.py:8-43, base_cli.py:105).

Worker mode (spawned by launch()):
    python scripts/dryrun_multiproc.py worker
with env JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID /
XLA_FLAGS=--xla_force_host_platform_device_count=M / JAX_PLATFORMS=cpu.

Launcher mode (spawns the workers):
    python scripts/dryrun_multiproc.py [n_processes] [devices_per_process]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker() -> None:
    import jax
    import numpy as np
    from vampire_tpu.parallel.distributed import (initialize,
                                                  make_global_batch,
                                                  process_allgather)
    initialize()
    world = jax.process_count()
    rank = jax.process_index()
    n_dev = jax.device_count()
    assert world == int(os.environ['JAX_NUM_PROCESSES']), (world, os.environ)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vampire_tpu.data.synthetic import synthetic_batch, tiny_config
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.parallel.mesh import make_mesh, batch_pspecs
    from vampire_tpu.training.train_state import (TrainState, make_optimizer)
    from vampire_tpu.training.train_step import build_train_step, split_mats

    cfg = tiny_config()
    cam = 2 if n_dev % 2 == 0 else 1
    dp = n_dev // cam
    assert dp % world == 0, (dp, world)
    mesh = make_mesh(dp=dp, cam=cam)
    repl = NamedSharding(mesh, P())
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.float32,
                    lift_vectorized=True)

    # the GLOBAL batch (same on every process), then this process's
    # contiguous dp block — exactly the DataLoader's (rank, world) layout
    gbatch = synthetic_batch(cfg, batch_size=dp,
                             n_points=cfg.train.max_points, seed=0)
    rows = dp // world
    local = {k: np.asarray(v)[rank * rows:(rank + 1) * rows]
             for k, v in gbatch.items()}
    specs = batch_pspecs(local)
    batch = make_global_batch(local, mesh, specs)
    mats = split_mats(batch)

    init_fn = jax.jit(lambda imgs, mats, pts: model.init(
        jax.random.PRNGKey(0), imgs, mats, points=pts, train=True),
        out_shardings=repl)
    variables = init_fn(batch['imgs'], mats, batch['points'])
    tx = make_optimizer(cfg.train, 100, variables['params'])

    state = jax.jit(
        lambda v: TrainState(step=jnp.zeros((), jnp.int32),
                             params=v['params'],
                             batch_stats=v['batch_stats'],
                             opt_state=tx.init(v['params']),
                             ema_params=None),
        out_shardings=repl)(variables)

    step_fn = jax.jit(build_train_step(model, cfg, tx, num_devices=n_dev))
    new_state, logs = step_fn(state, batch)
    jax.block_until_ready(logs)
    total = float(logs['total_loss'])  # replicated -> addressable everywhere
    assert np.isfinite(total), logs
    assert int(new_state.step) == 1

    # all_gather_object parity round-trip
    objs = process_allgather({'rank': rank, 'loss': total,
                              'blob': np.arange(rank + 3)})
    assert [o['rank'] for o in objs] == list(range(world)), objs
    assert all(abs(o['loss'] - total) < 1e-6 for o in objs)
    if rank == 0:
        print(f'dryrun_multiproc ok: {world} processes x '
              f'{n_dev // world} devices, mesh dp={dp} x cam={cam}, '
              f'total_loss={total:.4f}', flush=True)


def launch(n_proc: int = 2, dev_per_proc: int = 4,
           timeout: int = 1500) -> str:
    """Spawn the workers; returns rank-0 stdout (raises on failure)."""
    import socket
    import subprocess
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]
    here = os.path.abspath(__file__)
    procs = []
    for r in range(n_proc):
        env = dict(os.environ)
        env.pop('_VAMPIRE_MULTICHIP_BOOTSTRAPPED', None)
        # the axon sitecustomize (PYTHONPATH) initializes the backend at
        # interpreter start, which breaks jax.distributed.initialize
        # (measured: proc_count stays 1); workers add the repo root to
        # sys.path themselves
        env.pop('PYTHONPATH', None)
        env['JAX_PLATFORMS'] = 'cpu'
        # optimization level 0: wiring validation, not a numerics test —
        # XLA:CPU optimization passes dominate cold compile on the 1-core
        # host (2.2x measured on the 8-device dryrun; loss unchanged to 4
        # decimals, still compared against the pinned value by the caller)
        env['XLA_FLAGS'] = (
            f'--xla_force_host_platform_device_count={dev_per_proc} '
            f'--xla_backend_optimization_level=0')
        env['JAX_COORDINATOR_ADDRESS'] = f'127.0.0.1:{port}'
        env['JAX_NUM_PROCESSES'] = str(n_proc)
        env['JAX_PROCESS_ID'] = str(r)
        procs.append(subprocess.Popen(
            [sys.executable, here, 'worker'], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for r, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f'rank {r} timed out')
        outs.append((p.returncode, out, err))
    for r, (rc, out, err) in enumerate(outs):
        if rc != 0:
            raise RuntimeError(f'rank {r} failed (rc={rc}):\n{err[-4000:]}')
    return outs[0][1]


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'worker':
        worker()
    else:
        n_proc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
        dev = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        print(launch(n_proc, dev), end='')
