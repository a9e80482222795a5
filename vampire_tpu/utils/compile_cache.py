"""Persistent XLA compilation cache.

The reference has no equivalent (torch eager doesn't compile); on TPU the
flagship train step costs 300-800s to jit, so every entry point that compiles
big graphs (Trainer, bench, CLI) enables the on-disk cache. Warm restarts then
deserialize the executable in seconds instead of recompiling.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.environ.get(
    'VAMPIRE_TPU_COMPILE_CACHE', os.path.expanduser('~/.cache/vampire_tpu_xla'))


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> str:
    """Idempotently point JAX's persistent compilation cache at cache_dir.

    No-op on the CPU backend: XLA:CPU persists AOT executables stamped with
    the *compile-time* feature tuning (+prefer-no-gather etc.); reloading them
    trips cpu_aot_loader feature-mismatch errors and has been observed to wedge
    collective rendezvous threads (16-device dryrun: 9/16 threads arrive, Gloo
    init DEADLINE_EXCEEDED). TPU executables round-trip cleanly.
    """
    import jax
    if jax.devices()[0].platform == 'cpu':
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache everything that takes noticeable time, not just >1s graphs
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception as e:  # older jax: fall back silently
        print(f'compilation cache unavailable: {e}')
    return cache_dir
