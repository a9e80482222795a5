"""K-rep in-jit timing: true device ms, immune to the axon dispatch floor.

Every dispatch through the axon tunnel pays a ~25-30 ms wall-clock floor
(fetch roundtrip serialized on the host thread, ROUND5.md §1), so any
single-dispatch stage timing near or below ~35 ms is floor-bound. This
helper runs the graph K times inside ONE jit via `lax.scan` — with a
per-iteration index `i` the caller MUST use to perturb inputs (otherwise
XLA hoists loop-invariant subgraphs out of the scan and the measurement
collapses) — and reports (T(k2) - T(k1)) / (k2 - k1): the dispatch/fetch
constants cancel exactly.

Usage:
    def probe(i, imgs, mats):          # returns a SCALAR checksum
        out = fwd(imgs + 1e-3 * i, perturb_mats(mats, i))
        return jnp.sum(out)
    ms = krep_ms(probe, (imgs, mats))
"""
import time

import numpy as np


def _sync(x):
    np.asarray(x)


def krep_ms(probe, args, k1=1, k2=5, iters=5, verbose=False):
    """True device milliseconds of one `probe(i, *args)` evaluation.

    probe: fn(i, *args) -> scalar (fp32). `i` is the traced scan index; the
      probe must fold it into its inputs so nothing is loop-invariant.
    args: tuple of device/host arrays passed through unchanged.
    k1/k2: the two repetition counts differenced (k2 > k1 >= 1).
    iters: min-of-N synced dispatches per K.
    """
    import jax
    import jax.numpy as jnp

    def make(k):
        @jax.jit
        def g(*a):
            def body(carry, i):
                return carry + probe(i, *a), None
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(k, dtype=jnp.int32))
            return out
        return g

    times = {}
    for k in (k1, k2):
        g = make(k)
        _sync(g(*args))                      # compile
        _sync(g(*args))                      # warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _sync(g(*args))
            ts.append(time.perf_counter() - t0)
        times[k] = min(ts)
        if verbose:
            print(f'  [krep] k={k}: {1e3 * times[k]:.2f} ms wall')
    return 1e3 * (times[k2] - times[k1]) / (k2 - k1)
