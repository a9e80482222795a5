"""Honest re-measure of the corner/lift table builders (r4 toolchain).

The r3 numbers (XLA 8-way concat ~26 GB/s, ~25 ms ray + ~33 ms lift per
frame) came from single-dispatch timings and in-model ablations on the r3
toolchain. This probe times K in-jit repetitions (input shifted by k to
defeat CSE, one checksum out) so the ~25-30 ms axon fetch constant
divides away.

Run (TPU): python scripts/perf_r4_tables.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

K = 8


def timed(make_fn, args, label, out_bytes):
    import jax
    import jax.numpy as jnp

    def loop(*a):
        def body(k, acc):
            shifted = tuple(x + jnp.asarray(k, x.dtype) for x in a)
            out = make_fn(*shifted)
            return acc + out.astype(jnp.float32)[0, 0, 0, :2].sum() \
                + out.astype(jnp.float32)[-1, -1, -1, -2:].sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    f = jax.jit(loop)
    f0 = jax.jit(lambda *a: a[0].astype(jnp.float32).ravel()[0])
    float(f0(*args))
    ts0 = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f0(*args))
        ts0.append(time.perf_counter() - t0)
    fetch = min(ts0)
    float(f(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - fetch) / K
    print(f'  {label:22s}: {per*1e3:7.2f} ms  '
          f'({out_bytes/per/1e9:6.1f} GB/s out)', flush=True)
    return per


def main():
    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.ops import pallas_tables as PT

    # ray/points corner table at flagship shape
    D, H, W, C = 20, 256, 256, 22
    vol = jax.random.normal(jax.random.PRNGKey(0), (D, H, W, C),
                            jnp.float32).astype(jnp.bfloat16)
    out_bytes = (D + 1) * (H + 1) * (W + 1) * 8 * C * 2
    print(f'corner table {vol.shape} -> {out_bytes/1e6:.0f} MB', flush=True)
    timed(PT._corner_table_xla, (vol,), 'xla 8-way', out_bytes)
    timed(PT._corner_table_xla_pairwise, (vol,), 'xla pairwise', out_bytes)
    timed(PT._corner_table_conv, (vol,), 'one-hot MXU conv', out_bytes)
    try:
        timed(PT._corner_table_pallas, (vol,), 'pallas stream', out_bytes)
    except Exception as e:
        print(f'  pallas stream: FAILED {type(e).__name__}', flush=True)

    # lift table at flagship per-camera shape (86 depth bins, 64x176, C=16)
    Dd, Hh, Ww, Cf = 86, 64, 176, 16
    depth = jax.random.normal(jax.random.PRNGKey(1), (Dd, Hh, Ww),
                              jnp.float32)
    feat = jax.random.normal(jax.random.PRNGKey(2), (Hh, Ww, Cf),
                             jnp.float32).astype(jnp.bfloat16)
    ob = (Dd + 1) * (Hh + 1) * (Ww + 1) * (8 + 4 * Cf) * 2
    print(f'lift table d{depth.shape} f{feat.shape} -> {ob/1e6:.0f} MB '
          f'(x6 cams/frame)', flush=True)

    def lift_xla(d, f):
        return PT._lift_table_xla(d, f)

    def lift_pair(d, f):
        return PT._lift_table_xla_pairwise(d, f)

    timed(lift_xla, (depth, feat), 'xla 8-way', ob)
    timed(lift_pair, (depth, feat), 'xla pairwise', ob)
    timed(PT._lift_table_conv, (depth, feat), 'one-hot MXU conv', ob)
    try:
        timed(PT._lift_table_pallas, (depth, feat), 'pallas stream', ob)
    except Exception as e:
        print(f'  pallas stream: FAILED {type(e).__name__}', flush=True)


if __name__ == '__main__':
    main()
