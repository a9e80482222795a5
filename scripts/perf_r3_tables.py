"""Correctness + perf of the Pallas table builders vs the XLA concat path.

Run on TPU: python scripts/perf_r3_tables.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, args_list, iters=6, warmup=2):
    import jax
    for i in range(warmup):
        np.asarray(jax.tree.leaves(fn(*args_list[i % len(args_list)]))[0].ravel()[:1])
    ts = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.ops import pallas_tables as PT

    # --- ray/points corner table at flagship shape -------------------------
    D, H, W, C = 20, 256, 256, 22
    vol = jax.random.normal(jax.random.PRNGKey(0), (D, H, W, C),
                            jnp.float32).astype(jnp.bfloat16)

    ref = np.asarray(jax.jit(PT._corner_table_xla)(vol))
    got = np.asarray(jax.jit(PT._corner_table_pallas)(vol))
    ok = np.array_equal(ref, got)
    print(f'corner_table exact: {ok}', flush=True)
    if not ok:
        bad = np.argwhere(ref != got)
        print('  first mismatches:', bad[:5], ref.shape)
        print('  ref', ref[tuple(bad[0])], 'got', got[tuple(bad[0])])

    f_x = jax.jit(lambda v: jnp.sum(PT._corner_table_xla(v).astype(jnp.float32)))
    f_p = jax.jit(lambda v: jnp.sum(PT._corner_table_pallas(v).astype(jnp.float32)))
    vs = [vol + jnp.bfloat16(0.01 * i) for i in range(3)]
    tx = timeit(f_x, [(v,) for v in vs])
    tp = timeit(f_p, [(v,) for v in vs])
    gb = (D + 1) * (H + 1) * (W + 1) * 8 * C * 2 / 1e9
    print(f'corner_table: XLA {tx*1000:6.1f} ms ({gb/tx:5.1f} GB/s) | '
          f'pallas {tp*1000:6.1f} ms ({gb/tp:5.1f} GB/s)', flush=True)

    # gradient parity
    def loss_via(fn, v):
        t = fn(v)
        return jnp.sum(t.astype(jnp.float32) * 0.001)
    g_ref = jax.jit(jax.grad(lambda v: loss_via(PT._corner_table_xla, v)))(vol)
    g_new = jax.jit(jax.grad(lambda v: loss_via(PT.corner_table, v)))(vol)
    err = np.max(np.abs(np.asarray(g_ref, np.float32)
                        - np.asarray(g_new, np.float32)))
    print(f'corner_table grad max err: {err}', flush=True)

    # --- lift table at flagship shape --------------------------------------
    Dd, h, w, Cf = 86, 64, 176, 16
    depth = jax.nn.softmax(jax.random.normal(
        jax.random.PRNGKey(1), (Dd, h, w)), 0).astype(jnp.bfloat16)
    feat = jax.random.normal(jax.random.PRNGKey(2), (h, w, Cf),
                             jnp.float32).astype(jnp.bfloat16)

    ref = np.asarray(jax.jit(PT._lift_table_xla)(depth, feat))
    got = np.asarray(jax.jit(PT._lift_table_pallas)(depth, feat))
    ok = np.array_equal(ref, got)
    print(f'lift_table exact: {ok}', flush=True)

    f_x = jax.jit(lambda d, f: jnp.sum(PT._lift_table_xla(d, f).astype(jnp.float32)))
    f_p = jax.jit(lambda d, f: jnp.sum(PT._lift_table_pallas(d, f).astype(jnp.float32)))
    ds = [depth + jnp.bfloat16(1e-4 * i) for i in range(3)]
    tx = timeit(f_x, [(d, feat) for d in ds])
    tp = timeit(f_p, [(d, feat) for d in ds])
    gb = (Dd + 1) * (h + 1) * (w + 1) * (8 + 4 * Cf) * 2 / 1e9
    print(f'lift_table (x1 cam): XLA {tx*1000:6.1f} ms ({gb/tx:5.1f} GB/s) | '
          f'pallas {tp*1000:6.1f} ms ({gb/tp:5.1f} GB/s)', flush=True)

    # 6-camera vmap (the in-model pattern)
    depth6 = jnp.stack([depth] * 6) + jax.random.normal(
        jax.random.PRNGKey(3), (6, Dd, h, w)).astype(jnp.bfloat16) * 0.01
    feat6 = jnp.stack([feat] * 6)
    f_x6 = jax.jit(lambda d, f: jnp.sum(jax.vmap(PT._lift_table_xla)(d, f).astype(jnp.float32)))
    f_p6 = jax.jit(lambda d, f: jnp.sum(jax.vmap(PT._lift_table_pallas)(d, f).astype(jnp.float32)))
    tx = timeit(f_x6, [(depth6 + jnp.bfloat16(1e-4 * i), feat6) for i in range(3)])
    try:
        tp = timeit(f_p6, [(depth6 + jnp.bfloat16(1e-4 * i), feat6) for i in range(3)])
        ok6 = np.array_equal(
            np.asarray(jax.jit(jax.vmap(PT._lift_table_xla))(depth6, feat6)),
            np.asarray(jax.jit(jax.vmap(PT._lift_table_pallas))(depth6, feat6)))
        print(f'lift_table x6 vmap exact: {ok6}; XLA {tx*1000:6.1f} ms | '
              f'pallas {tp*1000:6.1f} ms', flush=True)
    except Exception as e:
        print(f'lift_table x6 vmap pallas FAIL: {type(e).__name__}: '
              f'{str(e)[:300]}', flush=True)

    # lift grad parity
    def loss2(fn, d, f):
        return jnp.sum(fn(d, f).astype(jnp.float32) * 1e-3)
    g_ref = jax.jit(jax.grad(lambda d, f: loss2(PT._lift_table_xla, d, f),
                             argnums=(0, 1)))(depth, feat)
    g_new = jax.jit(jax.grad(lambda d, f: loss2(PT.lift_table, d, f),
                             argnums=(0, 1)))(depth, feat)
    for a, b, name in zip(g_ref, g_new, ('ddepth', 'dfeat')):
        err = np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)))
        print(f'lift_table grad {name} max err: {err}', flush=True)


if __name__ == '__main__':
    main()
