"""Backward-pass strategy comparison for the fused trilinear samplers.

Round-1 finding: flagship train step 2.6s at B=1 with backward ~6x forward.
Candidate vol-gradient strategies for grid_sample_3d_fused (the ray/point
sampler) and sample_outer_product_fused (the lift):

  a) status quo: XLA transpose of take-from-corner-table
     (materializes a (R, 8C) table gradient + pad/stack transpose);
  b) direct-scatter custom VJP: 8 scatter-adds of (P, C) into the flat
     volume, weights recomputed from coords (no table in backward);
  c) unfused sampler (8 takes forward, 8 scatters backward) as control.

Run on the TPU host: python scripts/perf_backward.py
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, args_list, iters=5, warmup=2):
    import jax
    for i in range(warmup):
        np.asarray(jax.tree.leaves(
            fn(*args_list[i % len(args_list)]))[0].ravel()[:1])
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args_list[i % len(args_list)])
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def rec(results, name, t):
    results[name] = t
    print(f'[{name}] {t * 1000:.1f} ms', flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', default='')
    args = ap.parse_args()
    only = set(args.only.split(',')) if args.only else None

    def want(name):
        return only is None or name in only

    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.core import sampling as S

    Z, Y, X, C = 20, 256, 256, 22
    P = 6 * 86 * 64 * 176
    vol = jax.random.normal(jax.random.PRNGKey(0), (Z, Y, X, C))
    coords = jax.random.uniform(jax.random.PRNGKey(1), (P, 3)) * 2.4 - 1.2
    results = {}

    def loss_fused(v):
        return jnp.sum(S.grid_sample_3d_fused(v, coords, align_corners=True,
                                              padding_mode='zeros') ** 2)

    def loss_unfused(v):
        return jnp.sum(S.grid_sample_3d(v, coords, align_corners=True,
                                        padding_mode='zeros') ** 2)

    g_fused = jax.jit(jax.grad(loss_fused))
    g_unfused = jax.jit(jax.grad(loss_unfused))
    f_fwd = jax.jit(loss_fused)

    argsl = [(vol + 0.001 * i,) for i in range(3)]
    if want('fwd_fused'):
        rec(results, 'fwd_fused', timeit(f_fwd, argsl))
    if want('bwd_fused_tablegrad'):
        rec(results, 'bwd_fused_tablegrad', timeit(g_fused, argsl))
    if want('bwd_unfused_scatter'):
        rec(results, 'bwd_unfused_scatter', timeit(g_unfused, argsl))

    # direct-scatter backward: recompute weights, 8 x scatter-add into volume
    def direct_scatter_grad(v, g):
        D2, H2, W2, C2 = v.shape
        c = coords
        xi, xw, xm = S._prep_axis(c[:, 0], W2, True, False)
        yi, yw, ym = S._prep_axis(c[:, 1], H2, True, False)
        zi, zw, zm = S._prep_axis(c[:, 2], D2, True, False)
        out = jnp.zeros((D2 * H2 * W2, C2), jnp.float32)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = zw[dz] * yw[dy] * xw[dx]
                    w = jnp.where(zm[dz] & ym[dy] & xm[dx], w, 0.0)
                    idx = (zi[dz] * H2 + yi[dy]) * W2 + xi[dx]
                    out = out.at[idx].add(g * w[:, None])
        return out.reshape(v.shape)

    def loss_and_direct(v):
        out = S.grid_sample_3d_fused(v, coords, align_corners=True,
                                     padding_mode='zeros')
        g = 2.0 * out  # d(sum(out^2))/d(out)
        return direct_scatter_grad(v, g)

    if want('bwd_direct_scatter'):
        rec(results, 'bwd_direct_scatter',
            timeit(jax.jit(loss_and_direct), argsl))

    # segment-sum variant: one concatenated scatter via sort-free segment_sum
    # over the flat voxel id (XLA lowers segment_sum to scatter too, but in
    # one call with 8P rows)
    def loss_and_segsum(v):
        D2, H2, W2, C2 = v.shape
        out = S.grid_sample_3d_fused(v, coords, align_corners=True,
                                     padding_mode='zeros')
        g = 2.0 * out
        c = coords
        xi, xw, xm = S._prep_axis(c[:, 0], W2, True, False)
        yi, yw, ym = S._prep_axis(c[:, 1], H2, True, False)
        zi, zw, zm = S._prep_axis(c[:, 2], D2, True, False)
        idxs, vals = [], []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = zw[dz] * yw[dy] * xw[dx]
                    w = jnp.where(zm[dz] & ym[dy] & xm[dx], w, 0.0)
                    idxs.append((zi[dz] * H2 + yi[dy]) * W2 + xi[dx])
                    vals.append(g * w[:, None])
        idx = jnp.concatenate(idxs)
        val = jnp.concatenate(vals)
        return jax.ops.segment_sum(val, idx, num_segments=D2 * H2 * W2)

    if want('bwd_segment_sum'):
        rec(results, 'bwd_segment_sum', timeit(jax.jit(loss_and_segsum), argsl))

    # sorted cumsum-diff table-grad: the table cotangent computed WITHOUT
    # scatter-add — argsort the destination rows, gather the (w8 x g) payload
    # in sorted order, cumsum, and recover per-row segment sums as
    # csum[end_of_row] - csum[before_start_of_row] via two UNIQUE-index
    # scatter-writes (fast mode: no read-modify-write accumulation).
    # Numerically: fp32 cumsum over P~5.8M signed values drifts ~eps*|csum|;
    # acceptable for gradients (cross-checked in tests on CPU).
    Rtab = 21 * 257 * 257

    def loss_and_sorted_tablegrad(v):
        tab = S.build_neighborhood_table(v)
        flat = tab.reshape(tab.shape[0], -1)
        c = coords
        D2, H2, W2, C2 = v.shape
        bx, ax = S._axis_window_weights(c[:, 0], W2, True, False)
        by, ay = S._axis_window_weights(c[:, 1], H2, True, False)
        bz, az = S._axis_window_weights(c[:, 2], D2, True, False)
        rows = (bz * (H2 + 1) + by) * (W2 + 1) + bx
        w8 = (az[:, :, None, None] * ay[:, None, :, None]
              * ax[:, None, None, :]).reshape(-1, 8)
        t = jnp.take(flat, rows, axis=0).reshape(-1, 8, C2)
        out = jnp.sum(t * w8[:, :, None], axis=1)
        g = 2.0 * out                                       # (P, C)
        payload = (w8[:, :, None] * g[:, None, :]).reshape(-1, 8 * C2)
        order = jnp.argsort(rows)
        r_s = jnp.take(rows, order)
        p_s = jnp.take(payload, order, axis=0)
        csum = jnp.cumsum(p_s, axis=0)
        P2 = rows.shape[0]
        is_end = jnp.concatenate([r_s[1:] != r_s[:-1],
                                  jnp.ones((1,), bool)])
        is_start = jnp.concatenate([jnp.ones((1,), bool),
                                    r_s[1:] != r_s[:-1]])
        # dump = out-of-bounds -> dropped; surviving indices are unique
        dump = Rtab + 1
        end_idx = jnp.where(is_end, r_s, dump)
        start_idx = jnp.where(is_start, r_s, dump)
        A = jnp.zeros((Rtab + 1, 8 * C2), jnp.float32)
        A = A.at[end_idx].set(csum, mode='drop', unique_indices=True)
        # csum-before-start of row at sorted position i is csum[i-1]; the
        # first segment's before-sum is 0 (zero-init row, index shifted out)
        Bm = jnp.zeros((Rtab + 1, 8 * C2), jnp.float32)
        Bm = Bm.at[start_idx[1:]].set(csum[:-1], mode='drop',
                                      unique_indices=True)
        return (A - Bm)[:Rtab]

    if want('bwd_sorted_tablegrad'):
        rec(results, 'bwd_sorted_tablegrad',
            timeit(jax.jit(loss_and_sorted_tablegrad), argsl))

    # chunked library version (bounded intermediates)
    def loss_and_sorted_chunked(v):
        tab = S.build_neighborhood_table(v)
        flat = tab.reshape(tab.shape[0], -1)
        c = coords
        D2, H2, W2, C2 = v.shape
        bx, ax = S._axis_window_weights(c[:, 0], W2, True, False)
        by, ay = S._axis_window_weights(c[:, 1], H2, True, False)
        bz, az = S._axis_window_weights(c[:, 2], D2, True, False)
        rows = (bz * (H2 + 1) + by) * (W2 + 1) + bx
        w8 = (az[:, :, None, None] * ay[:, None, :, None]
              * ax[:, None, None, :]).reshape(-1, 8)
        t = jnp.take(flat, rows, axis=0).reshape(-1, 8, C2)
        out = jnp.sum(t * w8[:, :, None], axis=1)
        g = 2.0 * out
        payload = (w8[:, :, None] * g[:, None, :]).reshape(-1, 8 * C2)
        return S.sorted_segment_rows(rows, payload, Rtab, num_chunks=8)

    if want('bwd_sorted_chunked'):
        rec(results, 'bwd_sorted_chunked',
            timeit(jax.jit(loss_and_sorted_chunked), argsl))

    # component costs of the sorted path at the same shapes
    rows_only = jax.random.randint(jax.random.PRNGKey(2), (P,), 0, Rtab,
                                   jnp.int32)
    pay = jax.random.normal(jax.random.PRNGKey(3), (P, 176), jnp.float32)
    if want('argsort_P_keys'):
        f_sort = jax.jit(lambda r: jnp.argsort(r))
        rec(results, 'argsort_P_keys',
            timeit(f_sort, [(rows_only + i,) for i in range(3)]))
    if want('unique_set_P_to_R'):
        f_uset = jax.jit(lambda i, p: jnp.zeros(
            (Rtab + 1, 176), jnp.float32).at[i].set(
                p, mode='drop', unique_indices=True))
        rec(results, 'unique_set_P_to_R',
            timeit(f_uset, [(rows_only + i, pay) for i in range(3)]))

    print('\n=== backward strategies (ms) ===')
    for k, v in results.items():
        print(f'{k:24s} {v * 1000:8.1f}')


if __name__ == '__main__':
    main()
