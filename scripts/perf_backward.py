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


def main():
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
    results['fwd_fused'] = timeit(f_fwd, argsl)
    results['bwd_fused_tablegrad'] = timeit(g_fused, argsl)
    results['bwd_unfused_scatter'] = timeit(g_unfused, argsl)

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

    results['bwd_direct_scatter'] = timeit(jax.jit(loss_and_direct), argsl)

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

    results['bwd_segment_sum'] = timeit(jax.jit(loss_and_segsum), argsl)

    print('\n=== backward strategies (ms) ===')
    for k, v in results.items():
        print(f'{k:24s} {v * 1000:8.1f}')


if __name__ == '__main__':
    main()
