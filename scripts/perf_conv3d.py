"""Conv3d formulation shootout for the Unet3D hot path on TPU v5e.

The 3D U-Net convs run on a (20, 256, 256, 16) channels-last grid: only 16 of
128 MXU lanes are used, so XLA's native conv3d is badly under-utilized.
Candidates (all EXACT conv3d semantics):

  a) native: lax conv over (Z, Y, X, C) as XLA chooses;
  b) z-unrolled conv2d: out[z] = sum_dz conv2d(in[z+dz], K[dz]) with the z
     loop unrolled (3 conv2ds per z-slab, each (Y, X, C) -> (Y, X, C));
  c) z-in-channels block-banded: ONE 2D conv over (Y, X, Z*C) whose
     (3, 3, Z*C, Z*C) kernel is the block-banded expansion of the
     (3, 3, 3, C, C) conv3d kernel (6.7x the FLOPs, ~full lanes).

Run: python scripts/perf_conv3d.py
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, args_list, iters=6, warmup=2):
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
    from jax import lax
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    Z, Y, X, C = 20, 256, 256, 16
    dt = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (1, Z, Y, X, C), dt)
    k3 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C, C),
                           jnp.float32) * 0.05

    def conv3d_native(x, k):
        return lax.conv_general_dilated(
            x, k.astype(dt), (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))

    def conv2d(x2, k2):
        return lax.conv_general_dilated(
            x2, k2.astype(dt), (1, 1), [(1, 1)] * 2,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def conv3d_zunroll(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        outs = []
        for z in range(Z):
            acc = 0
            for dz in range(3):
                acc = acc + conv2d(xp[:, z + dz], k[dz])
            outs.append(acc)
        return jnp.stack(outs, axis=1)

    def banded_kernel(k):
        # (3(dz), 3, 3, C, C) -> (3, 3, Z*C, Z*C) block-banded:
        # out-block z receives in-blocks z-1, z, z+1 through k[0..2]
        big = jnp.zeros((3, 3, Z * C, Z * C), jnp.float32)
        for z in range(Z):
            for dz in range(3):
                zin = z + dz - 1
                if 0 <= zin < Z:
                    big = big.at[:, :, zin * C:(zin + 1) * C,
                                 z * C:(z + 1) * C].set(k[dz])
        return big

    def conv3d_zchannels(x, kbig):
        x2 = jnp.moveaxis(x, 1, 3).reshape(1, Y, X, Z * C)
        o = conv2d(x2, kbig)
        return jnp.moveaxis(o.reshape(1, Y, X, Z, C), 3, 1)

    # chain K convs inside one jit so per-call ~25ms axon fetch overhead is
    # amortized: reported number is (t_chain / K) per conv
    K_CHAIN = 16

    def chain(f):
        def run(xx):
            y = xx
            for i in range(K_CHAIN):
                y = f(y) + 0.001 * xx
            return jnp.sum(y.astype(jnp.float32))
        return run

    kbig = jax.jit(banded_kernel)(k3)
    fa = jax.jit(chain(lambda y: conv3d_native(y, k3)))
    fb = jax.jit(chain(lambda y: conv3d_zunroll(y, k3)))
    fc = jax.jit(chain(lambda y: conv3d_zchannels(y, kbig)))

    # backward at the same shapes (grad wrt input + kernel)
    ga = jax.jit(jax.grad(lambda kk: jnp.sum(chain(
        lambda y: conv3d_native(y, kk))(x).astype(jnp.float32))))
    gc = jax.jit(jax.grad(lambda kk: jnp.sum(chain(
        lambda y: conv3d_zchannels(y, banded_kernel(kk)))(x)
        .astype(jnp.float32))))

    # correctness cross-check first (small tolerance: bf16 compute)
    a = jax.jit(lambda xx: conv3d_native(xx, k3))(x)
    b = jax.jit(lambda xx: conv3d_zunroll(xx, k3))(x)
    cth = jax.jit(lambda xx: conv3d_zchannels(xx, kbig))(x)
    err_b = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - b.astype(jnp.float32))))
    err_c = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                  - cth.astype(jnp.float32))))
    print(f'max|native-zunroll| = {err_b:.4f}  max|native-zchan| = {err_c:.4f}')

    argsl = [(x + 0.001 * i,) for i in range(3)]
    for name, f in (('native', fa), ('zunroll', fb), ('zchannels', fc)):
        t = timeit(f, argsl)
        print(f'[{name}] {t * 1000 / K_CHAIN:.2f} ms/conv '
              f'({t * 1000:.1f} ms chain)', flush=True)
    argsk = [(k3 + 0.001 * i,) for i in range(3)]
    for name, f in (('native bwd', ga), ('zchannels bwd', gc)):
        try:
            t = timeit(f, argsk)
            print(f'[{name}] {t * 1000 / K_CHAIN:.2f} ms/conv '
                  f'({t * 1000:.1f} ms chain)', flush=True)
        except Exception as e:
            print(f'[{name}] FAILED {type(e).__name__}: {str(e)[:200]}',
                  flush=True)


if __name__ == '__main__':
    main()
