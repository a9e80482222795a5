"""Constant-index vs runtime-index reorder cost (static compaction probe).

perf_r3_compact_overhead.py showed the compact sampler's loss is ~76 ms of
dynamic argsort + 3 reorder takes. If the permutation is a TRACE-TIME
CONSTANT (canonical worst-case-L ray order), XLA may lower the reorders as
cheap copies. Measures take((R,86,3)+(R,86)x2) with (a) runtime perm,
(b) constant perm, (c) constant perm expressed as a reshape-free
concat-of-slices (tile-granular), plus the output unsort (R, 24).

Run: python scripts/perf_r3_staticperm.py  (real TPU)
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

    R, Sn = 67584, 86
    rng = np.random.default_rng(0)
    cc = jnp.asarray(rng.standard_normal((R, Sn, 3)).astype(np.float32))
    vv = jnp.asarray(rng.standard_normal((R, Sn)).astype(np.float32))
    dd = jnp.asarray(rng.standard_normal((R, Sn)).astype(np.float32))
    out = jnp.asarray(rng.standard_normal((R, 24)).astype(np.float32))
    perm_np = rng.permutation(R).astype(np.int32)
    perm = jnp.asarray(perm_np)

    f_dyn = jax.jit(lambda c, v, d, p: (jnp.take(c, p, 0), jnp.take(v, p, 0),
                                        jnp.take(d, p, 0)))
    t = timeit(f_dyn, [(cc + i, vv, dd, perm) for i in range(3)])
    print(f'[runtime perm 3 takes ] {t*1e3:7.1f} ms', flush=True)

    cperm = jnp.asarray(perm_np)  # closed over -> constant in the jaxpr
    f_const = jax.jit(lambda c, v, d: (jnp.take(c, cperm, 0),
                                       jnp.take(v, cperm, 0),
                                       jnp.take(d, cperm, 0)))
    t = timeit(f_const, [(cc + i, vv, dd) for i in range(3)])
    print(f'[const perm 3 takes   ] {t*1e3:7.1f} ms', flush=True)

    # tile-granular constant permutation: permute whole 256-ray tiles
    TILE = 256
    tiles = rng.permutation(R // TILE).astype(np.int32)
    tperm = (tiles[:, None] * TILE
             + np.arange(TILE)[None, :]).reshape(-1).astype(np.int32)
    ctile = jnp.asarray(tperm)
    f_tile = jax.jit(lambda c, v, d: (jnp.take(c, ctile, 0),
                                      jnp.take(v, ctile, 0),
                                      jnp.take(d, ctile, 0)))
    t = timeit(f_tile, [(cc + i, vv, dd) for i in range(3)])
    print(f'[const tile-perm takes] {t*1e3:7.1f} ms', flush=True)

    # same tile permutation as reshape+take of tile blocks
    ctiles = jnp.asarray(tiles)
    def tile_reshape(c, v, d):
        def g(x):
            xt = x.reshape((R // TILE, TILE) + x.shape[1:])
            return jnp.take(xt, ctiles, 0).reshape(x.shape)
        return g(c), g(v), g(d)
    f_tr = jax.jit(tile_reshape)
    t = timeit(f_tr, [(cc + i, vv, dd) for i in range(3)])
    print(f'[const tile-block take] {t*1e3:7.1f} ms', flush=True)

    f_un = jax.jit(lambda o: jnp.take(o, cperm, 0))
    t = timeit(f_un, [(out + i,) for i in range(3)])
    print(f'[const unsort (R,24)  ] {t*1e3:7.1f} ms', flush=True)

    f_id = jax.jit(lambda c, v, d: (c * 1.000001, v * 1.000001, d * 1.000001))
    t = timeit(f_id, [(cc + i, vv, dd) for i in range(3)])
    print(f'[elementwise baseline ] {t*1e3:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
