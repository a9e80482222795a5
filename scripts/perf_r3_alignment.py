"""Lane-alignment experiment for the corner-block tables.

The shipped ray table rows are 8*C = 160 bf16 channels = 320 B — 2.5
128-lane tiles, so every row read/write straddles tile boundaries. Padding
the fused channel count C 20 -> 24 or 32 makes rows exactly 1.5x / 2x
128-lane tiles. Bytes are nearly free on this gather (perf_r3_rowwidth.py);
if alignment is what the build's 17 GB/s write rate chokes on, a padded
table could cut the ~26 ms/frame build cost and maybe the take too.

Measures, at the flagship ray-table shape (vol 20x256x256):
  build: 8-way concat and pairwise at C in {20, 24, 32}
  take : ray-like coherent gather at 8*C in {160, 192, 256} channels
  build+take fused (the in-model composition)

Run: python scripts/perf_r3_alignment.py  (real TPU)
"""
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def timeit(fn, *args, iters=6, warmup=2):
    import jax
    for _ in range(warmup):
        np.asarray(jax.tree.leaves(fn(*args))[0].ravel()[:1])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        for x in jax.tree.leaves(out):
            np.asarray(x.ravel()[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from vampire_tpu.ops.pallas_tables import (_corner_table_xla,
                                               _corner_table_xla_pairwise)

    Z, Y, X = 20, 256, 256
    rows_n = (Z + 1) * (Y + 1) * (X + 1)
    nq = 67584 * 12
    rng = np.random.default_rng(0)

    # ray-like coherent row stream (sorted blocks + small jitter)
    base = np.sort(rng.integers(0, rows_n - 128, size=(nq // 96,)))
    rows = (base[:, None] + rng.integers(0, 96, size=(nq // 96, 96))) \
        .reshape(-1).astype(np.int32)
    rows = jnp.asarray(np.clip(rows, 0, rows_n - 1))

    for C in (20, 24, 32):
        vol = jnp.asarray(
            rng.standard_normal((Z, Y, X, C)).astype(np.float32),
            dtype=jnp.bfloat16)

        f8 = jax.jit(lambda v: _corner_table_xla(v))
        fp = jax.jit(lambda v: _corner_table_xla_pairwise(v))
        t8 = timeit(f8, vol)
        tp = timeit(fp, vol)
        byts = rows_n * 8 * C * 2
        print(f'C={C:2d} build 8way {t8*1e3:6.2f} ms ({byts/t8/1e9:5.1f} '
              f'GB/s out)  pairwise {tp*1e3:6.2f} ms', flush=True)

        tab = f8(vol).reshape(rows_n, 8 * C)

        ftake = jax.jit(lambda t, r: jnp.take(t, r, axis=0))
        tt = timeit(ftake, tab, rows)
        print(f'      take {8*C:3d}ch ({8*C*2:4d} B/row): {tt*1e3:6.2f} ms '
              f'({nq/tt/1e6:5.1f} Mrows/s)', flush=True)

        def fused(v, r):
            t = _corner_table_xla(v).reshape(rows_n, 8 * C)
            return jnp.take(t, r, axis=0)
        tf = timeit(jax.jit(fused), vol, rows)
        print(f'      build+take fused: {tf*1e3:6.2f} ms', flush=True)


if __name__ == '__main__':
    main()
