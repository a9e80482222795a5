"""Stage-level timing of the detection head (trunk / neck / heads / decode).

The in-isolation head cost (~28 ms, perf_breakdown.py) is far above its
FLOP floor (~40 GFLOP fp32 -> ~1 ms at 40% MFU); this script locates the
overhead. Run on the TPU host: python scripts/perf_head.py
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
    import flax.linen as nn
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.models.centerpoint_head import (BEVDepthHead,
                                                     decode_preds)
    from vampire_tpu.models.resnet import ResNet
    from vampire_tpu.models.second_fpn import SECONDFPN

    cfg = flagship_config().head
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 128, 128, 80), jnp.float32)
    results = {}

    def rec(name, t):
        results[name] = t
        print(f'[{name}] {t * 1000:.2f} ms', flush=True)

    head = BEVDepthHead(cfg)
    hv = jax.jit(lambda: head.init(key, x, False))()

    f_full = jax.jit(lambda v, xx: sum(
        jnp.sum(o.astype(jnp.float32))
        for o in jax.tree.leaves(head.apply(v, xx, False))))
    rec('head_forward', timeit(f_full, [(hv, x + 0.01 * i)
                                        for i in range(3)]))

    def h_decode(v, xx):
        preds = head.apply(v, xx, False)
        dec = decode_preds(preds, cfg)
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree.leaves(
                       [(d['bboxes'], d['scores']) for d in dec]))
    rec('head_plus_decode', timeit(jax.jit(h_decode),
                                   [(hv, x + 0.01 * i) for i in range(3)]))

    # trunk only
    class Trunk(nn.Module):
        @nn.compact
        def __call__(self, xx):
            feats = ResNet(depth=cfg.bev_backbone_depth,
                           base_channels=cfg.bev_backbone_base_channels,
                           num_stages=cfg.bev_backbone_num_stages,
                           strides=cfg.bev_backbone_strides,
                           out_indices=cfg.bev_backbone_out_indices,
                           with_stem=False)(xx, False)
            return feats
    try:
        trunk = Trunk()
        tv = jax.jit(lambda: trunk.init(key, x))()
        f_tr = jax.jit(lambda v, xx: sum(jnp.sum(o.astype(jnp.float32))
                                         for o in trunk.apply(v, xx)))
        rec('trunk_only', timeit(f_tr, [(tv, x + 0.01 * i)
                                        for i in range(3)]))
    except Exception as e:
        print(f'[trunk_only] FAILED {type(e).__name__}: {str(e)[:200]}',
              flush=True)

    # decode only (on random preds shaped like head outputs)
    preds0 = head.apply(hv, x, False)
    f_dec = jax.jit(lambda p: sum(
        jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(
            [(d['bboxes'], d['scores'])
             for d in decode_preds(p, cfg)])))
    pl = []
    for i in range(3):
        pl.append(([{k: v + 0.01 * i for k, v in pd.items()}
                    for pd in preds0],))
    rec('decode_only', timeit(f_dec, pl))

    print('\n=== head breakdown (ms) ===')
    for k, v in results.items():
        print(f'{k:16s} {v * 1000:7.2f}')


if __name__ == '__main__':
    main()
