"""Camera-feature stage decomposition: R50 vs SECONDFPN vs depth/context.

In-model attribution puts the image stage near ~27 ms for ~0.2 TFLOP
(<4% MFU). This script times the parts and tests one hypothesis: the
SECONDFPN ConvTranspose(k=s, stride=s) lowers poorly in XLA, while the same
math as a 1x1-matmul + depth-to-space reshape rides the MXU.

Run: python scripts/perf_r3_camfeats.py  (real TPU)
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
    from vampire_tpu.models.resnet import ResNet
    from vampire_tpu.models.second_fpn import SECONDFPN

    cfg = flagship_config()
    c = cfg.backbone
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (6, 256, 704, 3), jnp.bfloat16)

    r50 = ResNet(depth=50, num_stages=4, base_channels=64,
                 strides=(1, 2, 2, 2), out_indices=(0, 1, 2, 3),
                 with_maxpool=True, dtype=jnp.bfloat16)
    v50 = jax.jit(lambda: r50.init(key, imgs, False))()

    def f_r50(v, x):
        return sum(jnp.sum(o.astype(jnp.float32)) for o in
                   r50.apply(v, x, False))
    t = timeit(jax.jit(f_r50), [(v50, imgs + 0.001 * i) for i in range(3)])
    print(f'[r50 6x256x704      ] {t*1e3:7.2f} ms', flush=True)

    feats = jax.jit(lambda v, x: r50.apply(v, x, False))(v50, imgs)
    feats = [jax.lax.stop_gradient(f) for f in feats]
    print('r50 out shapes:', [tuple(f.shape) for f in feats], flush=True)

    fpn = SECONDFPN(in_channels=c.img_neck_in_channels,
                    out_channels=c.img_neck_out_channels,
                    upsample_strides=c.img_neck_upsample_strides,
                    dtype=jnp.bfloat16)
    vf = jax.jit(lambda: fpn.init(key, feats, False))()

    def f_fpn(v, fs):
        return jnp.sum(fpn.apply(v, fs, False).astype(jnp.float32))
    t = timeit(jax.jit(f_fpn), [(vf, [f + 0.001 * i for f in feats])
                                for i in range(3)])
    print(f'[secondfpn deconv   ] {t*1e3:7.2f} ms', flush=True)

    # same math, matmul + depth-to-space: for stride>=1 scales,
    # y[b, ys+dy, xs+dx, o] = sum_ci x[b,y,x,ci] K[dy,dx,ci,o]
    def f_fpn_d2s(v, fs):
        outs = []
        for i, x in enumerate(fs):
            stride = c.img_neck_upsample_strides[i]
            p = v['params'][f'deblock{i}_conv']['kernel']
            if stride >= 1:
                s = int(stride)
                B, H, W, Ci = x.shape
                O = p.shape[-1]
                k2 = p.reshape(s * s * Ci, O) if False else p
                # kernel (s, s, Ci, O) -> (Ci, s, s, O)
                km = jnp.transpose(p, (2, 0, 1, 3)).reshape(Ci, s * s * O)
                y = x.reshape(B * H * W, Ci) @ km.astype(x.dtype)
                y = y.reshape(B, H, W, s, s, O)
                y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
                    B, H * s, W * s, O)
            else:
                s = int(round(1.0 / stride))
                y = nn.Conv(c.img_neck_out_channels[i], (s, s),
                            strides=(s, s), padding='VALID', use_bias=False,
                            dtype=x.dtype).apply(
                    {'params': {'kernel': p}}, x)
            bn = v['params'][f'deblock{i}_bn']
            st = v['batch_stats'][f'deblock{i}_bn']
            inv = jax.lax.rsqrt(st['var'] + 1e-3) * bn['scale']
            y = y.astype(jnp.float32) * inv + (bn['bias'] - st['mean'] * inv)
            outs.append(jax.nn.relu(y).astype(x.dtype))
        return jnp.sum(jnp.concatenate(outs, -1).astype(jnp.float32))

    t = timeit(jax.jit(f_fpn_d2s), [(vf, [f + 0.001 * i for f in feats])
                                    for i in range(3)])
    print(f'[secondfpn mm+d2s   ] {t*1e3:7.2f} ms', flush=True)

    # numerics check
    a = jax.jit(lambda v, fs: fpn.apply(v, fs, False))(vf, feats)
    # recompute d2s concat without the sum for comparison
    def f_fpn_d2s_full(v, fs):
        outs = []
        for i, x in enumerate(fs):
            stride = c.img_neck_upsample_strides[i]
            p = v['params'][f'deblock{i}_conv']['kernel']
            if stride >= 1:
                s = int(stride)
                B, H, W, Ci = x.shape
                O = p.shape[-1]
                km = jnp.transpose(p, (2, 0, 1, 3)).reshape(Ci, s * s * O)
                y = x.reshape(B * H * W, Ci) @ km.astype(x.dtype)
                y = y.reshape(B, H, W, s, s, O)
                y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
                    B, H * s, W * s, O)
            else:
                s = int(round(1.0 / stride))
                y = nn.Conv(c.img_neck_out_channels[i], (s, s),
                            strides=(s, s), padding='VALID', use_bias=False,
                            dtype=x.dtype).apply(
                    {'params': {'kernel': p}}, x)
            bn = v['params'][f'deblock{i}_bn']
            st = v['batch_stats'][f'deblock{i}_bn']
            inv = jax.lax.rsqrt(st['var'] + 1e-3) * bn['scale']
            y = y.astype(jnp.float32) * inv + (bn['bias'] - st['mean'] * inv)
            outs.append(jax.nn.relu(y).astype(x.dtype))
        return jnp.concatenate(outs, -1)
    b = jax.jit(f_fpn_d2s_full)(vf, feats)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    print(f'[d2s numerics       ] max_abs_diff {err:.3e}', flush=True)


if __name__ == '__main__':
    main()
