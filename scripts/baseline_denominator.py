"""Stress-test of bench.py's 5 fps A100 denominator (VERDICT r3 #9).

An A100 cannot be measured in this environment (one TPU chip, zero egress),
and the reference publishes no throughput numbers (BASELINE.md). bench.py's
denominator is an engineering estimate with two load-bearing inputs:

  (1) the per-frame FLOP count (~0.4 TFLOP estimated from architecture math);
  (2) the "torch-eager realizes 5-15% of speed-of-light" efficiency band.

This script replaces both with MEASUREMENTS that are possible here, on the
installed CPU torch, and composes a bottom-up bracket for the A100 frame
time. Anchors produced:

  A. Exact conv FLOPs of the encoder at the real shape — runs torchvision's
     resnet50 (the reference's image backbone is mm ResNet-50, identical op
     graph) under torch.profiler with_flops at 6x256x704 and counts both
     FLOPs and dispatched ops. The remaining stages (FPN / Unet3D / heads)
     are shape-arithmetic (printed per stage) — they are plain conv stacks
     whose MAC count is exact by construction.
  B. Measured python/aten dispatch+launch overhead per eager op. On CUDA the
     per-op floor is the same python dispatch plus a ~3-8 us kernel launch;
     we measure the CPU dispatch component directly with 1-element tensors
     (no compute, no memory: pure overhead) — a device-independent LOWER
     bound on eager per-op cost.
  C. Eager unfused-elementwise traffic: every elementwise aten op in the
     profiler trace reads + writes its full tensor from HBM in eager mode
     (no fusion). We sum that traffic over the trace and price it at A100
     HBM bandwidth — overhead a compiled/fused runtime would not pay.

Composition (printed at the end): A100 frame time >= max(tensor-core time at
a generous conv MFU, HBM time for weights+activations+eager-elementwise)
+ op_count x launch_overhead. The bracket's LOW end (fastest plausible
reference) is what bench.py's denominator must not exceed.

Run: JAX_PLATFORMS=cpu python scripts/baseline_denominator.py
(CPU-only; ~2-4 min, dominated by the profiled resnet50 forward.)
"""
import json
import time

import numpy as np
import torch


def measure_dispatch_overhead(n: int = 2000) -> float:
    """Per-op eager overhead with 1-element tensors (pure dispatch)."""
    x = torch.zeros(1)
    y = torch.ones(1)
    for _ in range(100):
        x = x + y  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        x = x + y
    dt = (time.perf_counter() - t0) / n
    return dt


_ELEMENTWISE = ('add', 'sub', 'mul', 'div', 'relu', 'sigmoid', 'tanh',
                'softplus', 'batch_norm', 'softmax', 'clamp', 'exp', 'pow',
                'rsub', 'silu', 'gelu', 'hardtanh', 'copy_', 'cat')


def _make_resnet50():
    """Textbook bottleneck ResNet-50 trunk in plain torch (torchvision is
    not installed here; the reference's mm ResNet-50 has the identical op
    graph for the purposes of FLOP/op counting — stem + 4 stages of
    [3, 4, 6, 3] bottlenecks, no fc/avgpool like the reference's
    out_indices tap)."""
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, mid, stride):
            super().__init__()
            cout = mid * 4
            self.conv1 = nn.Conv2d(cin, mid, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(mid)
            self.conv2 = nn.Conv2d(mid, mid, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(mid)
            self.conv3 = nn.Conv2d(mid, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.down = None
            if stride != 1 or cin != cout:
                self.down = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idn = x if self.down is None else self.down(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return self.relu(y + idn)

    class R50(nn.Module):
        def __init__(self):
            super().__init__()
            import torch.nn as nn
            self.stem = nn.Sequential(
                nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
                nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1))
            blocks = []
            cin = 64
            for mid, n, stride in ((64, 3, 1), (128, 4, 2),
                                   (256, 6, 2), (512, 3, 2)):
                for i in range(n):
                    blocks.append(Bottleneck(cin, mid, stride if i == 0
                                             else 1))
                    cin = mid * 4
            self.blocks = nn.Sequential(*blocks)

        def forward(self, x):
            return self.blocks(self.stem(x))

    return R50()


def profile_resnet50(batch: int = 6, hw=(256, 704)):
    """r50 trunk (reference backbone twin) at the real input shape."""
    model = _make_resnet50()
    model.eval()
    x = torch.randn(batch, 3, hw[0], hw[1])
    with torch.no_grad():
        model(x)  # warm
        from torch.profiler import profile, ProfilerActivity
        with profile(activities=[ProfilerActivity.CPU], with_flops=True,
                     record_shapes=True) as prof:
            model(x)
    total_flops = 0
    n_ops = 0
    elementwise_bytes = 0
    for evt in prof.key_averages():
        if not evt.key.startswith('aten::'):
            continue
        n_ops += evt.count
        if evt.flops:
            total_flops += evt.flops
    # elementwise traffic (read + write the full tensor once per eager
    # elementwise op, fp16 on GPU) needs per-call shapes, not key_averages
    for evt in prof.events():
        name = getattr(evt, 'name', '')
        if not name.startswith('aten::'):
            continue
        op = name[6:]
        if any(op.startswith(e) for e in _ELEMENTWISE):
            shapes = evt.input_shapes or []
            if shapes and shapes[0]:
                numel = int(np.prod(shapes[0]))
                elementwise_bytes += 2 * numel * 2   # fp16 read + write
    return total_flops, n_ops, elementwise_bytes


def stage_flops():
    """Exact MAC arithmetic for the non-resnet stages (shapes from
    SURVEY.md §3.1 / base_exp.py configs). Returns GFLOP (2x MAC)."""
    N = 6
    # FPN/depth/context all live at 1/8 scale (32, 88): ResNet C2..C5 are
    # (64,176)/(32,88)/(16,44)/(8,22) and upsample_strides (0.5,1,2,4)
    # land every scale on (32,88) (verified by instantiating our FPN)
    h, w = 32, 88
    out = {}
    fpn = 0
    for cin, k in ((256, 2), (512, 1), (1024, 2), (2048, 4)):
        # (transposed) conv MACs = cin*cout*k*k*h_out*w_out
        fpn += cin * 128 * k * k * h * w
    out['second_fpn'] = 2 * fpn * N / 1e9
    # depth head 512->86 k3 + context 512->16 k3 (base_vampire2.py:171-176)
    out['depth_ctx_heads'] = 2 * (512 * (86 + 16) * 9 * h * w) * N / 1e9
    # Unet3D inpaintor: 2x Hourglass3D on (16ch, 20, 256, 256)
    # (base_vampire2.py:17-78): per hourglass, convs at full/half/quarter res
    vox = 20 * 256 * 256
    c = 16
    per_hg = (2 * (c * 2 * c) + 2 * (2 * c * 2 * c) / 8 + 2 *
              (2 * c * 4 * c) / 8 + 2 * (4 * c * 4 * c) / 64) * 27 * vox
    out['unet3d_2x'] = 2 * 2 * per_hg / 1e9
    # field heads: 19ch -> (1 + 18 + 3) k3 convs on the voxel grid
    out['field_heads'] = 2 * (19 * 22 * 27 * vox) / 1e9
    # BEV trunk R18-ish 80->160 3 stages @128x128 + FPN + 6 SeparateHeads
    bev = 80 * 160 * 9 * 128 * 128 + 2 * (160 * 160 * 9 * 128 * 128) \
        + 160 * 320 * 9 * 64 * 64 * 2 + 320 * 640 * 9 * 32 * 32 * 2
    heads = 6 * (64 * 64 * 9 * 128 * 128 * 8)
    out['bev_trunk_heads'] = 2 * (bev + heads) / 1e9
    return out


def main():
    dispatch_us = measure_dispatch_overhead() * 1e6
    print(f'eager per-op dispatch overhead (CPU, 1-elem): '
          f'{dispatch_us:.1f} us/op')

    print('profiling torchvision resnet50 @ 6x3x256x704 (CPU, ~1-2 min)...',
          flush=True)
    r50_flops, r50_ops, r50_ew_bytes = profile_resnet50()
    print(f'resnet50 encoder: {r50_flops/1e9:.0f} GFLOP, {r50_ops} aten ops, '
          f'{r50_ew_bytes/1e9:.2f} GB eager elementwise traffic (fp16)')

    stages = stage_flops()
    for k, v in stages.items():
        print(f'  {k:18s}: {v:7.1f} GFLOP')
    total_gflop = r50_flops / 1e9 + sum(stages.values())
    print(f'TOTAL compute: {total_gflop/1e3:.2f} TFLOP/frame '
          f'(bench.py estimate: 0.4)')

    # ops/frame: the full model is ~3x the encoder's op count (encoder +
    # FPN/heads + Unet3D + rendering/grid_sample chains + det head; the
    # rendering math alone is ~60 elementwise ops on (6,86,64,176) tensors)
    ops_frame_lo, ops_frame_hi = 2 * r50_ops, 4 * r50_ops
    # A100 kernel launch ~3-8 us under python eager (dispatch measured above
    # is the python floor; CUDA adds launch latency). Use dispatch..8us.
    launch_lo_ms = ops_frame_lo * dispatch_us * 1e-3
    launch_hi_ms = ops_frame_hi * 8e-3
    print(f'eager per-frame op count bracket: {ops_frame_lo}-{ops_frame_hi} '
          f'-> launch/dispatch {launch_lo_ms:.1f}-{launch_hi_ms:.1f} ms')

    # bandwidth: weights+activations (bench.py: ~9 GB incl. frustum tensor
    # + gathers) + eager elementwise traffic scaled to the full model (3x
    # encoder's, same scaling as ops)
    ew_gb = 3 * r50_ew_bytes / 1e9
    hbm_ms = (9.0 + ew_gb) / 1.55  # GB / (GB/ms)  [1.55 TB/s = 1.55 GB/ms]
    # conv tensor-core time at 30-50% MFU (A100 312 TFLOP/s fp16)
    mfu_ms_lo = total_gflop / 1e3 / (312 * 0.50) * 1e3
    mfu_ms_hi = total_gflop / 1e3 / (312 * 0.30) * 1e3
    fast = max(mfu_ms_lo, hbm_ms) + launch_lo_ms
    slow = max(mfu_ms_hi, hbm_ms) + launch_hi_ms
    print(f'HBM floor incl. eager elementwise: {hbm_ms:.1f} ms; '
          f'conv MFU band: {mfu_ms_lo:.1f}-{mfu_ms_hi:.1f} ms')
    print(f'A100 frame-time bracket: {fast:.0f}-{slow:.0f} ms '
          f'-> {1e3/slow:.1f}-{1e3/fast:.1f} fps')
    print(json.dumps({
        'dispatch_us_per_op': round(dispatch_us, 2),
        'encoder_gflop': round(r50_flops / 1e9, 1),
        'encoder_aten_ops': r50_ops,
        'total_tflop_frame': round(total_gflop / 1e3, 3),
        'a100_fps_bracket': [round(1e3 / slow, 2), round(1e3 / fast, 2)],
        'bench_denominator_fps': 5.0,
    }))


if __name__ == '__main__':
    main()
