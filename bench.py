"""Headline benchmark: flagship 6-cam 256x704 multi-task inference fps/chip.

Runs the flagship forward producing ALL FOUR task outputs — Occ3D occupancy
(occ_logits/occ_density), LiDAR segmentation (pts_logits), BEV rendering
(bev_seg/height/rgb) and detection (device-side CenterPoint decode) — on
synthetic nuScenes-shaped inputs, batch 1, one chip, and prints ONE JSON line.

Round-4 graph change (the 6.4 -> 10.9 fps step): the headline graph no longer
returns the per-camera rgb/seg/depth renders, so XLA dead-code-eliminates the
camera ray gather + compositing + x4 upsample (~68 ms/frame of take-bound
gather). Those renders feed only training losses and --vis dumps — no metric
reads them (reference: val consumes seg outputs only, base_exp.py:634-658;
test consumes get_bboxes only, :665-677; renders appear in loss/vis code
:419-513,678-708). The eager reference computes them unconditionally
(base_vampire2.py:637-649) because eager torch cannot skip dead outputs; a
jitted-graph framework can — this is an architecture dividend, not a
benchmark trim. `full_render_fps` (the r1-r3 headline graph, camera renders
included) is measured and reported alongside in the same run; serving exposes
the same choice via InferenceServer(outputs=...), perf probe:
scripts/perf_r4_metrics_only.py.

vs_baseline denominator — since round 5 the headline `vs_baseline` derives
from the CALIBRATED A100 bracket (BASELINE.md "Denominator calibration"):
geometric midpoint 36.2 fps of [20.3, 64.7]. The original round-1 derivation
below produced the 5.0 fps figure now demoted to `vs_baseline_legacy`
(the reference publishes NO throughput numbers anywhere, BASELINE.md; an
A100 cannot be measured in this environment, so both denominators are
engineering estimates — the bracket is the measured-anchor one):

  Compute floor (fp16 MACs x2, per frame):
    ResNet-50 @ 6x256x704: 3.86 GMAC @224^2 x (256*704)/(224*224)=3.59 x6
                                                  = 83 GMAC  ~ 166 GFLOP
    SECONDFPN (4 deconv scales -> 512ch @64x176) x6     ~ 30 GFLOP
    depth/context heads (512->86, 512->16 @64x176) x6   ~ 12 GFLOP
    Unet3D inpaintor (2x Hourglass3D, 16ch, 20x256x256):
      ~8 full-res-equivalent 3^3 convs x 9.1 GMAC       ~ 145 GFLOP
    BEV det trunk (R18@160ch, 80x128x128) + heads       ~ 40 GFLOP
    total                                               ~ 0.4 TFLOP/frame
    A100 SXM fp16 tensor peak 312 TFLOP/s; at a generous 30% MFU for a
    conv/gather-mixed model: ~4.2 ms/frame.

  Bandwidth floor (fp16, per frame; A100 HBM2e 1.55 TB/s):
    frustum outer-product tensor (6,16,86,64,176), materialized by the
    reference (base_vampire2.py:553): write+read            ~ 0.38 GB
    three 3D grid_samples (lift 7.9M q, rays 5.8M q x 38ch, occ 0.6M q):
      gathered bytes + coords                              ~ 1.2 GB
    ResNet/FPN/Unet3D activation reads+writes              ~ 6-8 GB
    total ~ 9 GB -> ~6 ms/frame at 100% HBM efficiency.

  Speed-of-light on A100 is therefore ~10 ms (~100 fps). Torch-eager
  research code on a gather-heavy model of this shape typically realizes
  5-15% of that (kernel-launch overhead, unfused elementwise chains,
  strided gathers): 70-200 ms/frame -> 5-14 fps. We take the LOW end,
  5.0 fps, as the denominator — the estimate most favorable to the
  reference; the driver's >=4x-A100 target then reads vs_baseline >= 4.0.
"""
import json
import time

import numpy as np


def _require_device(timeout_s: float = 600.0):
    """Fail fast (instead of hanging forever) if the TPU relay is down:
    device init on the axon backend retries in a sleep loop indefinitely
    when the pool grants no chip, which would hang the whole bench."""
    import threading
    got = []

    def probe():
        import jax
        got.append(jax.devices())

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not got:
        import sys
        print(f'bench: TPU device init did not complete within '
              f'{timeout_s:.0f}s (relay down / no grant) — aborting',
              file=sys.stderr, flush=True)
        import os
        os._exit(2)


def main():
    _require_device()
    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.data.synthetic import synthetic_batch
    from vampire_tpu.models.vampire import Vampire
    from vampire_tpu.models.centerpoint_head import decode_preds
    from vampire_tpu.training.train_step import split_mats

    cfg = flagship_config()
    model = Vampire(cfg.backbone, cfg.head, dtype=jnp.bfloat16)
    batch = synthetic_batch(cfg, batch_size=1, n_points=cfg.train.max_points,
                            seed=0, mode='val')
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    mats = split_mats(batch)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), batch['imgs'], mats, points=batch['points'],
        train=False))()

    def make_fwd(with_camera_renders):
        @jax.jit
        def fwd(v, imgs, mats, pts):
            # the explicit camera_renders flag additionally skips the
            # corner-table build that the point query would otherwise keep
            # alive through DCE (field.py _query_points direct-sampler path)
            fo, preds = model.apply(v, imgs, mats, points=pts, train=False,
                                    camera_renders=with_camera_renders)
            dec = decode_preds(preds, cfg.head)
            outs = (fo['occ_logits'], fo['occ_density'], fo['pts_logits'],
                    fo['bev_seg_logits_preds'], fo['bev_height_preds'],
                    fo['bev_rgb_preds'],
                    [(d['bboxes'], d['scores'], d['labels'], d['valid'])
                     for d in dec])
            if with_camera_renders:
                outs += (fo['depth_preds'], fo['seg_logits_preds'],
                         fo['rgb_preds'])
            # fold every output into one scalar so timing needs a single host
            # fetch (fetch roundtrips through the axon tunnel are ~30ms each)
            checksum = sum(jnp.sum(x.astype(jnp.float32))
                           for x in jax.tree.leaves(outs))
            return checksum
        return fwd

    fwd = make_fwd(with_camera_renders=False)

    def sync(out):
        # block_until_ready is unreliable on the axon backend; fetch forces
        # the step to complete
        for x in jax.tree.leaves(out):
            np.asarray(x)

    args = (variables, batch['imgs'], mats, batch['points'])
    # Throughput timing: keep a 2-deep pipeline in flight and fetch the
    # PREVIOUS frame's checksum while the next frame computes, exactly like
    # a serving loop would — the device is busy end-to-end, so total wall
    # time over N frames cannot under-report device work, while the ~25ms
    # host<->device fetch roundtrip (measured; axon tunnel) overlaps compute
    # instead of serializing with it. Inputs vary per frame.
    imgs_v = [batch['imgs'] + 0.001 * i for i in range(4)]
    for x in imgs_v:
        np.asarray(x.ravel()[:1])

    def pipelined_fps(f, n_frames=10):
        sync(f(*args))  # compile
        sync(f(*args))  # warm
        t0 = time.perf_counter()
        pending = f(variables, imgs_v[0], mats, batch['points'])
        for i in range(1, n_frames):
            nxt = f(variables, imgs_v[i % 4], mats, batch['points'])
            sync(pending)
            pending = nxt
        sync(pending)
        return n_frames / (time.perf_counter() - t0)

    fps = pipelined_fps(fwd)
    full_render_fps = pipelined_fps(make_fwd(with_camera_renders=True))

    # ---- stage attribution (VERDICT r4 #2: per-round artifact) ----------
    # Output-subset DCE attribution: jits returning different output subsets
    # of the SAME forward let XLA dead-code-eliminate the rest, so
    # subtractions yield stage costs. Since round 5 each probe is timed with
    # the K-rep in-jit method (scripts/krep.py): the graph runs K times
    # inside one jit via lax.scan with per-iteration input perturbation and
    # the cost is (T(k2)-T(k1))/(k2-k1) — the ~25-30 ms axon dispatch floor
    # cancels exactly, so small stages (encoder ~3 ms) read true device
    # time instead of the floor (ROUND5.md §1).
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.krep import krep_ms

    def perturbed(i, imgs, mats):
        m = dict(mats)
        m['sensor2ego'] = m['sensor2ego'].at[..., :3, 3].add(1e-3 * i)
        return imgs + 1e-3 * i, m

    def make_subset(keys, with_det=False):
        def probe(i, v, imgs, mats, pts):
            imgs, mats = perturbed(i, imgs, mats)
            fo, preds = model.apply(v, imgs, mats, points=pts, train=False,
                                    camera_renders=False)
            outs = [fo[k] for k in keys]
            if with_det:
                dec = decode_preds(preds, cfg.head)
                outs += [(d['bboxes'], d['scores'], d['labels'], d['valid'])
                         for d in dec]
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(outs))
        return probe

    def make_encoder_probe():
        B, N, H, W, _ = batch['imgs'].shape

        def probe(i, v, imgs, mats, pts):
            imgs, mats = perturbed(i, imgs, mats)

            def run(mdl, x):
                bk = mdl.backbone
                feats = bk._get_cam_feats(x.reshape(B * N, H, W, 3), False)
                depth = bk.mapping_along_depth(feats)
                low = bk.channel_lower(feats)
                return depth, low
            outs = model.apply(v, imgs, method=run)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(outs))
        return probe

    def timed_ms(probe):
        return krep_ms(probe, args, k1=1, k2=3, iters=3)

    stage_ms = {}
    try:
        t_enc = timed_ms(make_encoder_probe())
        t_occd = timed_ms(make_subset(['occ_density']))
        t_occ = timed_ms(make_subset(['occ_logits', 'occ_density']))
        t_pts = timed_ms(make_subset(['pts_logits']))
        t_det = timed_ms(make_subset([], with_det=True))
        t_metrics = timed_ms(make_subset(
            ['occ_logits', 'occ_density', 'pts_logits',
             'bev_seg_logits_preds', 'bev_height_preds', 'bev_rgb_preds'],
            with_det=True))
        stage_ms = {
            'encoder_fpn_depth_heads': round(t_enc, 1),
            'lift_unet3d_density_occquery': round(t_occd - t_enc, 1),
            'segconv_occ_softmax': round(t_occ - t_occd, 1),
            'tables_point_query': round(t_pts - t_occ, 1),
            'bevrender_dethead_decode': round(t_det - t_occ, 1),
            'occ_density_graph': round(t_occd, 1),
            'metrics_graph_device': round(t_metrics, 1),
            'metrics_graph_pipelined': round(1000.0 / fps, 1),
        }
    except Exception as e:  # never let attribution kill the headline
        stage_ms = {'error': str(e)}

    # single-frame latency (synced per frame, includes the ~25ms axon-tunnel
    # fetch roundtrip): reported alongside so cross-round / cross-baseline
    # comparisons stay apples-to-apples with earlier min-latency figures
    lats = []
    for i in range(6):
        t0 = time.perf_counter()
        sync(fwd(variables, imgs_v[i % 4], mats, batch['points']))
        lats.append(time.perf_counter() - t0)
    latency_ms = min(lats) * 1000.0

    # Denominator (VERDICT r4 #3): the headline ratio derives from the
    # CALIBRATED A100 bracket [20.3, 64.7] fps (BASELINE.md "Denominator
    # calibration", scripts/baseline_denominator.py — bottom-up from measured
    # FLOPs/op-counts/dispatch overhead). vs_baseline uses the bracket's
    # geometric midpoint (36.2 fps); vs_a100_bracket carries the honest
    # range; the r1-r3 series' uncalibrated 5.0 denominator is demoted to
    # vs_baseline_legacy for series comparability only.
    bracket_lo, bracket_hi = 20.3, 64.7
    a100_mid = (bracket_lo * bracket_hi) ** 0.5
    print(json.dumps({
        'metric': '6-cam 256x704 multi-task inference frames/sec/chip',
        'value': round(fps, 3),
        'unit': 'fps',
        'vs_baseline': round(fps / a100_mid, 3),
        'vs_a100_bracket': [round(fps / bracket_hi, 3),
                            round(fps / bracket_lo, 3)],
        'vs_baseline_legacy': round(fps / 5.0, 3),
        'a100_fps_bracket': [bracket_lo, bracket_hi],
        'methodology': '2-deep pipelined throughput over 10 frames '
                       '(device busy end-to-end; host fetch overlapped). '
                       'Graph returns all four task outputs (occ, lidarseg, '
                       'BEV renders, det boxes); per-camera renders '
                       '(training-supervision/vis-only outputs, no metric '
                       'reads them) are left to XLA dead-code elimination — '
                       'see full_render_fps for the r1-r3 graph with them '
                       'included. vs_baseline = fps / 36.2 (geometric mid '
                       'of the calibrated A100 bracket).',
        'full_render_fps': round(full_render_fps, 3),
        'single_frame_latency_ms': round(latency_ms, 1),
        'stage_ms': stage_ms,
    }))


if __name__ == '__main__':
    main()
