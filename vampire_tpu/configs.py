"""Default configuration for the flagship VAMPIRE model and its ablations.

Mirrors the module-level config constants of the reference
(`src/exps/nuscenes/base_exp.py:29-224`), re-expressed as typed dataclasses.
All values are the flagship `vampire2_r50_256x704_24e_lss_inpaintor_depth_semantic`
defaults unless noted.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Image / augmentation configuration (base_exp.py:29-38, 93-120)
# ---------------------------------------------------------------------------

H, W = 900, 1600
FINAL_DIM: Tuple[int, int] = (256, 704)
RESIZE_LIM: Tuple[float, float] = (0.386, 0.55)
SAMPLE_FACTOR = 4

IMG_MEAN = (123.675, 116.28, 103.53)  # RGB order after BGR->RGB (to_rgb=True)
IMG_STD = (58.395, 57.12, 57.375)

CAM_NAMES = (
    'CAM_FRONT_LEFT', 'CAM_FRONT', 'CAM_FRONT_RIGHT',
    'CAM_BACK_LEFT', 'CAM_BACK', 'CAM_BACK_RIGHT',
)


@dataclasses.dataclass(frozen=True)
class IdaAugConfig:
    """Image-space data augmentation (base_exp.py:93-111)."""
    resize_lim: Tuple[float, float] = RESIZE_LIM
    final_dim: Tuple[int, int] = FINAL_DIM
    rot_lim: Tuple[float, float] = (0.0, 0.0)
    H: int = H
    W: int = W
    rand_flip: bool = False
    bot_pct_lim: Tuple[float, float] = (0.0, 0.0)
    cams: Tuple[str, ...] = CAM_NAMES
    n_cams: int = 6


@dataclasses.dataclass(frozen=True)
class BdaAugConfig:
    """BEV-space data augmentation (base_exp.py:113-120)."""
    rot_lim: Tuple[float, float] = (0.0, 0.0)
    scale_lim: Tuple[float, float] = (1.0, 1.0)
    flip_dx_ratio: float = 0.0
    flip_dy_ratio: float = 0.0


# ---------------------------------------------------------------------------
# Field backbone configuration (base_exp.py:40-92)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """Config of the image->field backbone (reference backbone_conf, base_exp.py:40-92)."""
    x_bound_seg: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    y_bound_seg: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    z_bound_seg: Tuple[float, float, float] = (-5.0, 3.0, 0.4)
    x_bound_det: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    y_bound_det: Tuple[float, float, float] = (-51.2, 51.2, 0.4)
    z_bound_det: Tuple[float, float, float] = (-1.0, 3.0, 0.4)
    d_bound: Tuple[float, float, float] = (2.0, 70.4, 0.8)
    final_dim: Tuple[int, int] = FINAL_DIM
    density_mode: str = 'sdf'       # 'sdf' -> ModifyLaplaceDensity, 'naive' -> sigmoid
    sdf_bias: float = -1.0
    cat_pos: bool = True
    cat_seg: bool = False
    mid_channels: int = 16
    output_channels: int = 80
    downsample_factor: int = SAMPLE_FACTOR
    upsample_factor: int = SAMPLE_FACTOR
    num_classes: int = 18           # semantic classes incl. 'other'(0) and 'free'(17)
    # image backbone: ResNet-50, out_indices [0,1,2,3] (base_exp.py:64-74)
    img_backbone_depth: int = 50
    img_backbone_out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    # image neck: SECONDFPN (base_exp.py:75-89)
    img_neck_in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    img_neck_upsample_strides: Tuple[float, ...] = (0.5, 1, 2, 4)
    img_neck_out_channels: Tuple[int, ...] = (128, 128, 128, 128)
    # which field backbone: 'vampire2' | 'lss' | 'lss_inpaintor' | 'bilinear'
    variant: str = 'vampire2'
    # Occ3D grid (base_vampire2.py:295-312)
    occ_pc_range: Tuple[float, ...] = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)
    occ_voxel_size: Tuple[float, float, float] = (0.4, 0.4, 0.4)
    occ_grid: Tuple[int, int, int] = (200, 200, 16)
    # Block-compacted lifting (TPU perf): gather only the top-K live 8x8
    # (Y, X) voxel blocks per camera instead of all Z*Y*X queries. Measured
    # worst case over 3 camera rigs x the full reference bda range: 208 of
    # 1024 blocks hold any valid query (a <=120deg FOV wedge of the 102.4m
    # square + boundary blocks); K=264 keeps a 1.27x margin (the repo
    # standard is >=25% headroom, tests/test_lift.py; K=232 measured
    # another -3.4 ms but breaches it — ROUND5.md job38: occ_density block
    # 45.7 / 39.8 ms at K=288 / 232)
    # (tests/test_lift.py::test_flagship_block_coverage_margin asserts it,
    # and field._lift_compact sows a 'diagnostics' counter of dropped live
    # blocks so out-of-family rigs are detectable). Blocks beyond K would
    # degrade gracefully — the voxel simply loses that camera's contribution
    # in the masked mean, exactly as if out of view. 0 disables (dense
    # gather over the full grid).
    lift_block: int = 8
    lift_block_topk: int = 264
    # Lift gather table keying (round 5, ROUND5.md §6):
    #   'fused'  — (d0,y0,x0)-keyed corner table, 1M rows/144 MB (HBM).
    #   'pixtab' — (y0,x0)-keyed pixel table, 11.5k rows/9.4 MB (VMEM-
    #              sized), z interpolation as a post-gather one-hot
    #              contraction over each pixel's depth profile.
    #   'auto'   — fused for eval-mode forwards, pixtab for train-mode.
    # Chip-measured at flagship shapes (after the round-5 unbatching +
    # block-major-geometry fixes): occ_density block TIES (43.3 vs
    # 43.4 ms), metrics graph slightly favors fused (54.8 vs 57.3 ms),
    # train step ties (520.8 vs 522.9 ms/step). Default 'fused' keeps one
    # production path; 'pixtab' trades nothing measurable in training and
    # saves 135 MB of per-camera table HBM — prefer it for batch>1 or
    # memory-tight serving. Both are the same math: pixtab is bit-exact vs
    # the fp32 reference sampler on bf16 inputs; fused differs by ~1e-8
    # (reassociation).
    lift_sampler: str = 'fused'
    # gather/reduce chunk (queries per lax.map step) of the lift samplers;
    # 0 = sampler default (fused 65536, pixtab 8192). Recorded NEGATIVE
    # (ROUND5.md job34/37): the single-camera micro strongly favors small
    # chunks (fused 7.53 ms at 4096 vs 9.22 at 65536), but IN-MODEL the
    # occ_density block is 43.7 vs 40.6 ms — the fusion context inverts the
    # micro, so the default stays 0 and this knob exists for re-measuring.
    lift_chunk: int = 0
    # Lane-aligned fused-field table rows: pad the fused channels with zeros
    # so table rows are whole 128-lane tiles (e.g. 32 -> 8*32 = 256 ch =
    # 512 B rows vs the natural C = 1+K+3 = 22 -> 352 B = 2.75 tiles).
    # Exact: pad channels are zero and sliced off after the weighted sum
    # (tests/test_sampling.py::test_padded_table_sampling_bit_exact).
    # DEFAULT OFF: isolated build+take measured ~10% faster aligned
    # (scripts/perf_r3_alignment.py), but the full model is NEUTRAL (6.428
    # vs 6.403 fps, within run noise) — the +45% table bytes offset the
    # alignment win — and the pad grows the HBM-resident table 444->645 MB,
    # which matters at batch > 1. Must be >= 1+num_classes+3 when set.
    table_pad_channels: int = 0
    # Length-sorted ray compaction: rays exit the convex field once and never
    # re-enter, so the gather-worthy samples of every ray are a prefix
    # [0, L). Rays are sorted by L descending and the sample axis is
    # processed in `ray_chunk`-sized passes, pass j touching only the first
    # ceil(ray_pass_fracs[j] * rays) sorted rays; samples beyond L sample
    # masked zeros, whose compositing contribution (the density(0) "fog" of
    # zeros-padding, identical in the reference) is added in closed
    # elementwise form, so the result is exact whenever the per-pass
    # capacities cover every ray with L > j*chunk. The default is the
    # measured worst-case coverage curve over camera rigs and the full bda
    # range +15% margin for ray_chunk=8 (tests/test_rendering.py pins the
    # margin), cutting gather rows to 0.62x.
    #
    # Applied in TRAIN-mode forwards only (field._render): the backward
    # scatter of the gather transpose runs ~4x slower per row than the
    # gather, so row compaction pays there (measured 1271 -> 1001 ms/step,
    # loss bit-identical) — while in INFERENCE the sort/unsort reorders and
    # serialized passes cost more than the saved row-latency-bound gather
    # (measured 5.46 -> 4.71 fps), so eval keeps the dense sampler. Empty
    # tuple disables compaction everywhere.
    # rematerialize each compact-sampler pass in backward (re-gather) vs
    # storing the gathered/composited residuals (more HBM, skips the
    # backward re-gather). Chip-measured at flagship shapes B=1: storing
    # residuals is 674 ms/step vs 780 with remat (-13.6%), value+grad
    # bit-identical (tests/test_rendering.py pins both paths). Default is
    # OFF (store residuals); set True to trade ~100 ms/step for HBM on
    # memory-constrained setups (larger per-device batch).
    ray_remat: bool = False
    ray_chunk: int = 8
    ray_pass_fracs: Tuple[float, ...] = (
        1.0, 1.0, 1.0, 0.98, 0.76, 0.62, 0.51, 0.43, 0.23, 0.11, 0.04)
    # Transmittance-sorted early termination (INFERENCE ray sampling):
    # `ray_et_prefix` dense chunk-passes (chunk = ray_et_chunk samples)
    # accumulate per-ray optical depth, then ONE sort orders rays by carried
    # optical depth (exited-field rays last — their tail is exact closed-form
    # fog), and the remaining passes run on shrinking static ray counts
    # ceil(frac * rays). A dropped ray's remaining contribution is bounded by
    # exp(-sd_at_drop); with the studied schedule every ray with sd < tau
    # (trans > exp(-7) ~ 1e-3) is kept on the measured worst case of the
    # scripts/ray_et_study.py scene family, so the output error is
    # < ~1e-3 of value scale (tests/test_rendering.py pins both the
    # exactness path and the error bound).
    #
    # DEFAULT OFF (empty fracs = dense sampler, bit-exact reference
    # semantics): measured on the real chip the schedule below LOSES 54
    # ms/frame (200 -> 254 ms, scripts/perf_r3_variants.py) despite cutting
    # gather rows to 0.53x — the TPU row-gather is latency-bound and ~5x
    # faster on spatially COHERENT row streams than on permuted ones
    # (scripts/perf_r3_fp8_gather.py), and the transmittance sort destroys
    # exactly that coherence, like the length-sorted compaction did for
    # inference in round 2. Kept as an opt-in for sparser-scene workloads:
    # set ray_et_fracs=(0.71, 0.47, 0.37, 0.14, 0.06, 0.03) (the
    # ray_et_study.py worst-case schedule +10% margin).
    ray_et_chunk: int = 12
    ray_et_prefix: int = 2
    ray_et_fracs: Tuple[float, ...] = ()
    ray_et_tau: float = 7.0

    @property
    def img_out_channels(self) -> int:
        return sum(self.img_neck_out_channels)

    @property
    def depth_channels(self) -> int:
        """Number of frustum depth planes D (86 for d_bound (2.0, 70.4, 0.8))."""
        import math
        lo, hi, step = self.d_bound
        return int(math.ceil((hi - lo) / step - 1e-9))

    @property
    def feat_hw(self) -> Tuple[int, int]:
        """Frustum / render grid resolution (final_dim // downsample_factor)."""
        return (self.final_dim[0] // self.downsample_factor,
                self.final_dim[1] // self.downsample_factor)

    def grid_zyx(self, which: str = 'seg') -> Tuple[int, int, int]:
        xb, yb, zb = ((self.x_bound_seg, self.y_bound_seg, self.z_bound_seg)
                      if which == 'seg' else
                      (self.x_bound_det, self.y_bound_det, self.z_bound_det))
        n = lambda b: int(round((b[1] - b[0]) / b[2]))
        return (n(zb), n(yb), n(xb))


# ---------------------------------------------------------------------------
# Detection head configuration (base_exp.py:122-217)
# ---------------------------------------------------------------------------

DET_CLASSES: Tuple[str, ...] = (
    'car', 'truck', 'construction_vehicle', 'bus', 'trailer', 'barrier',
    'motorcycle', 'bicycle', 'pedestrian', 'traffic_cone',
)

DET_TASKS: Tuple[Tuple[str, ...], ...] = (
    ('car',),
    ('truck', 'construction_vehicle'),
    ('bus', 'trailer'),
    ('barrier',),
    ('motorcycle', 'bicycle'),
    ('pedestrian', 'traffic_cone'),
)


@dataclasses.dataclass(frozen=True)
class HeadConfig:
    """Config of the CenterPoint-style detection head (reference head_conf)."""
    in_channels: int = 256
    tasks: Tuple[Tuple[str, ...], ...] = DET_TASKS
    # common_heads: name -> (out_channels, num_conv) (base_exp.py:161-165)
    common_heads: Tuple[Tuple[str, Tuple[int, int]], ...] = (
        ('reg', (2, 2)), ('height', (1, 2)), ('dim', (3, 2)),
        ('rot', (2, 2)), ('vel', (2, 2)),
    )
    num_heatmap_convs: int = 2
    share_conv_channel: int = 64
    separate_head_init_bias: float = -2.19
    separate_head_final_kernel: int = 3
    norm_bbox: bool = True
    # bev trunk: ResNet-18-ish, in 80ch, base 160, 3 stages (base_exp.py:122-132)
    bev_backbone_in_channels: int = 80
    bev_backbone_depth: int = 18
    bev_backbone_num_stages: int = 3
    bev_backbone_strides: Tuple[int, ...] = (1, 2, 2)
    bev_backbone_base_channels: int = 160
    bev_backbone_out_indices: Tuple[int, ...] = (0, 1, 2)
    # bev neck: SECONDFPN over [input] + stage outs (base_exp.py:134-137)
    bev_neck_in_channels: Tuple[int, ...] = (80, 160, 320, 640)
    bev_neck_upsample_strides: Tuple[float, ...] = (1, 2, 4, 8)
    bev_neck_out_channels: Tuple[int, ...] = (64, 64, 64, 64)
    # bbox coder (base_exp.py:167-176)
    post_center_range: Tuple[float, ...] = (-61.2, -61.2, -10.0, 61.2, 61.2, 10.0)
    max_num: int = 500
    score_threshold: float = 0.1
    out_size_factor: int = 4
    voxel_size: Tuple[float, float, float] = (0.2, 0.2, 8.0)
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    code_size: int = 9
    # train cfg (base_exp.py:178-188)
    grid_size: Tuple[int, int, int] = (512, 512, 1)
    gaussian_overlap: float = 0.1
    max_objs: int = 500
    min_radius: int = 2
    code_weights: Tuple[float, ...] = (1., 1., 1., 1., 1., 1., 1., 1., 0.5, 0.5)
    loss_bbox_weight: float = 0.25
    # test cfg (base_exp.py:190-202)
    nms_type: str = 'circle'
    nms_min_radius: Tuple[float, ...] = (4, 12, 10, 1, 0.85, 0.175)
    nms_pre_max_size: int = 1000
    nms_post_max_size: int = 83
    nms_thr: float = 0.2

    @property
    def task_num_classes(self) -> Tuple[int, ...]:
        return tuple(len(t) for t in self.tasks)

    @property
    def feature_map_size(self) -> Tuple[int, int]:
        return (self.grid_size[0] // self.out_size_factor,
                self.grid_size[1] // self.out_size_factor)


# ---------------------------------------------------------------------------
# Semantic label space (base_exp.py:218-224)
# ---------------------------------------------------------------------------

UNIQUE_LABEL: Tuple[int, ...] = tuple(range(18))
LABEL_17_NAMES: Tuple[str, ...] = (
    'other', 'barrier', 'bicycle', 'bus', 'car', 'construction_vehicle',
    'motorcycle', 'pedestrian', 'traffic_cone', 'trailer', 'truck',
    'driveable_surface', 'other_flat', 'sidewalk', 'terrain', 'manmade',
    'vegetation', 'free',
)


# ---------------------------------------------------------------------------
# Experiment / training configuration (reference VAMPIRELightningModel args +
# run_cli defaults, base_cli.py:55-92)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrainConfig:
    exp_name: str = 'vampire2_r50_256x704_24e_lss_inpaintor_depth_semantic'
    # task weights [occ, lidarseg, detection] (base_exp.py:236,256)
    task_weights: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # loss weights [depth, seg, rgb, sdf, density]; flagship = (1,1,0,0,0)
    # (vampire2..._depth_semantic.py:203-209)
    loss_weights: Tuple[float, float, float, float, float] = (1.0, 1.0, 0.0, 0.0, 0.0)
    data_root: str = 'data/nuScenes'
    # nuScenes DB version for official eval (det_evaluators.py:49,80)
    nusc_version: str = 'v1.0-trainval'
    batch_size_per_device: int = 8
    num_devices: int = 1
    basic_lr_per_img: float = 2e-4 / 8
    weight_decay: float = 1e-7
    max_epochs: int = 24
    lr_milestones: Tuple[int, ...] = (19, 23)
    lr_gamma: float = 0.1
    gradient_clip_val: float = 35.0
    check_val_every_n_epoch: int = 4
    use_ema: bool = False
    ema_decay: float = 0.9999
    seed: int = 0
    # mixed precision: bf16 compute in conv backbones, fp32 islands for
    # geometry / rendering / losses / det head (reference fp16 AMP + autocast(False))
    compute_dtype: str = 'bfloat16'
    # number of padded lidar points per sample (ragged->fixed for jit)
    max_points: int = 36864
    # max GT boxes per sample after padding
    max_gt_boxes: int = 500
    # checkpoints retained by orbax: 0 = keep every epoch (the reference
    # keeps every epoch's EMA .pth sidecar, callbacks/ema.py:101-117, so a
    # 24-epoch study can resume/eval from any epoch); N > 0 keeps the last N
    keep_checkpoints: int = 3
    # path to a torchvision resnet .pth: grafted onto the image backbone at
    # init (the reference trains from torchvision-pretrained R50,
    # init_cfg Pretrained, base_exp.py:73; this zero-egress image cannot
    # download it, so the weights file must be provided). '' = random init,
    # announced once at init_state.
    pretrained_backbone: str = ''
    # temporal sweep-frame indexes into the infos' cam_sweeps history
    # (data pipeline; nusc_det_seg_dataset.py:817-837 sweeps_idx). Non-empty
    # makes the loader emit (B, 1+len, N, ...) multi-frame batches that the
    # model fuses through the lift's masked camera mean (field.py __call__
    # multi-sweep notes; the reference's num_sweeps>1 forward is
    # NotImplementedError, base_vampire2.py:690-693).
    sweep_idxes: Tuple[int, ...] = ()

    @property
    def lr(self) -> float:
        return self.basic_lr_per_img * self.batch_size_per_device * self.num_devices


@dataclasses.dataclass(frozen=True)
class VampireConfig:
    """Top-level bundle: model + head + aug + training."""
    backbone: BackboneConfig = BackboneConfig()
    head: HeadConfig = HeadConfig()
    ida_aug: IdaAugConfig = IdaAugConfig()
    bda_aug: BdaAugConfig = BdaAugConfig()
    train: TrainConfig = TrainConfig()


def flagship_config() -> VampireConfig:
    """The flagship lss_inpaintor + depth + semantic experiment.

    The reference's flagship swaps the backbone for BaseLSSImpaintor
    (= BaseVAMPIRE2 field model with the Unet3D inpaintor, identical math)
    and masks loss weights to [1,1,0,0,0].
    """
    return VampireConfig(
        backbone=BackboneConfig(variant='lss_inpaintor'),
        train=TrainConfig(loss_weights=(1.0, 1.0, 0.0, 0.0, 0.0)),
    )


def ablation_config(name: str) -> VampireConfig:
    """Reference ablation experiments (src/exps/nuscenes/ablation/*.py)."""
    presets: Dict[str, Tuple[str, Tuple[float, ...]]] = {
        'bilinear': ('bilinear', (0., 0., 0., 0., 0.)),
        'lss': ('lss', (0., 0., 0., 0., 0.)),
        'lss_inpaintor': ('lss_inpaintor', (0., 0., 0., 0., 0.)),
        'lss_inpaintor_depth': ('lss_inpaintor', (1., 0., 0., 0., 0.)),
        'lss_inpaintor_depth_semantic': ('lss_inpaintor', (1., 1., 0., 0., 0.)),
        'vampire2': ('vampire2', (1., 1., 0., 0., 0.)),
    }
    variant, weights = presets[name]
    return VampireConfig(
        backbone=BackboneConfig(variant=variant),
        train=TrainConfig(exp_name=f'vampire2_r50_256x704_24e_{name}',
                          loss_weights=tuple(weights)),
    )
