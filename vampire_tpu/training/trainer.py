"""The training system: orchestration of data, steps, eval, checkpoints.

TPU-native replacement for the reference's Lightning harness
(`VAMPIRELightningModel` + `run_cli`, base_exp.py / base_cli.py): a plain
training loop over a pjit-compiled global step with

  * orbax checkpointing (save each epoch; weights-only restore for eval,
    mirroring load_from_checkpoint(strict=False), base_cli.py:107-132);
  * EMA sidecar params (callbacks/ema.py semantics) when cfg.train.use_ema;
  * per-epoch train/val IoU reports identical in layout to
    base_exp.py:851-910;
  * eval cadence check_val_every_n_epoch=4 (base_cli.py:88);
  * scalar logging to a jsonl file (stand-in for TensorBoard; the reference
    logs per-loss scalars, base_exp.py:370-409).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import VampireConfig, LABEL_17_NAMES
from ..models.vampire import Vampire
from ..parallel.mesh import batch_pspecs
from .metrics import JaccardIndex, format_iou_report
from .train_state import TrainState, create_train_state
from .train_step import build_train_step, split_mats

DEVICE_KEYS_EXCLUDE = ('meta',)


class Trainer:
    def __init__(self, cfg: VampireConfig, workdir: str = './outputs',
                 mesh=None, lift_vectorized: Optional[bool] = None):
        from ..utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg
        self.workdir = os.path.join(workdir, cfg.train.exp_name)
        os.makedirs(self.workdir, exist_ok=True)
        if mesh is None:
            from ..parallel.mesh import default_mesh
            mesh = default_mesh()
        self.mesh = mesh
        if lift_vectorized is None:
            lift_vectorized = mesh.shape.get('cam', 1) > 1
        dtype = jnp.bfloat16 if cfg.train.compute_dtype == 'bfloat16' \
            else jnp.float32
        self.model = Vampire(cfg.backbone, cfg.head, dtype=dtype,
                             lift_vectorized=lift_vectorized)
        # the LOGICAL device count this trainer steps over (the mesh may be
        # a subset of the host's devices, cli.py --num-devices): feeds the
        # detection-loss normalization floors (reduce_mean parity)
        self.num_devices = mesh.size
        self._ckpt_mgr = None
        # rank 0 owns all log artifacts (multi-host processes would
        # interleave appends to a shared scalars.jsonl); optional TensorBoard
        # sink mirrors the reference's scalar + image logging via
        # tensorboardX (base_exp.py:370-433)
        self._log_file = None
        self._tb = None
        from ..parallel.distributed import is_main_process
        if is_main_process():
            self._log_file = open(
                os.path.join(self.workdir, 'scalars.jsonl'), 'a')
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(self.workdir, 'tb'))
            except Exception:
                pass

    # ------------------------------------------------------------------
    def init_state(self, example_batch: Dict[str, np.ndarray],
                   steps_per_epoch: int) -> TrainState:
        batch = self._to_device(example_batch)
        mats = split_mats(batch)
        variables = jax.jit(lambda: self.model.init(
            jax.random.PRNGKey(self.cfg.train.seed), batch['imgs'], mats,
            points=batch['points'], train=True))()
        pb = self.cfg.train.pretrained_backbone
        if pb:
            # reference recipe: torchvision-pretrained R50 image backbone
            # (init_cfg Pretrained, base_exp.py:73); fail loud on a bad path
            from ..utils.torch_weights import (graft_into_variables,
                                               load_torchvision_resnet)
            bp, bs = load_torchvision_resnet(
                pb, depth=self.cfg.backbone.img_backbone_depth)
            variables = graft_into_variables(jax.device_get(variables),
                                             bp, bs)
            print(f'image backbone: torchvision weights grafted from {pb}')
        else:
            print('image backbone: random init (set '
                  'train.pretrained_backbone / --pretrained-backbone for '
                  'the reference recipe)')
        state, self.tx = create_train_state(
            variables['params'], variables['batch_stats'], self.cfg.train,
            steps_per_epoch)
        return self._replicate(state)

    def _replicate(self, tree):
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P())
        if jax.process_count() == 1:
            return jax.device_put(tree, sh)
        # multi-process: device_put cannot target non-addressable devices;
        # a jitted identity with replicated out_shardings can (every process
        # passes the same host values, in SPMD lockstep)
        return jax.jit(lambda x: x, out_shardings=sh)(tree)

    def _to_device(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Local batch rows -> sharded global arrays. Multi-process runs
        assemble each process's loader block into one logical global batch
        (parallel/distributed.py; replaces the reference's DDP per-rank
        batches, base_cli.py:105)."""
        from ..parallel.distributed import make_global_batch
        arrays = {k: v for k, v in batch.items()
                  if k not in DEVICE_KEYS_EXCLUDE}
        specs = batch_pspecs(arrays)
        return make_global_batch(arrays, self.mesh, specs)

    def log_scalars(self, step: int, scalars: Dict[str, Any]):
        if self._log_file is None:     # non-main process
            return
        rec = {'step': step}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._log_file.write(json.dumps(rec) + '\n')
        self._log_file.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k != 'step':
                    self._tb.add_scalar(k, v, step)

    # ------------------------------------------------------------------
    def checkpoint_manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp
            keep = self.cfg.train.keep_checkpoints
            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.workdir, 'checkpoints')),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=None if keep == 0 else keep))
        return self._ckpt_mgr

    def save_checkpoint(self, state: TrainState, epoch: int):
        """Async: returns as soon as orbax has snapshotted the arrays; the
        write overlaps the next epoch (fit/restore wait before depending on
        it)."""
        import orbax.checkpoint as ocp
        mgr = self.checkpoint_manager()
        mgr.save(epoch, args=ocp.args.StandardSave(
            dict(params=state.params, batch_stats=state.batch_stats,
                 opt_state=state.opt_state, step=state.step,
                 ema_params=state.ema_params)))

    def restore_checkpoint(self, state: TrainState,
                           step: Optional[int] = None,
                           weights_only: bool = False) -> TrainState:
        import orbax.checkpoint as ocp
        mgr = self.checkpoint_manager()
        mgr.wait_until_finished()   # an async save may still be in flight
        step = step if step is not None else mgr.latest_step()
        tpl = dict(params=state.params, batch_stats=state.batch_stats,
                   opt_state=state.opt_state, step=state.step,
                   ema_params=state.ema_params)
        restored = mgr.restore(step, args=ocp.args.StandardRestore(tpl))
        if weights_only:
            # the EMA sidecar IS weights: without it, --use-ema eval would
            # score the fresh-init EMA copy (base_cli.py loads the EMA .pth)
            new = state.replace(params=restored['params'],
                                batch_stats=restored['batch_stats'],
                                ema_params=restored.get('ema_params'))
        else:
            new = state.replace(**restored)
        return self._replicate(new)

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader=None,
            state: Optional[TrainState] = None,
            log_every: int = 50, image_every: int = 500,
            resume: bool = True,
            finetune_from: Optional[int] = None) -> TrainState:
        """Train loop.

        resume: auto-restore the latest full checkpoint (params + opt state +
            step) from this workdir and continue at the next epoch — the
            crash-recovery path the reference leaves commented out
            (base_cli.py:134).
        finetune_from: checkpoint index whose *weights only* seed a fresh run
            (optimizer state and schedule restart), mirroring the reference's
            `--ckpt_path` fit behavior (base_cli.py:130-136,
            load_from_checkpoint then fit-from-scratch).
        """
        cfg = self.cfg
        steps_per_epoch = len(train_loader)
        if state is None:
            first = next(iter(train_loader))
            state = self.init_state(first, steps_per_epoch)
        elif not hasattr(self, 'tx'):
            # state built elsewhere (e.g. restored out-of-band): rebuild the
            # optimizer transform this Trainer will step with
            from .train_state import make_optimizer
            self.tx = make_optimizer(cfg.train, steps_per_epoch, state.params)
        start_epoch = 0
        if finetune_from is not None:
            state = self.restore_checkpoint(state, step=finetune_from,
                                            weights_only=True)
            if state.ema_params is not None:
                # fresh-run semantics: EMA restarts from the loaded weights
                state = state.replace(
                    ema_params=jax.tree.map(jnp.copy, state.params))
            print(f'fine-tuning from checkpoint {finetune_from} '
                  '(weights only, fresh optimizer)')
        elif resume:
            latest = self.checkpoint_manager().latest_step()
            if latest is not None:
                state = self.restore_checkpoint(state, step=latest)
                start_epoch = latest + 1
                print(f'resuming from checkpoint {latest} '
                      f'(epoch {start_epoch}, step {int(state.step)})')
        from .train_step import init_train_confusion
        train_step = jax.jit(build_train_step(self.model, cfg, self.tx,
                                              self.num_devices,
                                              with_metrics=True),
                             donate_argnums=(0, 2))
        # host-side step counter: int(state.step) on the just-dispatched
        # (donated) output would block on the device every iteration and
        # serialize host dispatch — sync once here instead
        step_no = int(state.step)
        for epoch in range(start_epoch, cfg.train.max_epochs):
            t_ep = time.time()
            conf = self._replicate(init_train_confusion(cfg))
            for it, batch in enumerate(train_loader):
                dev_batch = self._to_device(batch)
                state, logs, conf = train_step(state, dev_batch, conf)
                step_no += 1
                if it % log_every == 0:
                    logs = jax.device_get(logs)
                    self.log_scalars(step_no, logs)
                    print(f'epoch {epoch} it {it}/{steps_per_epoch} '
                          f"loss {float(logs['total_loss']):.4f}", flush=True)
                if image_every and step_no % image_every == 0:
                    try:
                        self.log_images(state, dev_batch)
                    except Exception as e:  # vis must never kill training
                        print(f'log_images failed: {e}')
            print(f'epoch {epoch} done in {time.time() - t_ep:.1f}s')
            self._report_train_iou(conf, step_no)
            self.save_checkpoint(state, epoch)
            if val_loader is not None and \
                    (epoch + 1) % cfg.train.check_val_every_n_epoch == 0:
                self.log_scalars(step_no, self.validate(val_loader, state))
        self.checkpoint_manager().wait_until_finished()  # flush async saves
        return state

    def _report_train_iou(self, conf, step: int) -> None:
        """Epoch-end train IoU reports (base_exp.py:851-878): per-class
        lidarseg IoU over classes 1..16 and occupancy IoU over 0..16,
        accumulated on device during training, reported and reset here."""
        from ..parallel.distributed import is_main_process
        if not is_main_process():
            return
        cfg = self.cfg
        conf_seg, conf_occ = jax.device_get(conf)
        seg = JaccardIndex(17, ignore_index=0)
        seg.update_confusion(conf_seg)
        iou = seg.compute()[1:]
        miou = float(np.nanmean(iou))
        print(format_iou_report(iou, LABEL_17_NAMES[1:-1], 'Training'))
        print(f'Current training miou is {miou * 100:.3f}')
        occm = JaccardIndex(cfg.backbone.num_classes)
        occm.update_confusion(conf_occ)
        occ = occm.compute()[:-1]
        occ_miou = float(np.nanmean(occ))
        print(format_iou_report(occ, LABEL_17_NAMES[:-1],
                                'Training occupancy'))
        print(f'Current train occupancy miou is {occ_miou * 100:.3f}')
        self.log_scalars(step, {'train/mIoU': miou,
                                'train/occ_mIoU': occ_miou})

    def log_images(self, state: TrainState, dev_batch) -> None:
        """Periodic image panels (base_exp.py:419-513): rgb/seg/depth renders
        and BEV maps written as PNGs under <workdir>/panels/."""
        from PIL import Image
        from ..utils.vis import (tile_cameras, visualize_depth,
                                 visualize_semantic)
        from .losses import denormalize_images
        model = self.model
        if not hasattr(self, '_panel_step'):
            def panel_step(params, batch_stats, batch):
                mats = split_mats(batch)
                fo, _ = model.apply(
                    {'params': params, 'batch_stats': batch_stats},
                    batch['imgs'][:1], {k: v[:1] for k, v in mats.items()},
                    points=batch['points'][:1], train=False, lidar_seg=True)
                return dict(depth=fo['depth_preds'][0],
                            seg=jnp.argmax(fo['seg_logits_preds'][0], -1),
                            rgb=fo['rgb_preds'][0],
                            bev_seg=jnp.argmax(fo['bev_seg_logits_preds'][0],
                                               -1),
                            bev_height=fo['bev_height_preds'][0])
            self._panel_step = jax.jit(panel_step)
        out = jax.device_get(self._panel_step(state.params, state.batch_stats,
                                              dev_batch))
        step = int(state.step)
        d = os.path.join(self.workdir, 'panels')
        os.makedirs(d, exist_ok=True)
        gt_imgs = dev_batch['imgs']
        if gt_imgs.ndim == 6:        # multi-sweep batch: panel the key frame
            gt_imgs = gt_imgs[:, 0]
        gt = np.asarray(denormalize_images(gt_imgs[:1]))[0]
        panels = {
            'rgb_gts': tile_cameras((np.clip(gt, 0, 1) * 255).astype(np.uint8)),
            'rgb_preds': tile_cameras(
                (np.clip(out['rgb'], 0, 1) * 255).astype(np.uint8)),
            'depth_preds': tile_cameras(np.stack(
                [visualize_depth(x) for x in out['depth']])),
            'seg_preds': tile_cameras(np.stack(
                [visualize_semantic(x) for x in out['seg']])),
            'bev_seg': visualize_semantic(out['bev_seg']),
            'bev_height': visualize_depth(out['bev_height'], -5.0, 3.0),
        }
        for name, img in panels.items():
            Image.fromarray(img).save(os.path.join(d, f'{step:07d}_{name}.png'))
            if self._tb is not None:
                self._tb.add_image(name, img, step, dataformats='HWC')

    def validate(self, val_loader, state: TrainState,
                 use_ema: Optional[bool] = None) -> Dict[str, float]:
        """Lidarseg + occupancy IoU over the val split (base_exp.py:634-663,
        880-910). Confusion matrices are computed on device; only two (C, C)
        arrays come back per batch."""
        from .train_step import build_metric_eval_step
        cfg = self.cfg
        params = self._eval_params(state, use_ema)
        # cache the jitted step: a fresh closure per validate() call would
        # miss jax's jit cache and re-trace/compile every validation epoch
        if not hasattr(self, '_metric_eval_step'):
            self._metric_eval_step = jax.jit(
                build_metric_eval_step(self.model, cfg))
        eval_step = self._metric_eval_step
        val_iou = JaccardIndex(17, ignore_index=0)
        occ_iou = JaccardIndex(cfg.backbone.num_classes)
        for batch in val_loader:
            dev = self._to_device(batch)
            conf_seg, conf_occ = jax.device_get(
                eval_step(params, state.batch_stats, dev))
            val_iou.update_confusion(conf_seg)
            occ_iou.update_confusion(conf_occ)
        iou = val_iou.compute()[1:]
        miou = float(np.nanmean(iou))
        occ = occ_iou.compute()[:-1]
        occ_miou = float(np.nanmean(occ))
        from ..parallel.distributed import is_main_process
        if is_main_process():
            print(format_iou_report(iou, LABEL_17_NAMES[1:-1], 'Validation'))
            print(f'Current val miou is {miou * 100:.3f}')
            print(format_iou_report(occ, LABEL_17_NAMES[:-1],
                                    'Validation occupancy'))
            print(f'Current val occupancy miou is {occ_miou * 100:.3f}')
        return {'val/mIoU': miou, 'val/occ_mIoU': occ_miou}

    def _eval_params(self, state: TrainState, use_ema: Optional[bool] = None):
        """Params used for eval: the EMA sidecar when the run trained with
        EMA (the reference evaluates the EMA .pth, ema.py:101-117)."""
        if use_ema is None:
            use_ema = self.cfg.train.use_ema
        if use_ema and state.ema_params is not None:
            return state.ema_params
        return state.params

    def test(self, test_loader, state: TrainState, vis: bool = False,
             use_ema: Optional[bool] = None) -> None:
        """Detection eval: device decode + host circle NMS + submission
        (base_exp.py:665-746, 912-929). With vis=True, dump per-frame pickles
        of rendered rgb/depth/seg/bev/occ instead (base_exp.py:678-708)."""
        from ..evaluation.det_evaluator import (DetNuscEvaluator,
                                                apply_circle_nms)
        cfg = self.cfg
        params = self._eval_params(state, use_ema)
        if vis:
            self._test_vis(test_loader, state, params=params)
            return
        from ..parallel.distributed import (host_local_rows, is_main_process,
                                            process_allgather)
        model = self.model

        # det-only step: build_eval_step also returns occ_logits
        # (B,200,200,16,K fp32 ~ 46 MB/sample) + pts_logits, which test()
        # never reads — fetch only the decoded detections
        def det_step(params, batch_stats, batch):
            mats = split_mats(batch)
            _, preds = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                batch['imgs'], mats, points=batch['points'], train=False,
                camera_renders=False)
            from ..models.centerpoint_head import decode_preds
            return dict(det=decode_preds(preds, cfg.head))
        if not hasattr(self, '_det_step'):
            self._det_step = jax.jit(det_step)
        eval_step = self._det_step
        results, metas = [], []
        for batch in test_loader:
            dev = self._to_device(batch)
            # each process fetches ITS rows (its loader block); results are
            # all-gathered below (torch_dist.all_gather_object parity,
            # base_exp.py:920-927)
            out = host_local_rows(eval_step(params, state.batch_stats, dev),
                                  self.mesh)
            B = batch['imgs'].shape[0]  # local (host) rows
            sv = np.asarray(batch.get('sample_valid', np.ones(B, bool)))
            for b in range(B):
                if not sv[b]:
                    continue  # padding row of the final partial batch
                results.append(apply_circle_nms(out['det'], cfg.head, b))
                metas.append(dict(
                    token=batch['meta']['token'][b],
                    ego2global_rotation=batch['meta']['ego2global_rotation'][b],
                    ego2global_translation=batch['meta'][
                        'ego2global_translation'][b]))
        pairs = process_allgather((results, metas))
        results = [r for rs, _ in pairs for r in rs]
        metas = [m for _, ms in pairs for m in ms]
        if not is_main_process():
            return
        evaluator = DetNuscEvaluator(
            class_names=[c for t in cfg.head.tasks for c in t],
            output_dir=os.path.join(self.workdir, 'detection_submit'),
            data_root=cfg.train.data_root,
            version=cfg.train.nusc_version)
        # devkit-free fallback GT (in-repo NDS/mAP) from the loader's infos
        gt = getattr(test_loader, 'dataset', None)
        gt = gt.global_gt_boxes() if gt is not None else None
        evaluator.evaluate(results, metas, gt_boxes=gt)

    def _test_vis(self, loader, state: TrainState, params=None) -> None:
        """--vis dumps (base_exp.py:678-708): per-frame pickles of the input
        tile, rendered depth/semantics, BEV maps and occ prediction.
        `params` lets test() pass the EMA weights it evaluates with."""
        if params is None:
            params = state.params
        import pickle
        from ..utils.vis import (tile_cameras, visualize_depth,
                                 visualize_semantic)
        cfg = self.cfg
        model = self.model

        def vis_step(params, batch_stats, batch):
            mats = split_mats(batch)
            fo, preds = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                batch['imgs'], mats, points=batch['points'], train=False)
            return dict(depth_preds=fo['depth_preds'],
                        seg_preds=jnp.argmax(fo['seg_logits_preds'], -1),
                        bev_seg=jnp.argmax(fo['bev_seg_logits_preds'], -1),
                        bev_height=fo['bev_height_preds'],
                        bev_density=jnp.sum(fo['bev_density'], axis=1),
                        occ=jnp.argmax(fo['occ_logits']
                                       * fo['occ_density'][..., None], -1))
        step = jax.jit(vis_step)
        vis_dir = os.path.join(self.workdir, 'visualization')
        os.makedirs(vis_dir, exist_ok=True)
        from ..training.losses import denormalize_images
        idx = 0
        for batch in loader:
            dev = self._to_device(batch)
            out = jax.device_get(step(params, state.batch_stats, dev))
            vis_imgs = dev['imgs']
            if vis_imgs.ndim == 6:   # multi-sweep batch: dump the key frame
                vis_imgs = vis_imgs[:, 0]
            rgb = np.asarray(denormalize_images(vis_imgs))
            sv = np.asarray(batch.get('sample_valid',
                                      np.ones(rgb.shape[0], bool)))
            for b in range(rgb.shape[0]):
                if not sv[b]:
                    continue  # padding row of the final partial batch
                d = dict(
                    batch_idx=idx,
                    lidar_token=batch['meta'].get('lidar_token', [''] *
                                                  rgb.shape[0])[b],
                    input_image=tile_cameras(
                        (rgb[b] * 255).astype(np.uint8)),
                    camera_depth=tile_cameras(np.stack(
                        [visualize_depth(x) for x in out['depth_preds'][b]])),
                    camera_semantics=tile_cameras(np.stack(
                        [visualize_semantic(x) for x in out['seg_preds'][b]])),
                    bev_semantics=visualize_semantic(out['bev_seg'][b]),
                    bev_density=visualize_depth(out['bev_density'][b],
                                                vmin=0, vmax=10),
                    occ=out['occ'][b],
                )
                with open(os.path.join(vis_dir, f'{idx}.pkl'), 'wb') as f:
                    pickle.dump(d, f)
                idx += 1

    def predict(self, loader, state: TrainState,
                use_ema: Optional[bool] = None) -> None:
        """Test-split submission: detection json + per-token lidarseg bins
        (base_exp.py:800-849, base_cli.py:112-129)."""
        from ..evaluation.det_evaluator import (DetNuscEvaluator,
                                                apply_circle_nms)
        from ..evaluation.lidarseg import lidarseg_labels, write_submission
        cfg = self.cfg
        model = self.model
        eval_params = self._eval_params(state, use_ema)

        def predict_step(params, batch_stats, batch):
            mats = split_mats(batch)
            fo, preds = model.apply(
                {'params': params, 'batch_stats': batch_stats},
                batch['imgs'], mats, points=batch['points'], train=False,
                camera_renders=False)
            from ..models.centerpoint_head import decode_preds
            return dict(det=decode_preds(preds, cfg.head),
                        pts_logits=fo['pts_logits'])
        from ..parallel.distributed import (host_local_rows, is_main_process,
                                            process_allgather)
        step = jax.jit(predict_step)
        results, metas, seg_results = [], [], []
        for batch in loader:
            dev = self._to_device(batch)
            out = host_local_rows(step(eval_params, state.batch_stats, dev),
                                  self.mesh)
            B = batch['imgs'].shape[0]  # local (host) rows
            sv = np.asarray(batch.get('sample_valid', np.ones(B, bool)))
            for b in range(B):
                if not sv[b]:
                    continue  # padding row of the final partial batch
                results.append(apply_circle_nms(out['det'], cfg.head, b))
                metas.append(dict(
                    token=batch['meta']['token'][b],
                    ego2global_rotation=batch['meta']['ego2global_rotation'][b],
                    ego2global_translation=batch['meta'][
                        'ego2global_translation'][b]))
                n = int(np.asarray(batch['num_points'][b]))
                seg_results.append(
                    (batch['meta']['lidar_token'][b],
                     lidarseg_labels(out['pts_logits'][b], n)))
        gathered = process_allgather((results, metas, seg_results))
        results = [r for rs, _, _ in gathered for r in rs]
        metas = [m for _, ms, _ in gathered for m in ms]
        seg_results = [s for _, _, ss in gathered for s in ss]
        if not is_main_process():
            return
        submit_dir = os.path.join(self.workdir, 'lidarseg_submit')
        write_submission(seg_results, submit_dir, split='test')
        evaluator = DetNuscEvaluator(
            class_names=[c for t in cfg.head.tasks for c in t],
            output_dir=os.path.join(self.workdir, 'detection_submit'),
            data_root=cfg.train.data_root,
            version='v1.0-test')
        evaluator.format_bbox(results, metas)
