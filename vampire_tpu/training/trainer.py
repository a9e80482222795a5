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
from ..parallel.mesh import make_mesh, batch_pspecs
from .metrics import JaccardIndex, format_iou_report
from .train_state import TrainState, create_train_state
from .train_step import build_eval_step, build_train_step, split_mats

DEVICE_KEYS_EXCLUDE = ('meta',)


class Trainer:
    def __init__(self, cfg: VampireConfig, workdir: str = './outputs',
                 mesh=None, lift_vectorized: Optional[bool] = None):
        self.cfg = cfg
        self.workdir = os.path.join(workdir, cfg.train.exp_name)
        os.makedirs(self.workdir, exist_ok=True)
        n_dev = jax.device_count()
        if mesh is None:
            cam = 2 if (n_dev % 2 == 0 and n_dev > 1) else 1
            mesh = make_mesh(dp=n_dev // cam, cam=cam)
        self.mesh = mesh
        if lift_vectorized is None:
            lift_vectorized = mesh.shape.get('cam', 1) > 1
        dtype = jnp.bfloat16 if cfg.train.compute_dtype == 'bfloat16' \
            else jnp.float32
        self.model = Vampire(cfg.backbone, cfg.head, dtype=dtype,
                             lift_vectorized=lift_vectorized)
        self.num_devices = n_dev
        self._log_file = open(os.path.join(self.workdir, 'scalars.jsonl'), 'a')
        self._ckpt_mgr = None

    # ------------------------------------------------------------------
    def init_state(self, example_batch: Dict[str, np.ndarray],
                   steps_per_epoch: int) -> TrainState:
        batch = self._to_device(example_batch)
        mats = split_mats(batch)
        variables = jax.jit(lambda: self.model.init(
            jax.random.PRNGKey(self.cfg.train.seed), batch['imgs'], mats,
            points=batch['points'], train=True))()
        state, self.tx = create_train_state(
            variables['params'], variables['batch_stats'], self.cfg.train,
            steps_per_epoch)
        return self._replicate(state)

    def _replicate(self, tree):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(tree, NamedSharding(self.mesh, P()))

    def _to_device(self, batch: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        from jax.sharding import NamedSharding
        arrays = {k: v for k, v in batch.items()
                  if k not in DEVICE_KEYS_EXCLUDE}
        specs = batch_pspecs(arrays)
        return {k: jax.device_put(jnp.asarray(v),
                                  NamedSharding(self.mesh, specs[k]))
                for k, v in arrays.items()}

    def log_scalars(self, step: int, scalars: Dict[str, Any]):
        rec = {'step': step}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._log_file.write(json.dumps(rec) + '\n')
        self._log_file.flush()

    # ------------------------------------------------------------------
    def checkpoint_manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp
            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.workdir, 'checkpoints')),
                options=ocp.CheckpointManagerOptions(max_to_keep=3))
        return self._ckpt_mgr

    def save_checkpoint(self, state: TrainState, epoch: int):
        import orbax.checkpoint as ocp
        mgr = self.checkpoint_manager()
        mgr.save(epoch, args=ocp.args.StandardSave(
            dict(params=state.params, batch_stats=state.batch_stats,
                 opt_state=state.opt_state, step=state.step,
                 ema_params=state.ema_params)))
        mgr.wait_until_finished()

    def restore_checkpoint(self, state: TrainState,
                           step: Optional[int] = None,
                           weights_only: bool = False) -> TrainState:
        import orbax.checkpoint as ocp
        mgr = self.checkpoint_manager()
        step = step if step is not None else mgr.latest_step()
        tpl = dict(params=state.params, batch_stats=state.batch_stats,
                   opt_state=state.opt_state, step=state.step,
                   ema_params=state.ema_params)
        restored = mgr.restore(step, args=ocp.args.StandardRestore(tpl))
        if weights_only:
            new = state.replace(params=restored['params'],
                                batch_stats=restored['batch_stats'])
        else:
            new = state.replace(**restored)
        return self._replicate(new)

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader=None,
            state: Optional[TrainState] = None,
            log_every: int = 50) -> TrainState:
        cfg = self.cfg
        steps_per_epoch = len(train_loader)
        if state is None:
            first = next(iter(train_loader))
            state = self.init_state(first, steps_per_epoch)
        train_step = jax.jit(build_train_step(self.model, cfg, self.tx,
                                              self.num_devices))
        train_iou = JaccardIndex(17, ignore_index=0)
        occ_iou = JaccardIndex(cfg.backbone.num_classes)
        for epoch in range(cfg.train.max_epochs):
            t_ep = time.time()
            for it, batch in enumerate(train_loader):
                dev_batch = self._to_device(batch)
                state, logs = train_step(state, dev_batch)
                if it % log_every == 0:
                    logs = jax.device_get(logs)
                    self.log_scalars(int(state.step), logs)
                    print(f'epoch {epoch} it {it}/{steps_per_epoch} '
                          f"loss {float(logs['total_loss']):.4f}", flush=True)
            print(f'epoch {epoch} done in {time.time() - t_ep:.1f}s')
            self.save_checkpoint(state, epoch)
            if val_loader is not None and \
                    (epoch + 1) % cfg.train.check_val_every_n_epoch == 0:
                self.validate(val_loader, state)
        return state

    def validate(self, val_loader, state: TrainState,
                 use_ema: bool = False) -> Dict[str, float]:
        """Lidarseg + occupancy IoU over the val split (base_exp.py:634-663,
        880-910)."""
        cfg = self.cfg
        params = state.ema_params if (use_ema and state.ema_params is not None) \
            else state.params
        eval_step = jax.jit(build_eval_step(self.model, cfg, lidar_seg=True))
        val_iou = JaccardIndex(17, ignore_index=0)
        occ_iou = JaccardIndex(cfg.backbone.num_classes)
        for batch in val_loader:
            dev = self._to_device(batch)
            out = jax.device_get(eval_step(params, state.batch_stats, dev))
            # lidarseg: argmax over classes 1..16 (+1), pad-masked
            pts_logits = out['pts_logits']
            seg_pred = pts_logits[..., 1:-1].argmax(-1) + 1
            val_iou.update(seg_pred, np.asarray(batch['point_labels']),
                           np.asarray(batch['point_valid']))
            occ_pred = out['occ_logits'].argmax(-1)
            occ_iou.update(occ_pred, np.asarray(batch['occ_semantics']),
                           np.asarray(batch['mask_camera']))
        iou = val_iou.compute()[1:]
        miou = float(np.nanmean(iou))
        print(format_iou_report(iou, LABEL_17_NAMES[1:-1], 'Validation'))
        print(f'Current val miou is {miou * 100:.3f}')
        occ = occ_iou.compute()[:-1]
        occ_miou = float(np.nanmean(occ))
        print(format_iou_report(occ, LABEL_17_NAMES[:-1],
                                'Validation occupancy'))
        print(f'Current val occupancy miou is {occ_miou * 100:.3f}')
        return {'val/mIoU': miou, 'val/occ_mIoU': occ_miou}

    def test(self, test_loader, state: TrainState) -> None:
        """Detection eval: device decode + host circle NMS + submission
        (base_exp.py:665-746, 912-929)."""
        from ..evaluation.det_evaluator import (DetNuscEvaluator,
                                                apply_circle_nms)
        cfg = self.cfg
        eval_step = jax.jit(build_eval_step(self.model, cfg, lidar_seg=False))
        results, metas = [], []
        for batch in test_loader:
            dev = self._to_device(batch)
            out = jax.device_get(eval_step(state.params, state.batch_stats,
                                           dev))
            B = dev['imgs'].shape[0]
            for b in range(B):
                results.append(apply_circle_nms(out['det'], cfg.head, b))
                metas.append(dict(
                    token=batch['meta']['token'][b],
                    ego2global_rotation=batch['meta']['ego2global_rotation'][b],
                    ego2global_translation=batch['meta'][
                        'ego2global_translation'][b]))
        evaluator = DetNuscEvaluator(
            class_names=[c for t in cfg.head.tasks for c in t],
            output_dir=os.path.join(self.workdir, 'detection_submit'),
            data_root=cfg.train.data_root)
        evaluator.evaluate(results, metas)
