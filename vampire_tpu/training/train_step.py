"""The jitted training / eval steps (pjit over the device mesh).

One global step: forward (bf16 conv stacks, fp32 islands), all task losses,
backward, clip, AdamW, optional EMA. Under a mesh the batch ('dp') and camera
('cam') axes are sharded by the input shardings and gradient all-reduces are
inserted by XLA — no explicit collectives (SURVEY.md §5 distributed notes).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import VampireConfig
from ..models.vampire import Vampire
from ..models.centerpoint_head import decode_preds
from .losses import compute_losses
from .train_state import TrainState, ema_update

MATS_KEYS = ('sensor2ego', 'intrin', 'ida', 'bda')


def split_mats(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    return {k: batch[k] for k in MATS_KEYS}


def init_train_confusion(cfg: VampireConfig):
    """Zeroed on-device train-IoU confusion accumulators (seg, occ)."""
    K = cfg.backbone.num_classes
    return (jnp.zeros((K - 1, K - 1), jnp.float32),
            jnp.zeros((K, K), jnp.float32))


def build_train_step(model: Vampire, cfg: VampireConfig,
                     tx: optax.GradientTransformation,
                     num_devices: int = 1, with_metrics: bool = False):
    """with_metrics=True threads (conf_seg, conf_occ) accumulators through
    the step, updated from the same predictions the loss used — the
    reference's `train_iou` / `occ_train_iou` updates inside training_step
    (base_exp.py:287-290, 374-376, 383-385); the Trainer reports and resets
    them at epoch end (base_exp.py:851-878)."""
    from .metrics import confusion_update

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   conf=None):
        mats = split_mats(batch)

        def loss_fn(params):
            (fo, preds), new_model_state = model.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch['imgs'], mats, points=batch['points'], train=True,
                mutable=['batch_stats'])
            total, logs = compute_losses(
                fo, preds, batch, cfg.train, cfg.head,
                cfg.backbone.sdf_bias, cfg.backbone.density_mode,
                num_devices)
            aux_preds = None
            if with_metrics:
                aux_preds = (jax.lax.stop_gradient(fo['pts_logits']),
                             jax.lax.stop_gradient(fo['occ_logits']))
            return total, (logs, new_model_state['batch_stats'], aux_preds)

        (_, (logs, new_bs, aux_preds)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, state.step,
                                 cfg.train.ema_decay)
        logs['grad_norm'] = optax.global_norm(grads)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt,
                                  ema_params=new_ema)
        if not with_metrics:
            return new_state, logs
        pts_logits, occ_logits = aux_preds
        seg_pred = jnp.argmax(pts_logits[..., 1:-1], axis=-1) + 1
        valid = batch['point_valid'] & (batch['point_labels'] != 0)
        conf_seg = confusion_update(conf[0], seg_pred,
                                    batch['point_labels'], valid)
        occ_pred = jnp.argmax(occ_logits, axis=-1)
        conf_occ = confusion_update(conf[1], occ_pred,
                                    batch['occ_semantics'],
                                    batch['mask_camera'])
        return new_state, logs, (conf_seg, conf_occ)

    return train_step


def build_eval_step(model: Vampire, cfg: VampireConfig, lidar_seg: bool = True):
    """Validation forward (base_exp.py:634-663): lidar_seg=True skips the det
    head; returns field outputs needed by the metrics."""
    def eval_step(params, batch_stats, batch):
        mats = split_mats(batch)
        fo, preds = model.apply(
            {'params': params, 'batch_stats': batch_stats}, batch['imgs'],
            mats, points=batch['points'], train=False, lidar_seg=lidar_seg,
            camera_renders=False)
        out = dict(pts_logits=fo['pts_logits'], occ_logits=fo['occ_logits'],
                   occ_density=fo['occ_density'])
        if not lidar_seg:
            out['det'] = decode_preds(preds, cfg.head)
        return out

    return eval_step


def build_metric_eval_step(model: Vampire, cfg: VampireConfig):
    """Validation with ON-DEVICE confusion matrices: only two tiny (C, C)
    arrays leave the chip per batch (base_exp.py:644-658 semantics:
    lidarseg argmax over classes 1..16 (+1) on valid points, occ argmax on
    mask_camera voxels)."""
    from .metrics import confusion_update
    K = cfg.backbone.num_classes

    def eval_step(params, batch_stats, batch):
        mats = split_mats(batch)
        fo, _ = model.apply(
            {'params': params, 'batch_stats': batch_stats}, batch['imgs'],
            mats, points=batch['points'], train=False, lidar_seg=True,
            camera_renders=False)
        seg_pred = jnp.argmax(fo['pts_logits'][..., 1:-1], axis=-1) + 1
        valid = batch['point_valid'] & (batch['point_labels'] != 0)
        # drop_last=False pads the final batch; mask the padded rows out of
        # the confusion matrices (base_exp.py:920-927 truncation semantics)
        sv = batch.get('sample_valid')
        if sv is not None:
            valid = valid & sv[:, None]
            occ_mask = (batch['mask_camera']
                        & sv[:, None, None, None])
        else:
            occ_mask = batch['mask_camera']
        conf_seg = confusion_update(jnp.zeros((K - 1, K - 1), jnp.float32),
                                    seg_pred, batch['point_labels'], valid)
        occ_pred = jnp.argmax(fo['occ_logits'], axis=-1)
        conf_occ = confusion_update(jnp.zeros((K, K), jnp.float32),
                                    occ_pred, batch['occ_semantics'],
                                    occ_mask)
        return conf_seg, conf_occ

    return eval_step
