"""Train state, optimizer and LR schedule.

Reference recipe (base_exp.py:931-943, base_cli.py:72-92): AdamW
lr = 2e-4/8 * batch_per_device * n_devices, weight decay 1e-7 on all params
(torch AdamW semantics), MultiStepLR gamma 0.1 at epochs [19, 23] of 24,
global-norm gradient clipping at 35, optional EMA with decay ramp
d*(1 - e^{-n/2000}) (callbacks/ema.py:49).

The frozen image stem (mmdet frozen_stages=0) receives zero gradients via
stop_gradient in the ResNet; a final masked set_to_zero also blocks its weight
decay, matching torch's skip-None-grad behavior.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..configs import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def _stem_mask(params) -> Any:
    """True for params that must never update (frozen image stem)."""
    def mask_fn(path, _):
        keys = [getattr(p, 'key', '') for p in path]
        return 'img_backbone' in keys and any('stem' in str(k) for k in keys)
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    boundaries = {m * steps_per_epoch: cfg.lr_gamma for m in cfg.lr_milestones}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int, params) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.weight_decay),
        optax.masked(optax.set_to_zero(), _stem_mask(params)),
    )
    return tx


def create_train_state(params, batch_stats, cfg: TrainConfig,
                       steps_per_epoch: int) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg, steps_per_epoch, params)
    # EMA starts as a COPY of params: sharing buffers would alias two
    # donated arguments in the jitted train step
    ema = jax.tree.map(jnp.copy, params) if cfg.use_ema else None
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params),
                       ema_params=ema)
    return state, tx


def ema_update(ema_params, params, step: jnp.ndarray,
               decay: float = 0.9999) -> Any:
    """EMA with warmup ramp d * (1 - e^{-n/2000}) (callbacks/ema.py:43-55)."""
    d = decay * (1.0 - jnp.exp(-(step.astype(jnp.float32) + 1.0) / 2000.0))
    return jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                        ema_params, params)
