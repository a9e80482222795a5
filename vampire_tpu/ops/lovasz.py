"""Lovász-Softmax loss (jit-friendly, masked, fixed shapes).

Re-derives `src/utils/lovasz_losses.py:18-28,153-195` (Berman 2018) with a
masking trick instead of boolean indexing: invalid elements get fg=0 and
error=0, so they sort to the tail of the descending error sort and contribute
exactly 0 to the dot product, while every valid prefix position sees the same
cumulative sums as the reference's filtered version. `classes='present'`
becomes a weighted mean over classes with fg present among *valid* elements.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """lovasz_losses.py:18-28; gt_sorted: (..., P) 0/1 floats."""
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / union
    diff = jaccard[..., 1:] - jaccard[..., :-1]
    return jnp.concatenate([jaccard[..., :1], diff], axis=-1)


def lovasz_softmax(probas: jnp.ndarray, labels: jnp.ndarray,
                   valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multi-class Lovász-Softmax over flat predictions.

    Args:
      probas: (P, C) class probabilities (softmax output).
      labels: (P,) int labels in [0, C).
      valid: optional (P,) bool mask; invalid elements are excluded exactly
        as the reference's boolean filtering would.

    Returns scalar loss (mean over classes present in the valid labels).
    """
    P, C = probas.shape
    probas = probas.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((P,), bool)
    vf = valid.astype(jnp.float32)

    # (C, P) foreground indicators and errors, zeroed outside the mask
    fg = (labels[None, :] == jnp.arange(C)[:, None]).astype(jnp.float32) * vf
    errors = jnp.abs(fg - probas.T) * vf                      # (C, P)

    present = jnp.sum(fg, axis=-1) > 0
    n_present = jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)
    w = present.astype(jnp.float32) / n_present               # (C,)

    return _sorted_dot(errors, fg, w)


# Hand-rolled VJP around the lovasz sort+dot. The Jaccard slope is DETACHED
# in the reference (lovasz_losses.py:177: torch.dot(errors_sorted,
# Variable(grad))), so d loss / d errors is exactly that slope routed back
# through the sort permutation — no differentiation through the sort is
# needed. The forward carries fg AND an iota payload (the argsort-free
# payload trick: scalar take_along_axis gathers are row-latency-bound on
# TPU), computes the cotangent directly by sorting (perm, slope) — a
# permutation sorted ascending IS its own inverse routing — and the
# backward is a single multiply. Measured (scripts/perf_r3_lovasz.py, occ
# 640K x 18 value+grad): 239 -> 140 ms with value and grad BIT-IDENTICAL
# to differentiating through the payload sort. fg/w are data (labels/mask
# derived), not differentiated; their cotangents are structural zeros.
@jax.custom_vjp
def _sorted_dot(errors, fg, w):
    return _sorted_dot_fwd(errors, fg, w)[0]


def _sorted_dot_fwd(errors, fg, w):
    # Per-class python loop: ONE batched lax.sort over the (C, P) layout
    # runs 2.2x slower than C independent P-row sorts on TPU (50.5 vs
    # 22.9 ms at occ shapes, ROUND5.md job29 — the same batched-op penalty
    # as vmapped gathers). C is small and static, so unroll.
    iota = jnp.arange(errors.shape[-1], dtype=jnp.int32)
    loss = jnp.float32(0.0)
    derrs = []
    for ci in range(errors.shape[0]):
        neg_sorted, fg_sorted, perm = jax.lax.sort(
            (-errors[ci], fg[ci], iota), dimension=-1, num_keys=1)
        slope = _lovasz_grad(fg_sorted)                       # (P,) const
        loss = loss + jnp.sum(-neg_sorted * slope) * w[ci]
        _, derr = jax.lax.sort((perm, slope * w[ci]), dimension=-1,
                               num_keys=1)
        derrs.append(derr)
    return loss, jnp.stack(derrs)


def _sorted_dot_bwd(derr, g):
    return (g * derr, jnp.zeros_like(derr), jnp.zeros(derr.shape[:1],
                                                      derr.dtype))


_sorted_dot.defvjp(_sorted_dot_fwd, _sorted_dot_bwd)


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CE over valid elements (torch F.cross_entropy reduction='mean')."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    if valid is None:
        return jnp.mean(nll)
    vf = valid.astype(jnp.float32)
    return jnp.sum(nll * vf) / jnp.maximum(jnp.sum(vf), 1.0)


def ce_lovasz(logits: jnp.ndarray, labels: jnp.ndarray,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """The reference's standard seg loss pairing: CE + Lovász(softmax probs)
    (base_exp.py:519-520,555-556,565-566,575-576)."""
    ce = masked_cross_entropy(logits, labels, valid)
    lov = lovasz_softmax(jax.nn.softmax(logits.astype(jnp.float32), axis=-1),
                         labels, valid)
    return ce + lov


def ce_lovasz_compact(logits: jnp.ndarray, labels: jnp.ndarray,
                      valid: jnp.ndarray, cap: int) -> jnp.ndarray:
    """ce_lovasz restricted to the valid rows via compaction.

    The masked Lovász sorts ALL P rows per class even when valid covers a
    tiny fraction (the camera seg mask = pixels hit by a lidar point: ~3% of
    6x256x704). A stable argsort on the 0/1 invalidity key moves valid rows
    to the front in original order; the loss then runs on the first `cap`
    rows only (sort work drops P/cap-fold). Exact whenever count <= cap —
    and on overflow a lax.cond falls back to the dense path, so the value is
    ALWAYS exactly ce_lovasz(logits, labels, valid).
    """
    P = logits.shape[0]
    if cap >= P:
        return ce_lovasz(logits, labels, valid)
    vi = valid.astype(jnp.int32)
    count = jnp.sum(vi)

    # Both branches are rematerialized in backward: the cond's VJP would
    # otherwise store BOTH branches' sort residuals every step (measured: an
    # un-checkpointed fallback OOMs the flagship train step).
    @jax.checkpoint
    def compact(lg_all, lb_all, vi_all):
        order = jnp.argsort(1 - vi_all)[:cap]      # stable: valid-first
        lg = jnp.take(lg_all, order, axis=0)
        lb = jnp.take(lb_all, order, axis=0)
        nv = jnp.arange(cap) < jnp.sum(vi_all)
        return ce_lovasz(lg, lb, nv)

    @jax.checkpoint
    def dense(lg_all, lb_all, vi_all):
        return ce_lovasz(lg_all, lb_all, vi_all > 0)

    return jax.lax.cond(count <= cap, compact, dense, logits, labels, vi)
