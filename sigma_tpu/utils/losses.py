"""Segmentation loss library (functional, channel-last logits).

JAX ports of the reference loss zoo (`/root/reference/utils/loss_opr.py`;
only cross-entropy is used by the shipped trainer, train.py:75, but the
full set is part of the public surface). All functions take logits
(B, H, W, C) and integer labels (B, H, W); reductions are mean over valid
(non-ignored) pixels, matching torch NLL/CE ignore_index semantics.

OHEM is implemented with fully static shapes (top-k over pixel
probabilities instead of data-dependent sorting/indexing) so it jits —
semantics match `ProbOhemCrossEntropy2d` (loss_opr.py:137-187): keep pixels
whose true-class probability <= max(thresh, k-th smallest prob).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _valid_nll(logp, labels, ignore_index, weight=None):
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    # one-hot multiply-reduce, not take_along_axis: the TPU gather (and
    # its scatter adjoint) runs at ~1 GiB/s; this fuses with the softmax
    nll = -jnp.sum(
        logp * jax.nn.one_hot(safe, logp.shape[-1], dtype=logp.dtype),
        axis=-1,
    )
    if weight is not None:
        w = jnp.asarray(weight)[safe]
        nll = nll * w
        denom = jnp.where(valid, w, 0.0).sum()
    else:
        denom = valid.sum()
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(denom, 1)


def cross_entropy(logits, labels, ignore_index: int = 255, weight=None):
    """torch CrossEntropyLoss(ignore_index) (train.py:75)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return _valid_nll(logp, labels, ignore_index, weight)


def focal_loss_2d(logits, labels, gamma: float = 0.0, weight=None,
                  ignore_index: int = 255):
    """FocalLoss2d (loss_opr.py:12-23): NLL of (1-p)^2 * log p.

    NOTE: the reference squares regardless of `gamma` (hard-coded **2);
    reproduced as-is.
    """
    logits = logits.astype(jnp.float32)
    p = jax.nn.softmax(logits, axis=-1)
    mod = (1.0 - p) ** 2 * jax.nn.log_softmax(logits, axis=-1)
    return _valid_nll(mod, labels, ignore_index, weight)


def balance_loss(logits, labels, ignore_index: int = 255, weight=None):
    """BalanceLoss (loss_opr.py:63-80): log-softmax scaled by
    (1 - softmax(exp(logits)))^2."""
    logits = logits.astype(jnp.float32)
    prob = jax.nn.softmax(jnp.exp(logits), axis=-1)
    mod = jax.nn.log_softmax(logits, axis=-1) * (1.0 - prob) ** 2
    return _valid_nll(mod, labels, ignore_index, weight)


def berhu_loss(pred, target, delta: float = 0.2, ignore_index: int = 0):
    """berHuLoss (loss_opr.py:82-101): reverse-Huber regression loss with
    threshold delta * max|err| over valid pixels."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    valid = (target != ignore_index).astype(jnp.float32)
    err = jnp.abs(pred - target) * valid
    d = delta * jnp.max(err)
    f_mask = (target <= d).astype(jnp.float32) * valid
    s_mask = (1.0 - f_mask) * valid
    f_part = err * f_mask
    s_part = (err**2 + d**2) / jnp.maximum(2 * d, 1e-12) * s_mask
    return jnp.mean(f_part + s_part)


def sigmoid_focal_loss(logits, labels, ignore_index: int,
                       gamma: float = 2.0, alpha: float = 0.25):
    """SigmoidFocalLoss (loss_opr.py:104-134); logits (B, H, W) binary."""
    b = logits.shape[0]
    pred = logits.reshape(b, -1, 1).astype(jnp.float32)
    sig = jax.nn.sigmoid(pred)
    t = labels.reshape(b, -1).astype(jnp.float32)
    mask = (t != ignore_index).astype(jnp.float32)
    onehot = (mask * t)[..., None]
    max_val = jnp.clip(-sig, 0, None)
    pos = (1 - sig) ** gamma * (sig - sig * onehot)
    neg = sig**gamma * (
        max_val + jnp.log(jnp.exp(-max_val) + jnp.exp(-sig - max_val))
    )
    loss = -(alpha * pos + (1 - alpha) * neg).sum(-1) * mask
    return loss.mean()


def ohem_cross_entropy(logits, labels, ignore_index: int = 255,
                       thresh: float = 0.6, min_kept: int = 256,
                       weight=None):
    """ProbOhemCrossEntropy2d (loss_opr.py:137-187), static-shape version:
    keep hard pixels (true-class prob <= threshold), where the threshold is
    raised to the min_kept-th smallest probability when needed."""
    logits = logits.astype(jnp.float32)
    b, h, w, c = logits.shape
    flat_logits = logits.reshape(-1, c)
    flat_labels = labels.reshape(-1)
    valid = flat_labels != ignore_index
    safe = jnp.where(valid, flat_labels, 0)
    prob = jax.nn.softmax(flat_logits, axis=-1)
    true_prob = jnp.sum(
        prob * jax.nn.one_hot(safe, c, dtype=prob.dtype), axis=-1
    )
    # ignored pixels get prob 1 so they sort last (reference masked_fill)
    true_prob = jnp.where(valid, true_prob, 1.0)

    k = min(min_kept, flat_labels.shape[0])
    kth = -jax.lax.top_k(-true_prob, k)[0][-1] if k > 0 else thresh
    threshold = jnp.maximum(thresh, kth)
    kept = valid & (true_prob <= threshold)
    new_labels = jnp.where(kept, flat_labels, ignore_index)
    return cross_entropy(
        flat_logits.reshape(b, h, w, c),
        new_labels.reshape(b, h, w),
        ignore_index,
        weight,
    )


def rce_loss(logits, labels, num_classes: int, ignore_index: int = 255,
             beta: float = 0.01):
    """RCELoss (loss_opr.py:26-61): CE plus beta * reverse term
    NLL(log(clamped onehot(target)), argmax(pred)) averaged with the valid
    mask."""
    logits = logits.astype(jnp.float32)
    loss1 = cross_entropy(logits, labels, ignore_index)
    valid = (labels != ignore_index)
    safe = jnp.where(valid, labels, 0)
    onehot = jax.nn.one_hot(safe, num_classes)
    onehot = jnp.clip(onehot, 1e-9, 1.0 - 1e-9)
    log_onehot = jnp.log(onehot)
    max_id = jnp.argmax(logits, axis=-1)
    nll2 = -jnp.sum(
        log_onehot * jax.nn.one_hot(max_id, num_classes,
                                    dtype=log_onehot.dtype),
        axis=-1,
    )
    loss2 = jnp.mean(nll2 * valid.astype(jnp.float32))
    return loss1 + beta * loss2
