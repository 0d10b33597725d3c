"""Masked loss layers.

Reproduces the reference loss semantics exactly:
  * softmax CE over the mask range [begin, end), summed then divided by
    (end - begin) for the GRADIENT (softmax_loss_layer.cpp:31 — the
    reference divides by the range width, not the valid count; its own
    TODO acknowledges the quirk), while the REPORTED loss averages over
    the valid count (get_prediction_loss, softmax_loss_layer.cpp:39-55).
  * sigmoid CE for multi-label (sigmoid_loss_layer.cpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graphaibench_tpu.ops import math as gmath


def _range_and_mask(nv: int, begin: int, end: int, mask):
    idx = jnp.arange(nv)
    in_range = (idx >= begin) & (idx < end)
    if mask is not None:
        in_range = in_range & (mask != 0)
    return in_range


def masked_softmax_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    begin: int,
    end: int,
    mask=None,
):
    """Returns (loss_for_grad, reported_loss, probs).

    loss_for_grad: sum(CE)/(end-begin)  — d/dlogits == reference backward
    reported_loss: sum(CE)/count       — what the reference prints
    """
    nv, ncls = logits.shape
    valid = _range_and_mask(nv, begin, end, mask)
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, ncls, dtype=logits.dtype)
    ce = gmath.cross_entropy(onehot, probs)
    ce = jnp.where(valid, ce, 0.0)
    total = jnp.sum(ce)
    count = jnp.maximum(jnp.sum(valid), 1)
    denom = max(end - begin, 1)
    return total / denom, total / count, probs


def masked_sigmoid_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,  # (nv, ncls) multi-hot
    begin: int,
    end: int,
    mask=None,
):
    """Multi-label sigmoid CE with the same range/count conventions."""
    nv, ncls = logits.shape
    valid = _range_and_mask(nv, begin, end, mask)
    ce = jnp.sum(
        gmath.sigmoid_cross_entropy_with_logits(labels.astype(logits.dtype), logits),
        axis=-1,
    )
    ce = jnp.where(valid, ce, 0.0)
    total = jnp.sum(ce)
    count = jnp.maximum(jnp.sum(valid), 1)
    denom = max(end - begin, 1)
    probs = jax.nn.sigmoid(logits)
    return total / denom, total / count, probs
