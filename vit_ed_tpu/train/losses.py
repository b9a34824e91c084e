"""Losses (reference: BCEWithLogitsLoss uses at main.py:46-47 and
hisfrag.py:60-61; misc/losses.py; main_vit.py TripletLoss)."""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax


def bce_with_logits(logits: jax.Array, targets: jax.Array,
                    reduction: str = "mean") -> jax.Array:
    """torch BCEWithLogitsLoss semantics (float targets, per-element)."""
    per_elem = optax.sigmoid_binary_cross_entropy(logits, targets)
    if reduction == "mean":
        return per_elem.mean()
    if reduction == "sum":
        return per_elem.sum()
    if reduction == "none":
        return per_elem
    raise ValueError(reduction)


def masked_bce_with_logits(logits, targets, mask, reduction: str = "mean"):
    """BCE over a padded pair buffer; mask selects the live rows."""
    per_elem = optax.sigmoid_binary_cross_entropy(logits, targets)
    mask = jnp.broadcast_to(mask.reshape(mask.shape + (1,) * (per_elem.ndim - mask.ndim)),
                            per_elem.shape)
    total = jnp.sum(per_elem * mask)
    if reduction == "sum":
        return total
    return total / jnp.maximum(jnp.sum(mask), 1.0)


def cosine_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return 1.0 - jnp.sum(an * bn, axis=-1)


def triplet_cosine_loss(anchor, positive, negative, margin: float = 0.2):
    """TripletMarginWithDistanceLoss with cosine distance (main_vit.py:54-65)."""
    d_pos = cosine_distance(anchor, positive)
    d_neg = cosine_distance(anchor, negative)
    return jnp.maximum(d_pos - d_neg + margin, 0.0).mean()


def batch_wise_triplet_loss(embeddings, labels, margin: float = 0.2):
    """Batch-hard triplet mining over in-batch label equality — native
    replacement for the undeclared ml_engine.BatchWiseTripletLoss."""
    d = cosine_distance(embeddings[:, None, :], embeddings[None, :, :])
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    # hardest positive / hardest negative per anchor
    d_pos = jnp.where(pos_mask, d, -jnp.inf).max(axis=1)
    d_neg = jnp.where(neg_mask, d, jnp.inf).min(axis=1)
    valid = pos_mask.any(axis=1) & neg_mask.any(axis=1)
    loss = jnp.maximum(d_pos - d_neg + margin, 0.0)
    return jnp.where(valid, loss, 0.0).sum() / jnp.maximum(valid.sum(), 1)


def negative_cosine_similarity(predict, actual):
    """SimSiam loss (misc/losses.py:17-23)."""
    pn = predict / jnp.maximum(jnp.linalg.norm(predict, axis=1, keepdims=True), 1e-12)
    an = actual / jnp.maximum(jnp.linalg.norm(actual, axis=1, keepdims=True), 1e-12)
    return -jnp.sum(pn * an, axis=1).mean()


def loss_combination(criterions: Sequence[Callable]):
    """Sum of criterions (misc/losses.py:4-14)."""

    def fn(*args, **kwargs):
        return sum(c(*args, **kwargs) for c in criterions)

    return fn
