"""Loss and VQA score, computed on device (reference train.py:20-39 pulled
logits to host via .numpy() every step — a per-step device sync, SURVEY §3.1).

Reduction contract (train.py:107-108): elementwise sigmoid BCE against the
3,129-d soft targets, reduced as mean-over-elements x num_answers — i.e. sum
over answers, mean over (valid) examples. The `valid` mask generalizes this to
statically padded final batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits_sum(logits: jax.Array, targets: jax.Array, valid: jax.Array) -> jax.Array:
    """Sum over answers, mean over valid examples. [b, A], [b, A], [b] -> scalar."""
    per_elem = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    per_example = jnp.sum(per_elem, axis=-1)  # [b]
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(valid, per_example, 0.0)) / n_valid


def vqa_score_sum(logits: jax.Array, targets: jax.Array, valid: jax.Array) -> jax.Array:
    """Sum over valid examples of the soft target at the argmax answer
    (reference compute_score_with_logits, train.py:28-39)."""
    pred = jnp.argmax(logits, axis=-1)  # [b]
    hit = jnp.take_along_axis(targets, pred[:, None], axis=-1)[:, 0]  # [b]
    return jnp.sum(jnp.where(valid, hit, 0.0))
