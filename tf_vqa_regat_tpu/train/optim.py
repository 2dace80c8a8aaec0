"""Optimizer: Adamax + per-tensor gradient clipping + the reference LR schedule.

Fidelity notes (SURVEY §2.4 T3-T4):
  - clipping is **per-tensor** L2 (tf.clip_by_norm on each gradient,
    train.py:111-112) — NOT global-norm; optax's clip_by_global_norm differs,
    so a custom transform is used;
  - Adamax(b1=.9, b2=.999, eps=1e-8) (train.py:48-49);
  - LR: epochs 0-4 warmup [1, 1, 1.2, 1.3, 1.4] x base_lr, then x decay_rate
    at epochs 5, 5+step, 5+2*step, ... (train.py:54-83; the decay start is
    hardcoded 5 in the reference loop — args.lr_decay_start is unused there);
  - frozen leaves (the second word-embedding table until TF-IDF init) get
    their updates zeroed.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

WARMUP_FACTORS = (1.0, 1.0, 1.2, 1.3, 1.4)
DECAY_START_EPOCH = 5  # hardcoded range(5, epochs, step) in reference train.py:61


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    lr_decay_rate: float,
    lr_decay_step: int,
) -> Callable[[jax.Array], jax.Array]:
    """Step -> learning rate, matching the reference's epoch-imperative
    schedule."""
    factors = jnp.asarray(WARMUP_FACTORS, jnp.float32)

    def schedule(step: jax.Array) -> jax.Array:
        epoch = step // steps_per_epoch
        warm = base_lr * factors[jnp.minimum(epoch, len(WARMUP_FACTORS) - 1)]
        n_decays = jnp.maximum((epoch - DECAY_START_EPOCH) // lr_decay_step + 1, 0)
        decayed = base_lr * WARMUP_FACTORS[-1] * (lr_decay_rate ** n_decays.astype(jnp.float32))
        return jnp.where(epoch < len(WARMUP_FACTORS), warm, decayed)

    return schedule


def clip_per_tensor(max_norm: float) -> optax.GradientTransformation:
    """tf.clip_by_norm semantics per gradient tensor: g * min(1, c/||g||)."""

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def freeze(mask: Any) -> optax.GradientTransformation:
    """Zero updates where mask is False (frozen leaves)."""

    def update_fn(updates, state, params=None):
        del params
        return (
            jax.tree.map(
                lambda u, m: u if m else jnp.zeros_like(u), updates, mask
            ),
            state,
        )

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)


def make_optimizer(
    base_lr: float,
    grad_clip: float,
    steps_per_epoch: int,
    lr_decay_rate: float,
    lr_decay_step: int,
    trainable_mask: Any,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(base_lr, steps_per_epoch, lr_decay_rate, lr_decay_step)
    return optax.chain(
        clip_per_tensor(grad_clip),
        optax.adamax(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8),
        freeze(trainable_mask),
    )
