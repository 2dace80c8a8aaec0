"""Minimal functional NN plumbing: param pytrees, PRNG threading, dropout.

Modules in this framework are pairs of pure functions:

    init(key, ...) -> params (a nested dict of jnp arrays)
    apply(params, x, ..., train=False, rngs=None) -> y

PRNG threading uses :class:`RngGen`, which derives a fresh key per call via
``jax.random.fold_in`` on a trace-time counter. Tracing is deterministic, so a
given (seed, step) pair always produces the same dropout masks under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


class RngGen:
    """Deterministic stream of PRNG keys derived from one base key."""

    def __init__(self, base_key: jax.Array):
        self._base = base_key
        self._count = 0

    def next(self) -> jax.Array:
        key = jax.random.fold_in(self._base, self._count)
        self._count += 1
        return key


def glorot_uniform(key, shape, dtype=jnp.float32, in_axis=0, out_axis=-1):
    """Keras-default Dense/Conv kernel init (glorot uniform)."""
    fan_in = shape[in_axis]
    fan_out = shape[out_axis]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def orthogonal(key, shape, dtype=jnp.float32):
    """Keras-default GRU recurrent kernel init."""
    return jax.nn.initializers.orthogonal()(key, shape, dtype)


def normal(key, shape, dtype=jnp.float32, stddev=0.05):
    """Keras 'random_normal' initializer default (stddev=0.05)."""
    return stddev * jax.random.normal(key, shape, dtype)


def dropout(
    x: jax.Array,
    rate: float,
    train: bool,
    rngs: Optional[RngGen],
) -> jax.Array:
    """Inverted dropout, matching keras Dropout semantics."""
    if not train or rate <= 0.0:
        return x
    assert rngs is not None, "dropout in train mode needs an RngGen"
    # 8 random bits per element instead of jax.random.bernoulli's 32:
    # rng-bit generation was ~6% of the flagship train step (HBM-bound;
    # tools/profile_step.py, PERF_NOTES.md). The drop probability quantizes
    # to t/256 (0.2 -> 51/256 = 0.19922, 0.5 -> exactly 0.5); the
    # inverted-dropout scale uses the quantized probability, so
    # E[dropout(x)] == x still holds exactly.
    if rate >= 1.0:
        rngs.next()  # keep the stream position consistent with 0 < rate < 1
        return jnp.zeros_like(x)
    # Clamp to [1, 255]: rate in (0, 1) must neither silently disable dropout
    # (t=0 for rate < 1/512) nor divide by zero / wrap `bits >= 256` to
    # all-keep under uint8 promotion (t=256 for rate > 511/512).
    t = min(255, max(1, int(round(rate * 256.0))))
    bits = jax.random.bits(rngs.next(), x.shape, dtype=jnp.uint8)
    scale = jnp.asarray(256.0 / (256 - t), x.dtype)
    return jnp.where(bits >= t, x * scale, jnp.zeros_like(x))
