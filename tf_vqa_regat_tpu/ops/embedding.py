"""Masked token embedding (reference model/language_model.py:10-40).

Lookup into an ``(ntoken+1, dim)`` table; rows where the input equals
``padding_idx`` are zeroed. The pad row itself is also zero-initialized at
GloVe load time, but the runtime mask keeps it zero even though the pad row is
trainable in the table (matching the reference's mask-multiply, which blocks
both the forward value and — through the multiply — gradient flow into
non-pad rows from padded positions).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu import nn


def embedding_init(key: jax.Array, num_embeddings: int, dim: int) -> Dict[str, Any]:
    # keras 'random_normal' initializer (stddev 0.05), language_model.py:17-22.
    return {"table": nn.normal(key, (num_embeddings, dim))}


def embedding_apply(
    params: Dict[str, Any],
    ids: jax.Array,
    padding_idx: int,
    compute_dtype=jnp.float32,
) -> jax.Array:
    emb = jnp.take(params["table"].astype(compute_dtype), ids, axis=0)
    mask = (ids != padding_idx)[..., None]
    return jnp.where(mask, emb, jnp.zeros_like(emb))
