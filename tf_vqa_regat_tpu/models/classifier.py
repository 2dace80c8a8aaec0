"""Answer classifier (reference model/classifier.py:11-26):
WN-Dense(num_hid -> 2*num_hid) -> relu -> dropout -> WN-Dense(-> num_answers).

Note the dropout sits *between* the two denses here (unlike FCNet's
dropout-before-dense layout)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu import nn
from tf_vqa_regat_tpu.ops import weight_norm as wn


def classifier_init(key: jax.Array, in_dim: int, hid_dim: int, out_dim: int) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": wn.wn_dense_init(k1, in_dim, hid_dim),
        "fc2": wn.wn_dense_init(k2, hid_dim, out_dim),
    }


def classifier_apply(
    params: Dict[str, Any],
    x: jax.Array,
    drop_rate: float,
    train: bool,
    rngs: Optional[nn.RngGen],
    compute_dtype=jnp.float32,
) -> jax.Array:
    x = jax.nn.relu(wn.wn_dense_apply(params["fc1"], x, compute_dtype))
    x = nn.dropout(x, drop_rate, train, rngs)
    # Final answer logits stay f32: they feed sigmoid-BCE and the VQA score.
    return wn.wn_dense_apply(params["fc2"], x, compute_dtype, out_dtype=jnp.float32)
