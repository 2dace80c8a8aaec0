"""Fused masked multi-head graph attention — the hot op of ReGAT.

Reference semantics (model/graph_att_layer.py:39-121), per direction:
  Q = WN-FC(roi)              [b, R, D]  -> heads [b, H, R, D/H]
  K = WN-FC(roi[:, :n])       [b, n, D]  -> heads [b, H, n, D/H]
  V = roi[:, :n]              *unprojected*, full D per head
  aff = QK^T / sqrt(D/H)                       [b, R, H, n]
  implicit: aff += log(max(relu(FC(pos_emb)), 1e-6))   (multiplicative
            geometry prior in log space, graph_att_layer.py:72-88)
  explicit: aff = where(adj > 0, aff, -9e15) + label_bias
            (graph_att_layer.py:90-102)
  att = softmax over n; per-head attended V            [b, R, H, D]
  out = grouped 1x1 conv (groups=H) under WeightNorm   [b, R, D]
      == per-head projection D -> D/H, heads concatenated, one shared bias.

Framework addition vs the reference: an explicit `key_mask` for statically
padded rois. The reference padded to the per-batch max and let attention see
zero-feature keys (dataset.py:329-355); static TPU shapes would otherwise
inflate that garbage, so invalid keys are masked to -9e15 — making the op
invariant to padding depth (tested in tests/test_graph_attention.py).

Dead code in the reference (unscaled aff computed then discarded,
graph_att_layer.py:63 vs 66) is not reproduced.

The jnp formulation here is the *oracle*; `impl="pallas"` routes the
softmax(QK+bias)@V core through the fused Pallas kernel
(ops/pallas/graph_attention.py), validated against this oracle in tests.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu import nn
from tf_vqa_regat_tpu.ops import weight_norm as wn

NEG_INF = -9e15  # reference mask value (graph_att_layer.py:95)


def graph_attention_init(
    key: jax.Array,
    hidden_dim: int,
    num_heads: int,
    pos_emb_dim: int = -1,
) -> Dict[str, Any]:
    """Params for one GraphSelfAttentionLayer (reference graph_att_layer.py:15-37)."""
    keys = jax.random.split(key, 4)
    head_out = hidden_dim // num_heads
    params: Dict[str, Any] = {
        "query": wn.fcnet_init(keys[0], [hidden_dim, hidden_dim]),
        "key": wn.fcnet_init(keys[1], [hidden_dim, hidden_dim]),
        # Grouped 1x1 conv kernel, stored [H, D, D/H]; glorot fan matches the
        # keras conv kernel of shape (1, 1, D, D) (in-per-group D, filters D).
        "out": _grouped_proj_init(keys[2], hidden_dim, num_heads, head_out),
    }
    if pos_emb_dim > 0:
        params["pair_pos_fc"] = wn.fcnet_init(keys[3], [pos_emb_dim, num_heads])
    return params


def _grouped_proj_init(key: jax.Array, hidden_dim: int, num_heads: int, head_out: int):
    flat = nn.glorot_uniform(key, (hidden_dim, num_heads * head_out))
    v = flat.reshape(hidden_dim, num_heads, head_out).transpose(1, 0, 2)  # [H, D, o]
    g = jnp.sqrt(jnp.sum(jnp.square(v)))
    return {"v": v, "g": g, "b": jnp.zeros((num_heads * head_out,), jnp.float32)}


def _grouped_kernel(params, compute_dtype=jnp.float32):
    """Weight-normed grouped projection kernel [H, D, o] (whole-tensor scalar-g
    norm, matching WeightNorm(Conv2D(groups=H)))."""
    v = params["v"]
    scale = params["g"] * jax.lax.rsqrt(jnp.sum(jnp.square(v)) + 1e-12)
    return (v * scale).astype(compute_dtype)


def graph_attention_apply(
    params: Dict[str, Any],
    roi: jax.Array,  # [b, R, D]
    nongt_dim: int,
    num_heads: int,
    pos_emb: Optional[jax.Array] = None,  # [b, R, n, pos_dim]
    adj_mask: Optional[jax.Array] = None,  # [b, R, n] (>0 = edge)
    label_bias: Optional[jax.Array] = None,  # [b, R, n]
    key_mask: Optional[jax.Array] = None,  # [b, n] bool
    drop_rate: float = 0.2,
    train: bool = False,
    rngs: Optional[nn.RngGen] = None,
    compute_dtype=jnp.float32,
    impl: str = "jnp",
) -> jax.Array:
    b, R, D = roi.shape
    n = min(nongt_dim, R)
    head_dim = D // num_heads
    trunc = roi[:, :n, :]

    q = wn.fcnet_apply(params["query"], roi, None, drop_rate, train, rngs, compute_dtype)
    k = wn.fcnet_apply(params["key"], trunc, None, drop_rate, train, rngs, compute_dtype)

    q = q.reshape(b, R, num_heads, head_dim)
    k = k.reshape(b, n, num_heads, head_dim)

    # Bias terms, all shaped [b, R, H, n] (or broadcastable).
    bias = jnp.zeros((b, R, 1, n), jnp.float32)
    if pos_emb is not None:
        # The pos FC is computed directly into [b, R, H, n] layout via einsum
        # (equivalent to FCNet + transpose(0,1,3,2); a separate transpose of
        # this tiny-trailing-dim tensor costs a full relayout on TPU).
        layer = params["pair_pos_fc"]["layers"][0]
        pe = nn.dropout(pos_emb, drop_rate, train, rngs)
        pw = jnp.einsum(
            "brnp,ph->brhn",
            pe.astype(compute_dtype),
            wn.wn_kernel(layer, compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if "b" in layer:
            pw = pw + layer["b"][None, None, :, None]
        pw = jax.nn.relu(pw)
        bias = bias + jnp.log(jnp.maximum(pw, 1e-6))  # graph_att_layer.py:86-88
    if label_bias is not None:
        bias = bias + label_bias[:, :, None, :]

    neg = jnp.float32(NEG_INF)
    mask_add = jnp.zeros((b, 1, 1, n), jnp.float32)
    if key_mask is not None:
        mask_add = jnp.where(key_mask[:, None, None, :], 0.0, neg)
    if adj_mask is not None:
        bias = jnp.where((adj_mask > 0)[:, :, None, :], bias, neg)
    bias = bias + mask_add

    # Key restructuring vs the reference: by matmul associativity,
    # (softmax @ V) @ W_grouped == softmax @ (V @ W_grouped). The reference
    # materializes the per-head attended values [b, R, H, D] (~6.7 GB at
    # batch 256, R=100) and then runs the grouped conv
    # (graph_att_layer.py:110-117); projecting V first gives a tiny
    # [b, n, H, o] tensor and ~65x fewer FLOPs in the AV+projection chain.
    kernel = _grouped_kernel(params["out"], compute_dtype)  # [H, D, o]
    vw = jnp.einsum(
        "bnd,hdo->bnho",
        trunc.astype(compute_dtype),
        kernel,
        preferred_element_type=jnp.float32,
    )  # [b, n, H, o]

    if impl == "pallas":
        from tf_vqa_regat_tpu.ops.pallas.graph_attention import fused_graph_attention

        out = fused_graph_attention(q, k, vw, bias)
    else:
        aff = jnp.einsum(
            "brhd,bnhd->brhn",
            q.astype(compute_dtype),
            k.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) * (1.0 / jnp.sqrt(jnp.float32(head_dim)))
        weights = jax.nn.softmax(aff + bias, axis=-1)  # [b, R, H, n]
        out = jnp.einsum(
            "brhn,bnho->brho",
            weights.astype(compute_dtype),
            vw.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )  # [b, R, H, o]

    return out.reshape(b, R, D) + params["out"]["b"]
