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


def _pos_log_bias(pe, kernel, bias_vec):
    """relu(FC(pos_emb)) -> log multiplicative geometry prior, [b, R, H', n]
    (reference graph_att_layer.py:72-88; H' = H, or 2H when dual-folded).
    `pe` arrives already dropout'd, in the caller's compute dtype; the einsum
    lands directly in the [b, R, H, n] bias layout (an FCNet + transpose of
    this tiny-trailing-dim tensor costs a full relayout on TPU). One helper
    for the pos_mat / pos_emb / dual-fold call sites (review finding)."""
    pw = jnp.einsum("brnp,ph->brhn", pe, kernel, preferred_element_type=jnp.float32)
    if bias_vec is not None:
        pw = pw + bias_vec[None, None, :, None]
    return jnp.log(jnp.maximum(jax.nn.relu(pw), 1e-6))


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
    pos_emb: Optional[jax.Array] = None,  # [b, R, n, pos_dim] (pre-embedded)
    adj_mask: Optional[jax.Array] = None,  # [b, R, n] (>0 = edge)
    label_bias: Optional[jax.Array] = None,  # [b, R, n]
    key_mask: Optional[jax.Array] = None,  # [b, n] bool
    drop_rate: float = 0.2,
    train: bool = False,
    rngs: Optional[nn.RngGen] = None,
    compute_dtype=jnp.float32,
    impl: str = "jnp",
    pos_mat: Optional[jax.Array] = None,  # [b, R, n, 4] raw position matrix
) -> jax.Array:
    """pos geometry can arrive either pre-embedded (`pos_emb`) or as the raw
    position matrix (`pos_mat`, 16x smaller). The production implicit path
    passes `pos_mat`: the jnp oracle embeds it here, and the Pallas v3 path
    feeds it straight to the fully-fused kernel which generates the bias in
    VMEM (ops/pallas/implicit_attention.py)."""
    b, R, D = roi.shape
    n = min(nongt_dim, R)
    head_dim = D // num_heads
    trunc = roi[:, :n, :]

    q = wn.fcnet_apply(params["query"], roi, None, drop_rate, train, rngs, compute_dtype)
    k = wn.fcnet_apply(params["key"], trunc, None, drop_rate, train, rngs, compute_dtype)

    q = q.reshape(b, R, num_heads, head_dim)
    k = k.reshape(b, n, num_heads, head_dim)

    kernel = _grouped_kernel(params["out"], compute_dtype)  # [H, D, o]
    vw = jnp.einsum(
        "bnd,hdo->bnho",
        trunc.astype(compute_dtype),
        kernel,
        preferred_element_type=compute_dtype,
    )  # [b, n, H, o] — see the associativity note below

    # Off-TPU (CPU test suite), impl="pallas" runs the same kernels in
    # interpret mode so the full model path is testable without hardware.
    interpret = jax.default_backend() != "tpu"

    # label_bias must also be absent: the fused kernel has no edge-label
    # input, so taking this branch with one would silently drop it from the
    # logits while impl="jnp" applies it (review finding; unreachable from
    # models/relation.py today — adj_mask and label_bias always co-travel).
    if (
        impl == "pallas"
        and pos_mat is not None
        and adj_mask is None
        and label_bias is None
    ):
        # Fully-fused implicit path (kernel v3): sinusoid + dropout + pos-FC
        # + log-bias + key-mask + softmax + AV in one kernel; the position
        # embedding never touches HBM on the forward pass.
        from tf_vqa_regat_tpu.ops.pallas.implicit_attention import (
            fused_implicit_graph_attention,
        )

        layer = params["pair_pos_fc"]["layers"][0]
        P = layer["v"].shape[0]
        dropmask = None
        if train and drop_rate > 0.0:
            assert rngs is not None
            # nn.dropout's exact uint8 scheme (same stream position, same
            # shape, same key as the jnp path's pos_bias_chain draw), so the
            # fused and jnp paths keep IDENTICAL masks and the quantized
            # t/256 drop probability — bernoulli drew 32 bits/element and a
            # subtly different probability (review finding)
            t = min(255, max(1, int(round(drop_rate * 256.0))))
            # fold_in(key, 0): the jnp path hands its rngs.next() key to a
            # fresh RngGen whose first draw is fold_in(key, 0) (pos_bias_
            # chain -> nn.dropout) — mirror that exactly so both impls see
            # the identical mask
            key = jax.random.fold_in(rngs.next(), 0)
            bits = jax.random.bits(key, (b, R, n, P), dtype=jnp.uint8)
            dropmask = (bits >= t).astype(jnp.uint8)
        out = fused_implicit_graph_attention(
            q, k, vw, pos_mat, wn.wn_kernel(layer, jnp.float32),
            layer.get("b"), key_mask, drop_rate, dropmask,
            interpret=interpret,
        )
        out = out.reshape(b, R, D)
        return out + params["out"]["b"].astype(out.dtype)

    # Bias terms, all shaped [b, R, H, n] (or broadcastable).
    bias = jnp.zeros((b, R, 1, n), jnp.float32)
    if pos_emb is None and pos_mat is not None:
        # Production implicit path: sinusoid + dropout + pos-FC + log chain.
        # The [b, R, n, P] sinusoid (131 MB f32 at flagship shapes) was the
        # hottest non-matmul tensor in the step — read by the fwd bias fusion
        # AND the backward dW fusion of each direction
        # (tools/profile_step.py). Computing it in compute_dtype halves that
        # traffic under bf16 (+11% train q/s measured). NOTE: wrapping this
        # chain in jax.checkpoint to drop the residual was tried and MEASURED
        # SLOWER (-12%): the backward recompute costs more than the residual
        # reads it saves. The dropout key is drawn explicitly (one rngs.next,
        # same stream position as an inline nn.dropout).
        layer = params["pair_pos_fc"]["layers"][0]
        P = layer["v"].shape[0]
        key = rngs.next() if (train and drop_rate > 0.0) else None

        def pos_bias_chain(pos_mat, layer, key):
            from tf_vqa_regat_tpu.ops.position import position_embedding

            pe = position_embedding(pos_mat, P).astype(compute_dtype)
            if key is not None:
                pe = nn.dropout(pe, drop_rate, True, nn.RngGen(key))
            return _pos_log_bias(pe, wn.wn_kernel(layer, compute_dtype), layer.get("b"))

        bias = bias + pos_bias_chain(pos_mat, layer, key)
    elif pos_emb is not None:
        # Pre-embedded pos_emb (explicit callers/tests): same math, the
        # embedding arrives materialized. The pos FC is computed directly
        # into [b, R, H, n] layout via einsum (equivalent to FCNet +
        # transpose(0,1,3,2); a separate transpose of this tiny-trailing-dim
        # tensor costs a full relayout on TPU).
        layer = params["pair_pos_fc"]["layers"][0]
        pe = nn.dropout(pos_emb, drop_rate, train, rngs)
        bias = bias + _pos_log_bias(  # graph_att_layer.py:86-88
            pe.astype(compute_dtype),
            wn.wn_kernel(layer, compute_dtype),
            layer.get("b"),
        )
    if label_bias is not None:
        bias = bias + label_bias[:, :, None, :]

    neg = jnp.float32(NEG_INF)
    mask_add = jnp.zeros((b, 1, 1, n), jnp.float32)
    if key_mask is not None:
        mask_add = jnp.where(key_mask[:, None, None, :], 0.0, neg)
    if adj_mask is not None:
        bias = jnp.where((adj_mask > 0)[:, :, None, :], bias, neg)
    bias = bias + mask_add

    # (vw above) Key restructuring vs the reference: by matmul associativity,
    # (softmax @ V) @ W_grouped == softmax @ (V @ W_grouped). The reference
    # materializes the per-head attended values [b, R, H, D] (~6.7 GB at
    # batch 256, R=100) and then runs the grouped conv
    # (graph_att_layer.py:110-117); projecting V first gives a tiny
    # [b, n, H, o] tensor and ~65x fewer FLOPs in the AV+projection chain.
    if impl == "pallas":
        from tf_vqa_regat_tpu.ops.pallas.graph_attention import fused_graph_attention

        out = fused_graph_attention(q, k, vw, bias, interpret=interpret)
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
            preferred_element_type=compute_dtype,
        )  # [b, R, H, o]

    out = out.reshape(b, R, D)
    return out + params["out"]["b"].astype(out.dtype)


def graph_attention_apply_dual(
    params_list,  # [dir0 params, dir1 params] (graph_attention_init pytrees)
    roi: jax.Array,  # [b, R, D]
    nongt_dim: int,
    num_heads: int,
    pos_emb: Optional[jax.Array] = None,  # [b, R, n, P] (pre-embedded)
    pos_mat: Optional[jax.Array] = None,  # [b, R, n, 4] raw geometry
    adj_masks=None,  # per-direction [b, R, n] (explicit)
    label_biases=None,  # per-direction [b, R, n] (explicit)
    key_mask: Optional[jax.Array] = None,  # [b, n] bool
    drop_rate: float = 0.2,
    train: bool = False,
    rngs: Optional[nn.RngGen] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """Both attention directions folded into ONE 2H-head computation.

    GAttNet runs GraphSelfAttentionLayer twice (adj and adjT, reference
    graph_att_net.py:56-78) and SUMS the outputs. The directions share every
    input (roi, pos_mat/pos_emb, key_mask) and differ only in weights and
    masks, so stacking their heads gives identical math with all matmuls at
    double width and the [b, R, n, P] sinusoid computed/read ONCE instead of
    per direction.

    Used for EVAL only (gatt_net_apply gates on `not train`): measured on
    v5e at flagship shapes it is +16% eval q/s (9.42 -> 8.12 ms/step bf16),
    and — counterintuitively — ~8% SLOWER for the train step (21.6 vs 19.9
    ms): the folded backward schedules worse under XLA even though the
    standalone fwd+bwd chain microbenchmark showed 3.2x (PERF_NOTES.md;
    microbenchmarks of fused chains do not transfer to full-step schedules).
    Eval-only also means no dropout runs here, so the fold is EXACT vs the
    per-direction path modulo matmul batching order (tested). The dropout
    arguments are kept so the function stays a drop-in oracle for tests.
    """
    b, R, D = roi.shape
    n = min(nongt_dim, R)
    H = num_heads
    head_dim = D // H
    trunc = roi[:, :n, :]

    def cat_fc_kernel(name, axis=1):
        return jnp.concatenate(
            [wn.wn_kernel(p[name]["layers"][0], compute_dtype) for p in params_list],
            axis=axis,
        )

    def cat_fc_bias(name):
        layers = [p[name]["layers"][0] for p in params_list]
        if "b" not in layers[0]:
            return None
        return jnp.concatenate([l["b"] for l in layers], axis=0)

    def dense(x, kernel, bias):
        y = jnp.dot(x.astype(compute_dtype), kernel, preferred_element_type=compute_dtype)
        return y if bias is None else y + bias.astype(y.dtype)

    # Q/K projections: one dropout on the shared input, one double-width matmul.
    q_in = nn.dropout(roi, drop_rate, train, rngs)
    k_in = nn.dropout(trunc, drop_rate, train, rngs)
    q = dense(q_in, cat_fc_kernel("query"), cat_fc_bias("query")).reshape(b, R, 2 * H, head_dim)
    k = dense(k_in, cat_fc_kernel("key"), cat_fc_bias("key")).reshape(b, n, 2 * H, head_dim)

    # V projection: grouped kernels stacked along the head axis -> [2H, D, o].
    kernel2 = jnp.concatenate(
        [_grouped_kernel(p["out"], compute_dtype) for p in params_list], axis=0
    )
    vw = jnp.einsum(
        "bnd,hdo->bnho", trunc.astype(compute_dtype), kernel2,
        preferred_element_type=compute_dtype,
    )  # [b, n, 2H, o]

    bias = jnp.zeros((b, R, 1, n), jnp.float32)
    if pos_mat is not None or pos_emb is not None:
        from tf_vqa_regat_tpu.ops.position import position_embedding

        layers = [p["pair_pos_fc"]["layers"][0] for p in params_list]
        P = layers[0]["v"].shape[0]
        pe = (
            position_embedding(pos_mat, P).astype(compute_dtype)
            if pos_emb is None
            else pos_emb.astype(compute_dtype)
        )
        pe = nn.dropout(pe, drop_rate, train, rngs)
        wp = jnp.concatenate([wn.wn_kernel(l, compute_dtype) for l in layers], axis=1)
        bp = (
            jnp.concatenate([l["b"] for l in layers], axis=0)
            if "b" in layers[0]
            else None
        )
        bias = bias + _pos_log_bias(pe, wp, bp)  # [b, R, 2H, n]
    if label_biases is not None:
        lb = jnp.stack(label_biases, axis=2)  # [b, R, 2, n]
        bias = bias + jnp.repeat(lb, H, axis=2).reshape(b, R, 2 * H, n)

    neg = jnp.float32(NEG_INF)
    if adj_masks is not None:
        am = jnp.stack([m > 0 for m in adj_masks], axis=2)  # [b, R, 2, n] bool
        am = jnp.repeat(am, H, axis=2).reshape(b, R, 2 * H, n)
        bias = jnp.where(am, bias, neg)
    if key_mask is not None:
        bias = bias + jnp.where(key_mask[:, None, None, :], 0.0, neg)

    aff = jnp.einsum(
        "brhd,bnhd->brhn",
        q.astype(compute_dtype),
        k.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) * (1.0 / jnp.sqrt(jnp.float32(head_dim)))
    weights = jax.nn.softmax(aff + bias, axis=-1)  # [b, R, 2H, n]
    out = jnp.einsum(
        "brhn,bnho->brho",
        weights.astype(compute_dtype),
        vw,
        preferred_element_type=compute_dtype,
    )  # [b, R, 2H, o]
    out = out.reshape(b, R, 2, D).sum(axis=2)  # directions summed (GAttNet)
    b_out = params_list[0]["out"]["b"] + params_list[1]["out"]["b"]
    return out + b_out.astype(out.dtype)
