"""BAN fusion: bilinear attention with glimpses (net-new model family).

The reference accepts ``--fusion ban`` but hardwires BUTD
(reference main.py:51-52, rel_graph_net.py:106; SURVEY §2.2-M12). This module
implements the fusion from the BAN paper (Kim et al., NeurIPS 2018) as used by
the PyTorch ReGAT: a BiAttention producing ``glimpse`` joint attention maps
over (roi x question-token) pairs via a rank-3 bilinear form, followed by
per-glimpse bilinear pooling with residual updates into the question sequence.

Structure per glimpse g:
  att[g]   = softmax over (R*T) of einsum(h_mat[g], drop(v_net(v)), q_net(q)),
             invalid rois masked to -inf  (BiAttention, k=3)
  b_emb[g] = einsum(v1_net(v), att[g], q1_net(q))          (BCNet k=1)
  q_seq    = q_prj[g](b_emb[g])[:, None, :] + q_seq        (residual)
joint = sum over T of q_seq.

The bilinear tensor ``h_mat`` carries whole-tensor scalar-g weight norm
(pytorch ``weight_norm(..., dim=None)``), consistent with ops/weight_norm.py.

Dropout: this net-new family takes cfg.dropout directly (there is no
reference code pinning a default — contrast BUTD/graph attention, which the
reference hardcodes at 0.2 regardless of --dropout; models/regat.py).

The BAN-paper counting module is deliberately not included: in the upstream
PyTorch ReGAT (linjieli222/VQA_ReGAT, which this reference reimplements —
reference README.md:3-5), ``model/fusion.py``'s ``BAN.__init__`` takes
``use_counter=False`` by default and the builder never passes True, because
the counter consumes raw box coordinates while ReGAT's fusion stage receives
relation-encoded features (the ``if use_counter:`` branches that would build
``counting.Counter`` and consume ``b`` boxes are dead in that repo). This
module reproduces the fusion ReGAT actually runs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu import nn
from tf_vqa_regat_tpu.ops import weight_norm as wn

_K = 3  # bilinear rank multiplier for the attention maps (BCNet default k=3)


def ban_init(key: jax.Array, v_dim: int, q_dim: int, glimpse: int) -> Dict[str, Any]:
    h = q_dim  # hidden dim = num_hid, matching ReGAT's BAN(v_rel_dim, num_hid, gamma)
    keys = jax.random.split(key, 6 + glimpse)
    params: Dict[str, Any] = {
        # BiAttention's BCNet(v, q, h, glimpse, k=3)
        "att_v_net": wn.fcnet_init(keys[0], [v_dim, h * _K]),
        "att_q_net": wn.fcnet_init(keys[1], [q_dim, h * _K]),
        "h_mat": {
            "v": jax.random.normal(keys[2], (glimpse, h * _K)),
            "g": None,  # filled below
        },
        "h_bias": jax.random.normal(keys[3], (glimpse,)),
        # per-glimpse BCNet(v, q, h, None, k=1) — separate params per glimpse,
        # as in ban-vqa's b_net list.
        "b_v_net": [
            wn.fcnet_init(jax.random.fold_in(keys[4], g), [v_dim, h])
            for g in range(glimpse)
        ],
        "b_q_net": [
            wn.fcnet_init(jax.random.fold_in(keys[5], g), [q_dim, h])
            for g in range(glimpse)
        ],
        "q_prj": [wn.fcnet_init(keys[6 + g], [h, h]) for g in range(glimpse)],
    }
    v = params["h_mat"]["v"]
    params["h_mat"]["g"] = jnp.sqrt(jnp.sum(jnp.square(v)))
    return params




def ban_apply(
    params: Dict[str, Any],
    visual: jax.Array,  # [b, R, v_dim]
    q_seq: jax.Array,  # [b, T, q_dim]
    roi_mask: jax.Array,  # [b, R] bool
    drop_rate: float,
    train: bool,
    rngs: Optional[nn.RngGen],
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    b, R, _ = visual.shape
    T = q_seq.shape[1]
    glimpse = len(params["q_prj"])

    # --- BiAttention maps -------------------------------------------------
    v_ = wn.fcnet_apply(params["att_v_net"], visual, "relu", drop_rate, train, rngs, compute_dtype)
    v_ = nn.dropout(v_, drop_rate, train, rngs)  # BCNet drops v_ again in forward
    q_ = wn.fcnet_apply(params["att_q_net"], q_seq, "relu", drop_rate, train, rngs, compute_dtype)
    h_mat = wn.wn_kernel(params["h_mat"], compute_dtype)  # [g, h*K]
    logits = jnp.einsum(
        "gk,bvk,bqk->bgvq",
        h_mat,
        v_.astype(compute_dtype),
        q_.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ) + params["h_bias"][None, :, None, None]  # [b, g, R, T]
    logits = jnp.where(roi_mask[:, None, :, None], logits, jnp.float32(-1e9))
    att = jax.nn.softmax(logits.reshape(b, glimpse, R * T), axis=-1).reshape(
        b, glimpse, R, T
    )

    # --- per-glimpse bilinear pooling with residual q updates ------------
    # q projections see the *updated* q_seq each glimpse (ban-vqa forward loop).
    for g in range(glimpse):
        v1 = wn.fcnet_apply(
            params["b_v_net"][g], visual, "relu", drop_rate, train, rngs, compute_dtype
        )
        q1 = wn.fcnet_apply(
            params["b_q_net"][g], q_seq, "relu", drop_rate, train, rngs, compute_dtype
        )
        b_emb = jnp.einsum(
            "bvk,bvq,bqk->bk",
            v1.astype(compute_dtype),
            att[:, g].astype(compute_dtype),
            q1.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )  # [b, h]
        prj = wn.fcnet_apply(
            params["q_prj"][g], b_emb, None, drop_rate, train, rngs, compute_dtype
        )
        q_seq = q_seq + prj[:, None, :]

    return jnp.sum(q_seq, axis=1), att
