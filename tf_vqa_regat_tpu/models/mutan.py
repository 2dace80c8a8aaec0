"""MuTAN fusion: multimodal Tucker decomposition (net-new model family).

The reference accepts ``--fusion mutan`` but hardwires BUTD
(reference main.py:51-52, rel_graph_net.py:106; SURVEY §2.2-M12). This module
implements the fusion used by the PyTorch ReGAT: a Mutan block (Ben-Younes et
al., ICCV 2017, via the `block` fusion library, mm_dim=1200,
dropout_input=0.1) for both a 2-glimpse attention over rois and the final
answer scoring.

Mutan block over inputs (x0, x1):
  z = sum_r (W0_r @ L0(x0)) * (W1_r @ L1(x1));  out = Lout(z)
i.e. a rank-`rank` Tucker factorization of the full bilinear interaction.

Unlike BUTD/BAN, MuTAN produces **answer logits directly** (the PyTorch ReGAT
sets classifier=None for mutan); models/regat.py skips the classifier.

Framework addition: invalid rois are masked out of the attention softmax.
Dropout: this net-new family takes cfg.dropout directly (no reference code
pins a default; see models/regat.py's dropout-topology note).

TPU restructure: whenever the q-side of the attention Tucker block stays
per-example ([b, 1, :] — eval always; train under --dropout 0 or
cfg.mutan_shared_qdrop), the rank sum is reassociated into per-example
folded weights (z = h1 @ (sum_r W1_r * m0_r) — exact, ~15x fewer FLOPs on
the family's dominant matmul tier; see _mutan_block_apply and PERF_NOTES
"MuTAN rank-sum reassociation").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu import nn
from tf_vqa_regat_tpu.ops import weight_norm as wn

MM_DIM = 1200  # ReGAT's fusions.Mutan(..., mm_dim=1200)
ATT_DIM = 360  # MuTAN_Attention dim_out
MLP_HID = 512  # attention MLP hidden


def _linear_init(key, in_dim, out_dim):
    return {
        "w": nn.glorot_uniform(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def _linear(p, x, compute_dtype):
    return (
        jnp.dot(
            x.astype(compute_dtype),
            p["w"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + p["b"]
    )


def _mutan_block_init(key, dim0, dim1, out_dim, rank):
    keys = jax.random.split(key, 5)
    return {
        "linear0": _linear_init(keys[0], dim0, MM_DIM),
        "linear1": _linear_init(keys[1], dim1, MM_DIM),
        "merge0": _linear_init(keys[2], MM_DIM, MM_DIM * rank),
        "merge1": _linear_init(keys[3], MM_DIM, MM_DIM * rank),
        "linear_out": _linear_init(keys[4], MM_DIM, out_dim),
    }


def _mutan_block_apply(
    p, x0, x1, rank, drop_input, train, rngs, compute_dtype, shared_qdrop=False
):
    """x0 may arrive with a size-1 middle axis ([b, 1, d0] vs x1 [b, R, d1]):
    a question broadcast over rois. Its linear0/merge0 matmuls then run once
    per example instead of once per roi and the elementwise Tucker product
    broadcasts — exact, and ~2x fewer FLOPs in the attention block wherever
    no input dropout runs (eval; measured in PERF_NOTES). In train mode with
    input dropout the pre-merge activations are broadcast BEFORE the dropout
    by default, so the per-roi mask semantics (PyTorch `block` fusion, rois
    flattened into the batch) are preserved bit-for-bit — train cost is
    unchanged. With ``shared_qdrop`` (cfg.mutan_shared_qdrop) the mask is
    drawn once per example at [b, 1, :] instead, keeping the q-side
    per-example in train too — which also makes the rank-sum reassociation
    below apply to the train step (8.0 -> 1.7 TF/step, +74% train q/s
    measured; PERF_NOTES "MuTAN shared q-mask" + "rank-sum reassociation").
    Identical whenever no input dropout runs."""
    h0 = _linear(p["linear0"], x0, compute_dtype)
    h1 = _linear(p["linear1"], x1, compute_dtype)
    if train and drop_input > 0.0:
        if (
            not shared_qdrop
            and h0.ndim == 3
            and h0.shape[1] == 1
            and x1.ndim == 3
        ):
            h0 = jnp.broadcast_to(h0, (h0.shape[0], x1.shape[1], h0.shape[2]))
        h0 = nn.dropout(h0, drop_input, train, rngs)
        h1 = nn.dropout(h1, drop_input, train, rngs)
    if h0.ndim == 3 and h0.shape[1] == 1 and x1.ndim == 3:
        # Rank-sum reassociation (exact in real arithmetic — the same
        # rank x MM_DIM terms summed with the nesting reordered): when the
        # q-side stays per-example, z = sum_r m0_r * (h1 @ W1_r + b1_r)
        #                             = h1 @ M + zb
        # with M[b] = sum_r W1_r * m0_r[b]   (per-example folded weights)
        #      zb[b] = sum_r m0_r[b] * b1_r.
        # The v-side merge then never materializes [b, R, rank*MM]: a
        # [b*R, MM] x [MM, rank*MM] matmul (the dominant counted-FLOP tier
        # of this family, PERF_NOTES config matrix) becomes an M build
        # (rank x MM^2 per example) + a [b, R, MM] x [b, MM, MM] batched
        # matmul — ~15x fewer FLOPs at rank 15. Applies to eval always and
        # to train under cfg.mutan_shared_qdrop / --dropout 0 (per-roi
        # masks make m0 roi-dependent, forcing the naive path below).
        b = h0.shape[0]
        m0r = _linear(p["merge0"], h0, compute_dtype).reshape(b, rank, MM_DIM)
        w1r = p["merge1"]["w"].astype(compute_dtype).reshape(-1, rank, MM_DIM)
        m0r = m0r.astype(compute_dtype)
        # M and z stay in compute_dtype (the MXU still accumulates each dot
        # in f32 internally; under the f32 parity mode this is exactly the
        # f32 math). An explicit f32 output + cast on the [b, MM, MM] fold
        # showed as 2.5 ms/step of convert in the profile but removing it
        # measured ~flat end-to-end (the convert overlapped); kept in
        # compute_dtype for the halved M activation footprint.
        fold = jnp.einsum("krj,brj->bkj", w1r, m0r)
        zb = jnp.einsum(
            "brj,rj->bj",
            m0r,
            p["merge1"]["b"].astype(compute_dtype).reshape(rank, MM_DIM),
        )
        z = (
            jnp.einsum("bik,bkj->bij", h1.astype(compute_dtype), fold)
            + zb[:, None, :]
        )
    else:
        m0 = _linear(p["merge0"], h0, compute_dtype)
        m1 = _linear(p["merge1"], h1, compute_dtype)
        m = m0 * m1  # broadcasts over the roi axis when h0 stayed [b, 1, :]
        z = jnp.sum(m.reshape(*m.shape[:-1], rank, MM_DIM), axis=-2)
    return _linear(p["linear_out"], z, compute_dtype)


def mutan_init(
    key: jax.Array,
    v_dim: int,
    q_dim: int,
    num_ans: int,
    rank: int,
    glimpse: int = 2,
) -> Dict[str, Any]:
    keys = jax.random.split(key, 4)
    return {
        "att_fusion": _mutan_block_init(keys[0], q_dim, v_dim, ATT_DIM, rank),
        "att_linear0": wn.fcnet_init(keys[1], [ATT_DIM, MLP_HID]),
        "att_linear1": wn.fcnet_init(keys[2], [MLP_HID, glimpse]),
        "out_fusion": _mutan_block_init(keys[3], q_dim, v_dim * glimpse, num_ans, rank),
    }


def mutan_apply(
    params: Dict[str, Any],
    visual: jax.Array,  # [b, R, v_dim]
    question: jax.Array,  # [b, q_dim] (last GRU state)
    roi_mask: jax.Array,  # [b, R] bool
    drop_rate: float,
    train: bool,
    rngs: Optional[nn.RngGen],
    compute_dtype=jnp.float32,
    rank: int = 15,
    shared_qdrop: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (answer logits [b, num_ans], attention [b, R, glimpse])."""
    b, R, v_dim = visual.shape
    # question enters [b, 1, q_dim]: its side of the Tucker block broadcasts
    # over rois (see _mutan_block_apply — exact, and 2x fewer eval FLOPs)
    alpha = _mutan_block_apply(
        params["att_fusion"], question[:, None, :], visual, rank,
        0.1 if drop_rate > 0 else 0.0, train,
        rngs, compute_dtype, shared_qdrop=shared_qdrop,
    )  # [b, R, ATT_DIM]
    alpha = wn.fcnet_apply(params["att_linear0"], alpha, None, 0.0, train, rngs, compute_dtype)
    alpha = wn.fcnet_apply(params["att_linear1"], alpha, None, 0.0, train, rngs, compute_dtype)
    # f32 softmax statistics under bf16 activations (explicit — the f32 mask
    # scalar would promote anyway, but don't rely on promotion rules)
    alpha = jnp.where(roi_mask[..., None], alpha.astype(jnp.float32), jnp.float32(-1e9))
    alpha = jax.nn.softmax(alpha, axis=1)  # [b, R, glimpse]

    # Glimpse-weighted visual sums, concatenated: [b, glimpse * v_dim].
    v_out = jnp.einsum(
        "brg,brd->bgd",
        alpha.astype(compute_dtype),
        visual.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(b, -1)

    logits = _mutan_block_apply(
        params["out_fusion"], question, v_out, rank,
        0.1 if drop_rate > 0 else 0.0, train, rngs, compute_dtype,
    )
    return logits, alpha
