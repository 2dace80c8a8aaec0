"""In-jit geometry: pairwise position matrix + sinusoidal position embedding.

The reference computed these on host in numpy every step, serialized with the
GPU (model/position_emb.py:96-160, called from train.py:97). Here they are pure
jnp functions of the raw bounding boxes, traced into the jitted train step so
XLA fuses them with the attention prologue and they ride the VPU.

Pairing-orientation note (SURVEY §2.3-P2): the reference sliced the first
``nongt_dim`` *rows* (queries) of the pairwise matrix instead of columns
(keys), producing a ``[b, nongt, R, 4]`` tensor that a downstream flat reshape
silently regrouped, scrambling (query, key) pair identity whenever R != nongt.
This implementation uses the correct pairing — entry ``[b, i, j]`` describes
query-roi ``i`` against key-roi ``j`` (the j-th of the first ``nongt_dim``
rois) — matching the PyTorch original and the docstring contract at
reference rel_graph_net.py:30.
"""

from __future__ import annotations

import jax.numpy as jnp


def _pair_geometry(bb: jnp.ndarray, q_sel: slice, k_sel: slice) -> jnp.ndarray:
    """Pairwise geometric features between two slices of the roi axis.

    Entry [b, i, j] describes row-roi ``i`` (from ``q_sel``) against
    column-roi ``j`` (from ``k_sel``): (log|dx/w_i|, log|dy/h_i|,
    log(w_i/w_j), log(h_i/h_j)), the first two clamped at 1e-3
    (reference position_emb.py:117-151).
    """
    xmin, ymin, xmax, ymax = (bb[..., k] for k in range(4))  # [b, R]
    w = xmax - xmin + 1.0
    h = ymax - ymin + 1.0
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)

    qw, qh, qcx, qcy = w[:, q_sel], h[:, q_sel], cx[:, q_sel], cy[:, q_sel]
    kw, kh, kcx, kcy = w[:, k_sel], h[:, k_sel], cx[:, k_sel], cy[:, k_sel]

    eps = 1e-3
    dx = jnp.log(jnp.maximum(jnp.abs(qcx[:, :, None] - kcx[:, None, :]) / qw[:, :, None], eps))
    dy = jnp.log(jnp.maximum(jnp.abs(qcy[:, :, None] - kcy[:, None, :]) / qh[:, :, None], eps))
    dw = jnp.log(qw[:, :, None] / kw[:, None, :])
    dh = jnp.log(qh[:, :, None] / kh[:, None, :])
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def position_matrix(bb: jnp.ndarray, nongt_dim: int) -> jnp.ndarray:
    """Pairwise geometric features, correct (query, key) pairing.

    Args:
      bb: [b, R, 4] raw boxes (xmin, ymin, xmax, ymax).
      nongt_dim: number of key rois (first `nongt_dim` of R).

    Returns:
      [b, R, nongt_dim, 4]: query i (all R) vs key j (first nongt_dim).
    """
    return _pair_geometry(bb, slice(None), slice(None, nongt_dim))


def position_embedding(pos_mat: jnp.ndarray, feat_dim: int, wave_length: float = 1000.0) -> jnp.ndarray:
    """Relation-Networks sinusoidal embedding (reference position_emb.py:96-115).

    Args:
      pos_mat: [b, R, n, 4].
      feat_dim: output embedding dim (64).

    Returns:
      [b, R, n, feat_dim]; layout is 4 geometric dims x (feat_dim/8 sin then
      feat_dim/8 cos), matching the reference's reshape.

    TPU note: the naive [..., 4, feat_dim/8] formulation leaves trailing dims
    of 4 and 8 — padded to full (8, 128) VPU tiles, ~30x wasted lanes (measured
    ~2.9 ms at batch 256). This computes directly in the final
    [..., feat_dim] lane layout: repeat the 4 geometric features 2*(feat_dim/8)
    times, divide by a precomputed per-lane frequency pattern, and select
    sin/cos per lane.
    """
    k = feat_dim // 8  # frequencies per (geom, sin|cos) block
    lane = jnp.arange(feat_dim)
    freq_idx = (lane % (2 * k)) % k
    inv_dim = jnp.power(wave_length, -(8.0 / feat_dim) * freq_idx.astype(jnp.float32))
    is_cos = (lane % (2 * k)) >= k  # [feat_dim]
    scaled = jnp.repeat(100.0 * pos_mat, 2 * k, axis=-1) * inv_dim  # [b,R,n,feat_dim]
    return jnp.where(is_cos, jnp.cos(scaled), jnp.sin(scaled))


def implicit_pos_emb(bb: jnp.ndarray, nongt_dim: int, feat_dim: int) -> jnp.ndarray:
    """Fused position matrix + embedding, the in-jit replacement for the
    reference's per-step host call to prepare_graph_variables
    (position_emb.py:153-160)."""
    return position_embedding(position_matrix(bb, nongt_dim), feat_dim)


def position_matrix_ref_compat(bb: jnp.ndarray, nongt_dim: int) -> jnp.ndarray:
    """Reference-quirk-compatible position matrix (cfg.ref_compat_pos).

    The reference slices the first ``nongt_dim`` *rows* of the pairwise
    matrix (queries) instead of columns (keys), yielding [b, n, R, 4]
    (position_emb.py:148 `sym[:, :nongt_dim]` after building row=i,col=j
    deltas), and its attention layer then flat-reshapes that tensor as if it
    were [b, R, n, emb] (graph_att_layer.py:74-81), scrambling (query, key)
    pair identity whenever R != nongt_dim. This reproduces the net effect
    exactly: build the row-sliced matrix, then re-group it so downstream
    correct-pairing code (ops/graph_attention.py) sees the same values the
    reference's layer saw at the same flat positions. (The regroup commutes
    with the per-pair sinusoid embedding, so reshaping the 4-feature matrix
    is equivalent to reshaping the embedded tensor.) Used by the
    trajectory-equivalence tests and the fix A/B; the default path is the
    corrected `position_matrix`.
    """
    b, R, _ = bb.shape
    n = min(nongt_dim, R)
    pm = _pair_geometry(bb, slice(None, n), slice(None))  # [b, n, R, 4]
    return pm.reshape(b, R, n, 4)  # flat regroup, as the layer does


def implicit_pos_emb_ref_compat(
    bb: jnp.ndarray, nongt_dim: int, feat_dim: int
) -> jnp.ndarray:
    """Embedded form of `position_matrix_ref_compat` (see its docstring)."""
    return position_embedding(position_matrix_ref_compat(bb, nongt_dim), feat_dim)
