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


def position_matrix(bb: jnp.ndarray, nongt_dim: int) -> jnp.ndarray:
    """Pairwise geometric features.

    Args:
      bb: [b, R, 4] raw boxes (xmin, ymin, xmax, ymax).
      nongt_dim: number of key rois (first `nongt_dim` of R).

    Returns:
      [b, R, nongt_dim, 4] with (log|dx/w_i|, log|dy/h_i|, log(w_i/w_j),
      log(h_i/h_j)), each clamped at 1e-3 for the first two
      (reference position_emb.py:117-151).
    """
    xmin, ymin, xmax, ymax = (bb[..., k] for k in range(4))  # [b, R]
    w = xmax - xmin + 1.0
    h = ymax - ymin + 1.0
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)

    kw = w[:, :nongt_dim]  # [b, n]
    kh = h[:, :nongt_dim]
    kcx = cx[:, :nongt_dim]
    kcy = cy[:, :nongt_dim]

    eps = 1e-3
    # [b, R, n]: query i vs key j.
    dx = jnp.log(jnp.maximum(jnp.abs(cx[:, :, None] - kcx[:, None, :]) / w[:, :, None], eps))
    dy = jnp.log(jnp.maximum(jnp.abs(cy[:, :, None] - kcy[:, None, :]) / h[:, :, None], eps))
    dw = jnp.log(w[:, :, None] / kw[:, None, :])
    dh = jnp.log(h[:, :, None] / kh[:, None, :])
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def position_embedding(pos_mat: jnp.ndarray, feat_dim: int, wave_length: float = 1000.0) -> jnp.ndarray:
    """Relation-Networks sinusoidal embedding (reference position_emb.py:96-115).

    Args:
      pos_mat: [b, R, n, 4].
      feat_dim: output embedding dim (64).

    Returns:
      [b, R, n, feat_dim]; layout is 4 geometric dims x (feat_dim/8 sin then
      feat_dim/8 cos), matching the reference's reshape.
    """
    feat_range = jnp.arange(0, feat_dim / 8.0, dtype=jnp.float32)
    dim_mat = jnp.power(wave_length, (8.0 / feat_dim) * feat_range)  # [feat_dim/8]
    scaled = (100.0 * pos_mat)[..., None] / dim_mat  # [b, R, n, 4, feat_dim/8]
    emb = jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)
    return emb.reshape(*pos_mat.shape[:3], feat_dim)


def implicit_pos_emb(bb: jnp.ndarray, nongt_dim: int, feat_dim: int) -> jnp.ndarray:
    """Fused position matrix + embedding, the in-jit replacement for the
    reference's per-step host call to prepare_graph_variables
    (position_emb.py:153-160)."""
    return position_embedding(position_matrix(bb, nongt_dim), feat_dim)
