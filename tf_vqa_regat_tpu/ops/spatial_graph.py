"""Vectorized 11-class spatial relation graph builder.

The reference ships an O(R^2) python-loop builder (model/position_emb.py:23-90)
that is *never called* anywhere in the repo — its spatial pipeline is
unfinished (SURVEY §2.3-P1). This is the completed, vectorized jnp version:
usable offline in the data pipeline or inside the jitted step.

Label semantics (kept bit-identical to the reference classifier, including its
fourth-quadrant ``-arccos(sin)`` quirk, since published ReGAT accuracy was
obtained with these labels):
  0      : no relation (center distance >= half the image diagonal)
  1      : box j strictly inside box i   (reverse edge gets 2)
  2      : box j strictly covers box i   (reverse edge gets 1)
  3      : IoU >= 0.5 (symmetric)
  4..11  : 8 angular sectors of pi/4 when centers are close
  12     : self loop (dropped by one-hot when label_num=11, as in the
           PyTorch original's broadcast)
Padded boxes (all-zero rows) get no edges.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_iou(bb: jnp.ndarray) -> jnp.ndarray:
    """[R, 4] -> [R, R] IoU with the reference's +1 box convention
    (position_emb.py:10-21)."""
    x1, y1, x2, y2 = (bb[:, k] for k in range(4))
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(0.0, ix2 - ix1 + 1.0) * jnp.maximum(0.0, iy2 - iy1 + 1.0)
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def build_spatial_graph(bb: jnp.ndarray, norm_bb: jnp.ndarray) -> jnp.ndarray:
    """Classify every ordered box pair into spatial classes.

    Args:
      bb: [R, 4] raw boxes (xmin, ymin, xmax, ymax).
      norm_bb: [R, 6] normalized spatial features; only row 0's last two
        entries are used to recover the image size (reference
        position_emb.py:40-41).

    Returns:
      [R, R] int32 label matrix (values 0..12).
    """
    R = bb.shape[0]
    x1, y1, x2, y2 = (bb[:, k] for k in range(4))
    w = x2 - x1 + 1.0
    h = y2 - y1 + 1.0
    cx = 0.5 * (x1 + x2)
    cy = 0.5 * (y1 + y2)

    image_h = h[0] / norm_bb[0, -1]
    image_w = w[0] / norm_bb[0, -2]
    image_diag = jnp.sqrt(image_h**2 + image_w**2)

    valid = jnp.sum(bb, axis=1) != 0.0  # [R]
    pair_valid = valid[:, None] & valid[None, :]

    inside = (  # j strictly inside i -> label(i,j)=1
        (x1[:, None] < x1[None, :])
        & (x2[:, None] > x2[None, :])
        & (y1[:, None] < y1[None, :])
        & (y2[:, None] > y2[None, :])
    )
    covers = inside.T  # j covers i -> label(i,j)=2

    iou = _pairwise_iou(bb)
    overlap = iou >= 0.5

    y_diff = cy[:, None] - cy[None, :]
    x_diff = cx[:, None] - cx[None, :]
    diag = jnp.sqrt(y_diff**2 + x_diff**2)
    close = diag < 0.5 * image_diag
    safe_diag = jnp.maximum(diag, 1e-12)
    sin_ij = y_diff / safe_diag
    cos_ij = x_diff / safe_diag

    two_pi = 2.0 * np.pi
    # Reference quadrant dispatch (position_emb.py:72-86), including the
    # -arccos(sin)+2pi fourth-quadrant formula. The reference only evaluates
    # this for ordered pairs i<j; the reverse edge (j,i) gets its own label_j
    # formula (2pi - label_i when sin>=0, label_i - pi when sin<0) rather than
    # the quadrant formula on the reversed vector — the two disagree because
    # the quadrant formulas are themselves inconsistent, and we keep the
    # reference's exact behavior.
    angle_i = jnp.where(
        (sin_ij >= 0) & (cos_ij >= 0),
        jnp.arcsin(sin_ij),
        jnp.where(
            (sin_ij < 0) & (cos_ij >= 0),
            jnp.arcsin(sin_ij) + two_pi,
            jnp.where(
                (sin_ij >= 0) & (cos_ij < 0),
                jnp.arccos(cos_ij),
                -jnp.arccos(jnp.clip(sin_ij, -1.0, 1.0)) + two_pi,
            ),
        ),
    )
    angle_j = jnp.where(sin_ij >= 0, two_pi - angle_i, angle_i - np.pi)
    sector_i = jnp.ceil(angle_i / (np.pi / 4.0)).astype(jnp.int32) + 3  # 4..11
    sector_j = jnp.ceil(angle_j / (np.pi / 4.0)).astype(jnp.int32) + 3
    upper = (
        jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    )
    sector = jnp.where(upper, sector_i, sector_j.T)

    labels = jnp.where(close, sector, 0)
    labels = jnp.where(overlap, 3, labels)
    labels = jnp.where(covers, 2, labels)
    labels = jnp.where(inside, 1, labels)
    labels = jnp.where(pair_valid, labels, 0)

    eye = jnp.eye(R, dtype=bool)
    labels = jnp.where(eye & valid[:, None], 12, labels)
    return labels.astype(jnp.int32)


def broadcast_adj_labels(adj: jnp.ndarray, label_num: int) -> jnp.ndarray:
    """Integer label matrix [..., R, R] -> one-hot float [..., R, R, label_num].

    Labels 1..label_num map to slices 0..label_num-1; label 0 (no edge) and
    out-of-range labels (e.g. the self-loop 12 when label_num=11) produce
    all-zero rows, matching the PyTorch original's torch_broadcast_adj_matrix.
    This is the op the reference stubs out (position_emb.py:92-93).
    """
    classes = jnp.arange(1, label_num + 1, dtype=adj.dtype)
    return (adj[..., None] == classes).astype(jnp.float32)
