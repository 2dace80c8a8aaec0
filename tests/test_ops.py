"""Unit tests for core ops: weight norm, FCNet, GRU, embedding, geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu import nn
from tf_vqa_regat_tpu.ops import weight_norm as wn
from tf_vqa_regat_tpu.ops.embedding import embedding_apply, embedding_init
from tf_vqa_regat_tpu.ops.gru import gru_apply, gru_init
from tf_vqa_regat_tpu.ops.position import (
    implicit_pos_emb,
    position_embedding,
    position_matrix,
)


# ------------------------------------------------------------------ WeightNorm
def test_wn_dense_scalar_g_whole_tensor_norm():
    key = jax.random.PRNGKey(0)
    p = wn.wn_dense_init(key, 5, 3)
    # g initialized to the Frobenius norm of v (reference weight_norm.py:37-39)
    np.testing.assert_allclose(
        float(p["g"]), float(jnp.linalg.norm(p["v"])), rtol=1e-6
    )
    # kernel == g * v / ||v||_F, so at init kernel == v
    k = wn.wn_kernel(p)
    np.testing.assert_allclose(np.asarray(k), np.asarray(p["v"]), rtol=1e-5)

    # scaling g by 2 scales the kernel by 2 (scalar g, not per-column)
    p2 = dict(p, g=p["g"] * 2.0)
    np.testing.assert_allclose(
        np.asarray(wn.wn_kernel(p2)), 2.0 * np.asarray(p["v"]), rtol=1e-5
    )


def test_wn_dense_matches_manual_matmul():
    key = jax.random.PRNGKey(1)
    p = wn.wn_dense_init(key, 4, 2)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 4))
    got = wn.wn_dense_apply(p, x)
    v = np.asarray(p["v"])
    kernel = float(p["g"]) * v / np.linalg.norm(v)
    want = np.asarray(x) @ kernel + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_fcnet_structure_eval_mode():
    """[in, hid, out] = two WN denses; relu after each (reference fc.py)."""
    key = jax.random.PRNGKey(3)
    p = wn.fcnet_init(key, [4, 8, 2])
    assert len(p["layers"]) == 2
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 4))
    y = wn.fcnet_apply(p, x, activation="relu")
    # relu applied after final layer too
    assert float(jnp.min(y)) >= 0.0


def test_fcnet_no_bias():
    p = wn.fcnet_init(jax.random.PRNGKey(5), [4, 2], use_bias=False)
    assert "b" not in p["layers"][0]


# ------------------------------------------------------------------- Embedding
def test_embedding_pad_masked():
    p = embedding_init(jax.random.PRNGKey(0), 11, 8)  # 10 words + pad row
    ids = jnp.array([[1, 2, 10, 10]])  # padding_idx = 10
    out = embedding_apply(p, ids, padding_idx=10)
    assert out.shape == (1, 4, 8)
    np.testing.assert_allclose(np.asarray(out[0, 2]), 0.0)
    np.testing.assert_allclose(np.asarray(out[0, 3]), 0.0)
    assert float(jnp.abs(out[0, 0]).sum()) > 0


# ------------------------------------------------------------------------- GRU
def _ref_gru_numpy(params, x_seq):
    """Straight-line numpy transcription of keras v2 GRU (reset_after=True)."""
    kernel = np.asarray(params["kernel"])
    rk = np.asarray(params["recurrent_kernel"])
    b_in = np.asarray(params["bias"][0])
    b_rec = np.asarray(params["bias"][1])
    b, T, _ = x_seq.shape
    h_dim = rk.shape[0]
    h = np.zeros((b, h_dim), np.float32)
    outs = []
    sigmoid = lambda z: 1.0 / (1.0 + np.exp(-z))
    for t in range(T):
        mx = x_seq[:, t] @ kernel + b_in
        mh = h @ rk + b_rec
        xz, xr, xh = np.split(mx, 3, axis=-1)
        rz, rr, rh = np.split(mh, 3, axis=-1)
        z = sigmoid(xz + rz)
        r = sigmoid(xr + rr)
        hh = np.tanh(xh + r * rh)
        h = z * h + (1 - z) * hh
        outs.append(h)
    return np.stack(outs, axis=1)


def test_gru_matches_reference_equations():
    key = jax.random.PRNGKey(7)
    p = gru_init(key, 6, 5)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(8), (2, 4, 6)))
    got = np.asarray(gru_apply(p, jnp.asarray(x)))
    want = _ref_gru_numpy(p, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.shape == (2, 4, 5)


def test_gru_orthogonal_recurrent_init():
    p = gru_init(jax.random.PRNGKey(9), 4, 8)
    rk = np.asarray(p["recurrent_kernel"])  # [8, 24]
    # each of the 3 gate blocks has orthonormal columns
    # (full [8,24] matrix has orthonormal rows from jax orthogonal init)
    np.testing.assert_allclose(rk @ rk.T, np.eye(8), atol=1e-5)


# -------------------------------------------------------------------- Geometry
def _ref_position_matrix(bb, nongt_dim):
    """Numpy transcription of reference position_emb.py:117-151 with the
    corrected (query, key) slice orientation (columns, not rows)."""
    xmin, ymin, xmax, ymax = bb[..., 0], bb[..., 1], bb[..., 2], bb[..., 3]
    w = xmax - xmin + 1.0
    h = ymax - ymin + 1.0
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)
    dx = np.abs(cx[:, :, None] - cx[:, None, :]) / w[:, :, None]
    dx = np.log(np.maximum(dx, 1e-3))
    dy = np.abs(cy[:, :, None] - cy[:, None, :]) / h[:, :, None]
    dy = np.log(np.maximum(dy, 1e-3))
    dw = np.log(w[:, :, None] / w[:, None, :])
    dh = np.log(h[:, :, None] / h[:, None, :])
    m = np.stack([dx, dy, dw, dh], axis=-1)
    return m[:, :, :nongt_dim, :]


def test_position_matrix_correct_pairing():
    rng = np.random.RandomState(0)
    bb = np.abs(rng.randn(2, 7, 4)).astype(np.float32)
    bb[..., 2:] += bb[..., :2] + 1.0  # xmax > xmin etc.
    got = np.asarray(position_matrix(jnp.asarray(bb), 3))
    want = _ref_position_matrix(bb, 3)
    assert got.shape == (2, 7, 3, 4)
    # float32 log/divide op-order differences between XLA and numpy
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def _ref_position_embedding(pos_mat, feat_dim=64, wave=1000.0):
    """Numpy transcription of reference position_emb.py:96-115."""
    feat_range = np.arange(0, feat_dim / 8)
    dim_mat = np.power(wave, (8.0 / feat_dim) * feat_range)
    scaled = (100.0 * pos_mat)[..., None] / dim_mat
    emb = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=-1)
    return emb.reshape(*pos_mat.shape[:3], feat_dim)


def test_position_embedding_matches_reference():
    rng = np.random.RandomState(1)
    pm = rng.randn(2, 5, 3, 4).astype(np.float32)
    got = np.asarray(position_embedding(jnp.asarray(pm), 64))
    want = _ref_position_embedding(pm)
    # sin/cos of ~100x-scaled args amplify f32 input rounding
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_implicit_pos_emb_no_nans_on_padded_boxes():
    bb = np.zeros((1, 6, 4), np.float32)  # all padded
    out = np.asarray(implicit_pos_emb(jnp.asarray(bb), 4, 64))
    assert np.isfinite(out).all()


# --------------------------------------------------------------------- Dropout
def test_dropout_disabled_in_eval():
    x = jnp.ones((4, 4))
    assert (nn.dropout(x, 0.5, train=False, rngs=None) == x).all()


def test_dropout_scales_and_masks():
    rngs = nn.RngGen(jax.random.PRNGKey(0))
    x = jnp.ones((1000,))
    y = np.asarray(nn.dropout(x, 0.5, train=True, rngs=rngs))
    kept = y[y != 0]
    np.testing.assert_allclose(kept, 2.0)  # inverted dropout scaling
    assert 300 < (y == 0).sum() < 700


def test_dropout_extreme_rates():
    """The 8-bit mask quantization must not crash or silently disable
    dropout at the rate extremes: rate >= 1 drops everything, tiny rates
    clamp to 1/256 (still stochastic), huge rates clamp to 255/256 (some
    elements still kept, no uint8 wraparound / division by zero)."""
    x = jnp.ones((4096,))
    rngs = nn.RngGen(jax.random.PRNGKey(1))
    assert (nn.dropout(x, 1.0, train=True, rngs=rngs) == 0).all()
    y_tiny = np.asarray(nn.dropout(x, 1e-4, train=True, rngs=rngs))
    assert 0 < (y_tiny == 0).sum() < 200  # ~1/256 of 4096 = 16
    y_huge = np.asarray(nn.dropout(x, 0.999, train=True, rngs=rngs))
    kept = (y_huge != 0).sum()
    assert 0 < kept < 200  # ~1/256 kept, scaled by 256
    np.testing.assert_allclose(y_huge[y_huge != 0], 256.0)


def test_rnggen_deterministic():
    a = nn.RngGen(jax.random.PRNGKey(3))
    b = nn.RngGen(jax.random.PRNGKey(3))
    assert (a.next() == b.next()).all()
    assert (a.next() == b.next()).all()
