"""Graph attention oracle: vs a numpy transcription of the reference math,
plus the padding-invariance property the TPU design adds."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu.ops.graph_attention import (
    graph_attention_apply,
    graph_attention_init,
)
from tf_vqa_regat_tpu.ops.spatial_graph import (
    broadcast_adj_labels,
    build_spatial_graph,
)


def _np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _np_wn_kernel(p):
    v = np.asarray(p["v"], np.float64)
    return float(p["g"]) * v / np.linalg.norm(v)


def _np_fc(p, x):
    out = x
    for layer in p["layers"]:
        out = out @ _np_wn_kernel(layer)
        if "b" in layer:
            out = out + np.asarray(layer["b"], np.float64)
    return out


def _np_graph_attention(params, roi, n, H, pos_emb=None, adj_mask=None, label_bias=None):
    """Numpy transcription of reference graph_att_layer.py:39-121 (eval mode,
    all rois valid)."""
    b, R, D = roi.shape
    dh = D // H
    q = _np_fc(params["query"], roi).reshape(b, R, H, dh)
    k = _np_fc(params["key"], roi[:, :n]).reshape(b, n, H, dh)
    aff = np.einsum("brhd,bnhd->brhn", q, k) / np.sqrt(dh)
    if pos_emb is not None:
        pw = _np_fc(params["pair_pos_fc"], pos_emb)  # [b, R, n, H]
        pw = np.maximum(pw, 0.0)
        aff = aff + np.log(np.maximum(pw, 1e-6)).transpose(0, 1, 3, 2)
    if adj_mask is not None:
        aff = np.where((adj_mask > 0)[:, :, None, :], aff, -9e15)
    if label_bias is not None:
        aff = aff + label_bias[:, :, None, :]
    w = _np_softmax(aff, axis=-1)
    att = np.einsum("brhn,bnd->brhd", w, roi[:, :n])
    kernel = _np_wn_kernel_grouped(params["out"])  # [H, D, o]
    out = np.einsum("brhd,hdo->brho", att, kernel).reshape(b, R, D)
    return out + np.asarray(params["out"]["b"], np.float64)


def _np_wn_kernel_grouped(p):
    v = np.asarray(p["v"], np.float64)
    return float(p["g"]) * v / np.linalg.norm(v.ravel())


def _mk_inputs(b=2, R=9, D=64, n=5, H=4, pos_dim=16, seed=0):
    rng = np.random.RandomState(seed)
    roi = rng.randn(b, R, D).astype(np.float32)
    pos = rng.randn(b, R, n, pos_dim).astype(np.float32)
    return roi, pos


def test_implicit_matches_numpy_reference():
    roi, pos = _mk_inputs()
    params = graph_attention_init(jax.random.PRNGKey(0), 64, 4, pos_emb_dim=16)
    got = np.asarray(
        graph_attention_apply(
            params, jnp.asarray(roi), nongt_dim=5, num_heads=4,
            pos_emb=jnp.asarray(pos), train=False,
        )
    )
    want = _np_graph_attention(params, roi.astype(np.float64), 5, 4, pos_emb=pos)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_explicit_masking_matches_numpy_reference():
    roi, _ = _mk_inputs(seed=1)
    b, R, n, H = 2, 9, 5, 4
    rng = np.random.RandomState(2)
    adj = (rng.rand(b, R, n) > 0.4).astype(np.float32)
    adj[:, :, 0] = 1.0  # at least one edge per query
    label_bias = rng.randn(b, R, n).astype(np.float32)
    params = graph_attention_init(jax.random.PRNGKey(1), 64, 4, pos_emb_dim=-1)
    got = np.asarray(
        graph_attention_apply(
            params, jnp.asarray(roi), nongt_dim=n, num_heads=H,
            adj_mask=jnp.asarray(adj), label_bias=jnp.asarray(label_bias),
        )
    )
    want = _np_graph_attention(
        params, roi.astype(np.float64), n, H, adj_mask=adj, label_bias=label_bias
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_label_bias_applied_before_mask_is_shift_invariant():
    """Reference adds label bias *after* masking (graph_att_layer.py:100); with
    a full adjacency a constant bias must not change the output."""
    roi, _ = _mk_inputs(seed=3)
    params = graph_attention_init(jax.random.PRNGKey(2), 64, 4, pos_emb_dim=-1)
    adj = jnp.ones((2, 9, 5))
    base = graph_attention_apply(
        params, jnp.asarray(roi), 5, 4, adj_mask=adj,
        label_bias=jnp.zeros((2, 9, 5)),
    )
    shifted = graph_attention_apply(
        params, jnp.asarray(roi), 5, 4, adj_mask=adj,
        label_bias=3.7 * jnp.ones((2, 9, 5)),
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(shifted), rtol=1e-4, atol=1e-5)


def test_padding_invariance_with_key_mask():
    """With key/query masking, growing the static padding must not change
    outputs for valid rois — the property that justifies static 100-roi
    shapes on TPU."""
    rng = np.random.RandomState(4)
    b, valid, D, n, H = 2, 7, 64, 5, 4
    roi_small = rng.randn(b, valid, D).astype(np.float32)
    pos_small = rng.randn(b, valid, n, 16).astype(np.float32)
    params = graph_attention_init(jax.random.PRNGKey(3), D, H, pos_emb_dim=16)

    R_big = 12
    roi_big = np.zeros((b, R_big, D), np.float32)
    roi_big[:, :valid] = roi_small
    pos_big = np.zeros((b, R_big, n, 16), np.float32)
    pos_big[:, :valid] = pos_small

    key_mask = jnp.asarray(np.arange(n) < valid)[None, :].repeat(b, 0)
    out_small = graph_attention_apply(
        params, jnp.asarray(roi_small), n, H, pos_emb=jnp.asarray(pos_small),
        key_mask=key_mask,
    )
    out_big = graph_attention_apply(
        params, jnp.asarray(roi_big), n, H, pos_emb=jnp.asarray(pos_big),
        key_mask=key_mask,
    )
    np.testing.assert_allclose(
        np.asarray(out_big)[:, :valid], np.asarray(out_small), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------- spatial graph
def _np_build_graph(bbox, spatial):
    """Numpy transcription of reference position_emb.py:23-90 (python loops)."""
    import math

    num_box = bbox.shape[0]
    adj = np.zeros((num_box, num_box))
    xmin, ymin, xmax, ymax = np.split(bbox, 4, axis=1)
    bw = xmax - xmin + 1.0
    bh = ymax - ymin + 1.0
    # [i, 0] scalars (the split columns are [N, 1]): math.sqrt/int() on
    # ndim>0 single-element arrays is deprecated since numpy 1.25 and will
    # error in future numpy — same math, warning-free
    image_h = bh[0, 0] / spatial[0, -1]
    image_w = bw[0, 0] / spatial[0, -2]
    cx = 0.5 * (xmin + xmax)
    cy = 0.5 * (ymin + ymax)
    diag_img = math.sqrt(image_h**2 + image_w**2)

    def iou(a, b):
        ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
        ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0, ix2 - ix1 + 1) * max(0, iy2 - iy1 + 1)
        A = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
        B = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
        return inter / (A + B - inter)

    for i in range(num_box):
        if bbox[i].sum() == 0:
            continue
        adj[i, i] = 12
        for j in range(i + 1, num_box):
            if bbox[j].sum() == 0:
                continue
            if (
                xmin[i] < xmin[j] and xmax[i] > xmax[j]
                and ymin[i] < ymin[j] and ymax[i] > ymax[j]
            ):
                adj[i, j], adj[j, i] = 1, 2
            elif (
                xmin[j] < xmin[i] and xmax[j] > xmax[i]
                and ymin[j] < ymin[i] and ymax[j] > ymax[i]
            ):
                adj[i, j], adj[j, i] = 2, 1
            elif iou(bbox[i], bbox[j]) >= 0.5:
                adj[i, j] = adj[j, i] = 3
            else:
                yd = cy[i, 0] - cy[j, 0]
                xd = cx[i, 0] - cx[j, 0]
                d = math.sqrt(yd**2 + xd**2)
                if d < 0.5 * diag_img:
                    s, c = yd / d, xd / d
                    if s >= 0 and c >= 0:
                        li = np.arcsin(s)
                        lj = 2 * math.pi - li
                    elif s < 0 and c >= 0:
                        li = np.arcsin(s) + 2 * math.pi
                        lj = li - math.pi
                    elif s >= 0 and c < 0:
                        li = np.arccos(c)
                        lj = 2 * math.pi - li
                    else:
                        li = -np.arccos(s) + 2 * math.pi
                        lj = li - math.pi
                    adj[i, j] = int(np.ceil(li / (math.pi / 4))) + 3
                    adj[j, i] = int(np.ceil(lj / (math.pi / 4))) + 3
    return adj


def test_spatial_graph_matches_reference_loops():
    rng = np.random.RandomState(5)
    R = 12
    xy = rng.rand(R, 2) * 300
    wh = rng.rand(R, 2) * 200 + 5
    bb = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    bb[-2:] = 0.0  # two padded boxes
    norm_bb = np.zeros((R, 6), np.float32)
    W, H = 640.0, 480.0
    norm_bb[:, -2] = (bb[:, 2] - bb[:, 0] + 1) / W
    norm_bb[:, -1] = (bb[:, 3] - bb[:, 1] + 1) / H
    got = np.asarray(build_spatial_graph(jnp.asarray(bb), jnp.asarray(norm_bb)))
    want = _np_build_graph(bb.astype(np.float64), norm_bb.astype(np.float64))
    np.testing.assert_array_equal(got, want.astype(np.int32))


def test_broadcast_adj_labels():
    adj = jnp.asarray([[0, 1], [12, 11]])
    oh = np.asarray(broadcast_adj_labels(adj, 11))
    assert oh.shape == (2, 2, 11)
    assert oh[0, 0].sum() == 0  # no edge
    assert oh[0, 1, 0] == 1  # label 1 -> slice 0
    assert oh[1, 0].sum() == 0  # self loop 12 dropped at label_num=11
    assert oh[1, 1, 10] == 1  # label 11 -> slice 10


def _gatt_params(key, dims=48, heads=4, pos_dim=16, label_num=5, label_bias=True):
    from tf_vqa_regat_tpu.models.relation import gatt_net_init

    return gatt_net_init(
        key, dir_num=2, label_num=label_num, in_feat_dim=dims, out_feat_dim=dims,
        num_heads=heads, pos_emb_dim=pos_dim, label_bias=label_bias,
        use_label_bias_net=(pos_dim <= 0),
    )


def test_folded_dual_attention_matches_unfolded_implicit():
    """graph_attention_apply_dual (one 2H-head program) must equal the two
    per-direction calls summed — implicit path (pos_mat bias chain), eval
    mode (no dropout, so the fold's shared-mask deviation is inert)."""
    from tf_vqa_regat_tpu.models.relation import gatt_net_apply

    b, R, D, H, n = 3, 17, 48, 4, 6
    key = jax.random.PRNGKey(0)
    params = _gatt_params(key, dims=D, heads=H, pos_dim=16)
    v = jax.random.normal(jax.random.PRNGKey(1), (b, R, D))
    pos_mat = jax.random.normal(jax.random.PRNGKey(2), (b, R, n, 4)) * 0.3
    roi_mask = jnp.arange(R)[None, :] < jnp.asarray([17, 9, 4])[:, None]

    kw = dict(nongt_dim=n, num_heads=H, roi_mask=roi_mask, pos_mat=pos_mat,
              drop_rate=0.2, train=False, rngs=None)
    folded = gatt_net_apply(params, v, fold=True, **kw)
    dual = gatt_net_apply(params, v, fold=False, **kw)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(dual), atol=2e-5)


def test_folded_dual_attention_matches_unfolded_explicit():
    """Same, explicit path: per-direction adjacency masks (adj and adjT) and
    per-edge-label biases must land on the right head blocks of the folded
    2H computation."""
    from tf_vqa_regat_tpu.models.relation import gatt_net_apply

    b, R, D, H, n, L = 3, 13, 48, 4, 6, 5
    params = _gatt_params(jax.random.PRNGKey(3), dims=D, heads=H, pos_dim=-1,
                          label_num=L, label_bias=True)
    v = jax.random.normal(jax.random.PRNGKey(4), (b, R, D))
    labels = jax.random.randint(jax.random.PRNGKey(5), (b, R, R), 0, L + 1)
    # deliberately asymmetric adjacency so dir0 != dir1
    onehot = jax.nn.one_hot(labels - 1, L) * (labels > 0)[..., None]
    roi_mask = jnp.arange(R)[None, :] < jnp.asarray([13, 8, 5])[:, None]

    kw = dict(nongt_dim=n, num_heads=H, roi_mask=roi_mask,
              adj_labels_onehot=onehot, drop_rate=0.2, train=False, rngs=None)
    folded = gatt_net_apply(params, v, fold=True, **kw)
    dual = gatt_net_apply(params, v, fold=False, **kw)
    assert not np.allclose(
        np.asarray(onehot), np.asarray(jnp.swapaxes(onehot, 1, 2))
    ), "fixture must be asymmetric for the direction test to bite"
    np.testing.assert_allclose(np.asarray(folded), np.asarray(dual), atol=2e-5)


def test_fold_is_eval_only():
    """The fold gates on eval: a train-mode call with fold=True must take the
    per-direction path and be BIT-identical to fold=False (same RNG stream
    consumption, same per-direction dropout masks — no train-time deviation
    exists)."""
    from tf_vqa_regat_tpu import nn as _nn
    from tf_vqa_regat_tpu.models.relation import gatt_net_apply

    b, R, D, H, n = 2, 11, 48, 4, 5
    params = _gatt_params(jax.random.PRNGKey(6), dims=D, heads=H, pos_dim=16)
    v = jax.random.normal(jax.random.PRNGKey(7), (b, R, D))
    pos_mat = jax.random.normal(jax.random.PRNGKey(8), (b, R, n, 4)) * 0.3
    roi_mask = jnp.ones((b, R), bool)
    kw = dict(nongt_dim=n, num_heads=H, roi_mask=roi_mask, pos_mat=pos_mat,
              drop_rate=0.3, train=True)

    a = gatt_net_apply(params, v, fold=True,
                       rngs=_nn.RngGen(jax.random.PRNGKey(9)), **kw)
    assert np.isfinite(np.asarray(a)).all()
    b_ = gatt_net_apply(params, v, fold=False,
                        rngs=_nn.RngGen(jax.random.PRNGKey(9)), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
