"""Golden full-model parity (SURVEY §4 item 5): a pure-numpy transcription of
the forward equations, assembled independently of the jnp code, must match
apply_regat end-to-end (eval mode) — all three relation families (implicit,
spatial, semantic) and all three fusions (BUTD, BAN, MuTAN). For the two
explicit families the reference itself cannot run (relation_encoder.py:98-104 NameError), these oracles are
the acceptance record for the full composition; likewise for BAN/MuTAN,
which the reference flags but never implements (main.py:51-52)."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.models.regat import apply_regat, init_regat

NTOKEN, V_DIM, NUM_ANS = 40, 48, 9
B, R = 2, 10

CFG = Config(
    num_hid=24,
    relation_dim=32,
    num_heads=4,
    nongt_dim=5,
    imp_pos_emb_dim=16,
    dir_num=2,
    num_steps=1,
    residual_connection=True,
    label_bias=False,
    dropout=0.2,  # eval mode: inert
    fusion="butd",
    relation_type="implicit",
    op="c",
)


# ---------------------------------------------------------------- numpy layers
def np_softmax(x, axis):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def np_wn(layer):
    v = np.asarray(layer["v"], np.float64)
    return float(layer["g"]) * v / np.linalg.norm(v.ravel())


def np_fc(p, x, act=None):
    for layer in p["layers"]:
        x = x @ np_wn(layer)
        if "b" in layer:
            x = x + np.asarray(layer["b"], np.float64)
        if act == "relu":
            x = np.maximum(x, 0)
        elif act == "tanh":
            x = np.tanh(x)
    return x


def np_embedding(p, ids, padding_idx):
    emb = np.asarray(p["table"], np.float64)[ids]
    emb[ids == padding_idx] = 0.0
    return emb


def np_gru(p, x):
    kernel = np.asarray(p["kernel"], np.float64)
    rk = np.asarray(p["recurrent_kernel"], np.float64)
    b_in, b_rec = np.asarray(p["bias"], np.float64)
    h = np.zeros((x.shape[0], rk.shape[0]))
    outs = []
    sig = lambda z: 1 / (1 + np.exp(-z))
    for t in range(x.shape[1]):
        mx = x[:, t] @ kernel + b_in
        mh = h @ rk + b_rec
        xz, xr, xh = np.split(mx, 3, -1)
        rz, rr, rh = np.split(mh, 3, -1)
        z, r = sig(xz + rz), sig(xr + rr)
        h = z * h + (1 - z) * np.tanh(xh + r * rh)
        outs.append(h)
    return np.stack(outs, 1)


def np_position_embedding(bb, n, dim):
    x1, y1, x2, y2 = bb[..., 0], bb[..., 1], bb[..., 2], bb[..., 3]
    w, h = x2 - x1 + 1, y2 - y1 + 1
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    dx = np.log(np.maximum(np.abs(cx[:, :, None] - cx[:, None, :n]) / w[:, :, None], 1e-3))
    dy = np.log(np.maximum(np.abs(cy[:, :, None] - cy[:, None, :n]) / h[:, :, None], 1e-3))
    dw = np.log(w[:, :, None] / w[:, None, :n])
    dh = np.log(h[:, :, None] / h[:, None, :n])
    pm = np.stack([dx, dy, dw, dh], -1)
    rng = np.arange(dim / 8.0)
    div = (100.0 * pm)[..., None] / np.power(1000.0, (8.0 / dim) * rng)
    emb = np.concatenate([np.sin(div), np.cos(div)], -1)
    return emb.reshape(*pm.shape[:3], dim)


def np_language(params, q_ids):
    """Language stack: dual embedding, GRU, corrected q-attention pooling."""
    w1 = np_embedding(params["w_emb"]["emb"], q_ids, NTOKEN)
    w2 = np_embedding(params["w_emb"]["emb_"], q_ids, NTOKEN)
    w_emb = np.concatenate([w1, w2], -1)
    q_seq = np_gru(params["q_emb"]["gru"], w_emb)
    q_last = q_seq[:, -1]
    a = np.tanh(np_fc(params["q_att"]["linear1"], q_seq))
    logits = np_fc(params["q_att"]["linear2"], a)[..., 0]
    q_vec = np.einsum("bt,bth->bh", np_softmax(logits, -1), q_seq)
    return q_seq, q_last, q_vec


def np_classifier(c, joint):
    h1 = np.maximum(joint @ np_wn(c["fc1"]) + np.asarray(c["fc1"]["b"], np.float64), 0)
    return h1 @ np_wn(c["fc2"]) + np.asarray(c["fc2"]["b"], np.float64)


def np_butd_classifier(params, v_emb, q_last, roi_mask):
    """BUTD fusion (masked roi softmax) + two-layer classifier."""
    je = params["joint_emb"]
    v_att = np_fc(je["v2attention"], v_emb)
    q_att2 = np_fc(je["q2attention"], q_last)[:, None, :]
    lg = np_fc(je["linear"], v_att * q_att2)
    lg = np.where(roi_mask[..., None], lg, -1e9)
    wts = np_softmax(lg, 1)
    wv = (wts * v_emb).sum(1)
    joint = np_fc(je["visual_embed"], wv) * np_fc(je["question_embed"], q_last)
    return np_classifier(params["classifier"], joint)


def np_forward(params, cfg, batch):
    q_ids = np.asarray(batch["question"])
    roi_mask = np.arange(R)[None, :] < np.asarray(batch["num_boxes"])[:, None]
    _, q_last, q_vec = np_language(params, q_ids)
    # implicit relation encoder (v2out relu, geometry log-bias attention,
    # dual direction, residual) — _np_implicit_vemb below
    v_emb = _np_implicit_vemb(params, cfg, batch, q_vec, roi_mask)
    return np_butd_classifier(params, v_emb, q_last, roi_mask)


def test_full_model_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    params = init_regat(jax.random.PRNGKey(3), CFG, NTOKEN, V_DIM, NUM_ANS)
    xy = rng.rand(B, R, 2).astype(np.float32) * 200
    wh = rng.rand(B, R, 2).astype(np.float32) * 80 + 4
    num_boxes = np.array([R, R - 4], np.int32)
    bb = np.concatenate([xy, xy + wh], -1)
    feats = rng.randn(B, R, V_DIM).astype(np.float32)
    for i, nb in enumerate(num_boxes):
        bb[i, nb:] = 0
        feats[i, nb:] = 0
    q = rng.randint(0, NTOKEN, (B, 14)).astype(np.int32)
    q[:, 9:] = NTOKEN
    batch = {
        "features": jnp.asarray(feats),
        "norm_bb": jnp.zeros((B, R, 6)),
        "question": jnp.asarray(q),
        "bb": jnp.asarray(bb),
        "target": jnp.zeros((B, NUM_ANS)),
        "num_boxes": jnp.asarray(num_boxes),
        "valid": jnp.ones((B,), bool),
    }
    got = np.asarray(apply_regat(params, CFG, batch, NTOKEN, train=False))
    want = np_forward(params, CFG, batch)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


# ------------------------------------------------------------- spatial golden
CFG_SPATIAL = Config(
    num_hid=24,
    relation_dim=32,
    num_heads=4,
    nongt_dim=5,
    imp_pos_emb_dim=16,
    dir_num=2,
    num_steps=2,  # exercise the propagation loop
    residual_connection=True,
    label_bias=True,  # exercise the per-edge-label bias FC
    dropout=0.2,  # eval mode: inert
    fusion="butd",
    relation_type="spatial",
    op="c",
)


def np_onehot_labels(adj, label_num):
    """[b,R,R] int labels -> [b,R,R,L] one-hot; 1..L map to slices 0..L-1,
    label 0 (no edge) and the self-loop 12 produce all-zero rows
    (ops/spatial_graph.py::broadcast_adj_labels contract)."""
    classes = np.arange(1, label_num + 1)
    return (adj[..., None] == classes).astype(np.float64)


def np_gatt_explicit(gatt, v_cat_q, adj_onehot, roi_mask, n, H):
    """GraphAttentionNetwork, explicit path: per-direction edge masking
    (-9e15 closed edges), label bias FC, key masking, dual direction via the
    transposed adjacency (reference graph_att_net.py:53-83 semantics with the
    validity mask addition)."""
    NEG = -9e15
    self_feat = np_fc(gatt["self_weights"], v_cat_q)
    Bq, Rq, D = self_feat.shape
    dh = D // H
    key_mask = roi_mask[:, :n]
    out = self_feat.copy()
    for d in range(len(gatt["neighbor"])):
        adj_d = adj_onehot if d == 0 else adj_onehot.transpose(0, 2, 1, 3)
        input_adj = adj_d[:, :, :n, :]  # [b, R, n, L]
        adj_mask = input_adj.sum(-1)  # [b, R, n]
        lb = np_fc(gatt["bias"], input_adj)[..., 0]  # [b, R, n]
        pn = gatt["neighbor"][d]
        q_ = np_fc(pn["query"], self_feat).reshape(Bq, Rq, H, dh)
        k_ = np_fc(pn["key"], self_feat[:, :n]).reshape(Bq, n, H, dh)
        aff = np.einsum("brhd,bnhd->brhn", q_, k_) / np.sqrt(dh)
        bias = np.broadcast_to(lb[:, :, None, :], aff.shape).copy()
        bias = np.where((adj_mask > 0)[:, :, None, :], bias, NEG)
        bias = bias + np.where(key_mask[:, None, None, :], 0.0, NEG)
        w = np_softmax(aff + bias, -1)
        vproj = np.asarray(pn["out"]["v"], np.float64)
        vproj = float(pn["out"]["g"]) * vproj / np.linalg.norm(vproj.ravel())
        vw = np.einsum("bnD,hDo->bnho", self_feat[:, :n], vproj)
        neigh = np.einsum("brhn,bnho->brho", w, vw).reshape(Bq, Rq, D)
        out = out + neigh + np.asarray(pn["out"]["b"], np.float64)
    return np.maximum(out, 0.0)


def np_forward_spatial(params, cfg, batch):
    from test_graph_attention import _np_build_graph  # the loop transcription

    q_ids = np.asarray(batch["question"])
    roi_mask = np.arange(R)[None, :] < np.asarray(batch["num_boxes"])[:, None]
    _, q_last, q_vec = np_language(params, q_ids)

    bb = np.asarray(batch["bb"], np.float64)
    norm_bb = np.asarray(batch["norm_bb"], np.float64)
    adj = np.stack([_np_build_graph(bb[i], norm_bb[i]) for i in range(B)])
    adj_onehot = np_onehot_labels(adj, cfg.spa_label_num)

    # explicit relation encoder: v2out (relu), then num_steps propagation
    visual = np_fc(params["v_relation"]["v2out"], np.asarray(batch["features"], np.float64), "relu")
    n = cfg.nongt_dim
    for _ in range(cfg.num_steps):
        qb = np.where(
            roi_mask[..., None],
            np.broadcast_to(q_vec[:, None, :], (B, R, q_vec.shape[-1])),
            0.0,
        )
        v_cat_q = np.concatenate([visual, qb], -1)
        rel = np_gatt_explicit(
            params["v_relation"]["gatt"], v_cat_q, adj_onehot, roi_mask, n,
            cfg.num_heads,
        )
        visual = visual + rel  # residual_connection

    return np_butd_classifier(params, visual, q_last, roi_mask)


def test_full_model_spatial_matches_numpy_oracle():
    """Spatial (explicit) full network vs the numpy oracle: in-jit spatial
    graph build -> one-hot -> dual-direction masked attention with label bias
    -> 2-step propagation -> BUTD -> classifier. The reference cannot run
    this family at all (relation_encoder.py:98-104 NameError), so the oracle
    is the acceptance record for the composition."""
    rng = np.random.RandomState(2)
    params = init_regat(jax.random.PRNGKey(5), CFG_SPATIAL, NTOKEN, V_DIM, NUM_ANS)
    W, H_img = 640.0, 480.0
    xy = rng.rand(B, R, 2).astype(np.float32) * [W * 0.6, H_img * 0.6]
    wh = rng.rand(B, R, 2).astype(np.float32) * [W * 0.35, H_img * 0.35] + 5
    num_boxes = np.array([R, R - 3], np.int32)
    bb = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    feats = rng.randn(B, R, V_DIM).astype(np.float32)
    norm_bb = np.zeros((B, R, 6), np.float32)
    norm_bb[..., -2] = (bb[..., 2] - bb[..., 0] + 1) / W
    norm_bb[..., -1] = (bb[..., 3] - bb[..., 1] + 1) / H_img
    for i, nb in enumerate(num_boxes):
        bb[i, nb:] = 0
        feats[i, nb:] = 0
        norm_bb[i, nb:] = 0
    q = rng.randint(0, NTOKEN, (B, 14)).astype(np.int32)
    q[:, 10:] = NTOKEN
    batch = {
        "features": jnp.asarray(feats),
        "norm_bb": jnp.asarray(norm_bb),
        "question": jnp.asarray(q),
        "bb": jnp.asarray(bb),
        "target": jnp.zeros((B, NUM_ANS)),
        "num_boxes": jnp.asarray(num_boxes),
        "valid": jnp.ones((B,), bool),
    }
    got = np.asarray(apply_regat(params, CFG_SPATIAL, batch, NTOKEN, train=False))
    want = np_forward_spatial(params, CFG_SPATIAL, batch)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_full_model_semantic_matches_numpy_oracle():
    """Semantic (explicit) full network vs the numpy oracle: batch-carried
    adjacency labels (sem_label_num=15), dual direction, label bias. Shares
    np_gatt_explicit with the spatial golden; only the adjacency source and
    label space differ (models/regat.py:194-202)."""
    cfg = CFG_SPATIAL.replace(relation_type="semantic", num_steps=1)
    rng = np.random.RandomState(4)
    params = init_regat(jax.random.PRNGKey(6), cfg, NTOKEN, V_DIM, NUM_ANS)
    num_boxes = np.array([R, R - 2], np.int32)
    feats = rng.randn(B, R, V_DIM).astype(np.float32)
    # labels 0..16: 0 = no edge; 16 > sem_label_num lands in the zero row
    adj = rng.randint(0, 17, size=(B, R, R)).astype(np.int32)
    for i, nb in enumerate(num_boxes):
        feats[i, nb:] = 0
        adj[i, nb:, :] = 0
        adj[i, :, nb:] = 0
    q = rng.randint(0, NTOKEN, (B, 14)).astype(np.int32)
    q[:, 8:] = NTOKEN
    batch = {
        "features": jnp.asarray(feats),
        "norm_bb": jnp.zeros((B, R, 6)),
        "question": jnp.asarray(q),
        "bb": jnp.zeros((B, R, 4)),
        "target": jnp.zeros((B, NUM_ANS)),
        "num_boxes": jnp.asarray(num_boxes),
        "valid": jnp.ones((B,), bool),
        "adj_label": jnp.asarray(adj),
    }
    got = np.asarray(apply_regat(params, cfg, batch, NTOKEN, train=False))

    roi_mask = np.arange(R)[None, :] < num_boxes[:, None]
    _, q_last, q_vec = np_language(params, np.asarray(q))
    adj_onehot = np_onehot_labels(adj, cfg.sem_label_num)
    visual = np_fc(params["v_relation"]["v2out"], feats.astype(np.float64), "relu")
    qb = np.where(
        roi_mask[..., None],
        np.broadcast_to(q_vec[:, None, :], (B, R, q_vec.shape[-1])),
        0.0,
    )
    rel = np_gatt_explicit(
        params["v_relation"]["gatt"], np.concatenate([visual, qb], -1),
        adj_onehot, roi_mask, cfg.nongt_dim, cfg.num_heads,
    )
    want = np_butd_classifier(params, visual + rel, q_last, roi_mask)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


# ---------------------------------------------------------- BAN/MuTAN goldens
def np_ban(je, v_emb, q_seq, roi_mask):
    """BAN fusion (models/ban.py; net-new family, no reference code): rank-3
    bilinear attention over (roi x token) pairs, per-glimpse BCNet pooling
    with residual question updates, summed over tokens."""
    glimpse = len(je["q_prj"])
    v_ = np_fc(je["att_v_net"], v_emb, "relu")
    q_ = np_fc(je["att_q_net"], q_seq, "relu")
    h_mat = np_wn(je["h_mat"])  # [g, h*K]
    logits = (
        np.einsum("gk,bvk,bqk->bgvq", h_mat, v_, q_)
        + np.asarray(je["h_bias"], np.float64)[None, :, None, None]
    )
    logits = np.where(roi_mask[:, None, :, None], logits, -1e9)
    b, g, Rr, T = logits.shape
    att = np_softmax(logits.reshape(b, g, Rr * T), -1).reshape(b, g, Rr, T)
    q_seq = q_seq.copy()
    for gi in range(glimpse):
        v1 = np_fc(je["b_v_net"][gi], v_emb, "relu")
        q1 = np_fc(je["b_q_net"][gi], q_seq, "relu")
        b_emb = np.einsum("bvk,bvq,bqk->bk", v1, att[:, gi], q1)
        q_seq = q_seq + np_fc(je["q_prj"][gi], b_emb)[:, None, :]
    return q_seq.sum(1)


def np_linear(p, x):
    return x @ np.asarray(p["w"], np.float64) + np.asarray(p["b"], np.float64)


def np_mutan_block(p, x0, x1, rank, mm_dim):
    h0, h1 = np_linear(p["linear0"], x0), np_linear(p["linear1"], x1)
    m = np_linear(p["merge0"], h0) * np_linear(p["merge1"], h1)
    z = m.reshape(*m.shape[:-1], rank, mm_dim).sum(-2)
    return np_linear(p["linear_out"], z)


def np_mutan(je, v_emb, q_last, roi_mask, rank):
    """MuTAN fusion (models/mutan.py): Tucker attention block over rois (the
    question side broadcasting over the roi axis), glimpse-weighted visual
    sums, and a second Tucker block scoring answers directly."""
    from tf_vqa_regat_tpu.models.mutan import MM_DIM

    alpha = np_mutan_block(je["att_fusion"], q_last[:, None, :], v_emb, rank, MM_DIM)
    alpha = np_fc(je["att_linear1"], np_fc(je["att_linear0"], alpha))
    alpha = np.where(roi_mask[..., None], alpha, -1e9)
    alpha = np_softmax(alpha, 1)  # [b, R, glimpse]
    v_out = np.einsum("brg,brd->bgd", alpha, v_emb).reshape(v_emb.shape[0], -1)
    return np_mutan_block(je["out_fusion"], q_last, v_out, rank, MM_DIM)


def _implicit_batch_and_vemb(cfg, params, seed):
    """Shared fixture: random batch + the numpy implicit relation encoding
    (reuses np_forward's transcription by slicing it off before the fusion)."""
    rng = np.random.RandomState(seed)
    xy = rng.rand(B, R, 2).astype(np.float32) * 200
    wh = rng.rand(B, R, 2).astype(np.float32) * 80 + 4
    num_boxes = np.array([R, R - 4], np.int32)
    bb = np.concatenate([xy, xy + wh], -1)
    feats = rng.randn(B, R, V_DIM).astype(np.float32)
    for i, nb in enumerate(num_boxes):
        bb[i, nb:] = 0
        feats[i, nb:] = 0
    q = rng.randint(0, NTOKEN, (B, 14)).astype(np.int32)
    q[:, 9:] = NTOKEN
    batch = {
        "features": jnp.asarray(feats),
        "norm_bb": jnp.zeros((B, R, 6)),
        "question": jnp.asarray(q),
        "bb": jnp.asarray(bb),
        "target": jnp.zeros((B, NUM_ANS)),
        "num_boxes": jnp.asarray(num_boxes),
        "valid": jnp.ones((B,), bool),
    }
    return batch


def _np_implicit_vemb(params, cfg, batch, q_vec, roi_mask):
    visual = np_fc(params["v_relation"]["v2out"], np.asarray(batch["features"], np.float64), "relu")
    pos_emb = np_position_embedding(np.asarray(batch["bb"], np.float64), cfg.nongt_dim, cfg.imp_pos_emb_dim)
    qb = np.where(roi_mask[..., None], np.broadcast_to(q_vec[:, None, :], (B, R, q_vec.shape[-1])), 0.0)
    v_cat_q = np.concatenate([visual, qb], -1)
    gatt = params["v_relation"]["gatt"]
    self_feat = np_fc(gatt["self_weights"], v_cat_q)
    D, H, n = self_feat.shape[-1], cfg.num_heads, cfg.nongt_dim
    dh = D // H
    out = self_feat.copy()
    key_mask = roi_mask[:, :n]
    for d in range(cfg.dir_num):
        pn = gatt["neighbor"][d]
        q_ = np_fc(pn["query"], self_feat).reshape(B, R, H, dh)
        k_ = np_fc(pn["key"], self_feat[:, :n]).reshape(B, n, H, dh)
        aff = np.einsum("brhd,bnhd->brhn", q_, k_) / np.sqrt(dh)
        pw = np.maximum(np_fc(pn["pair_pos_fc"], pos_emb), 0.0)
        aff = aff + np.log(np.maximum(pw, 1e-6)).transpose(0, 1, 3, 2)
        aff = np.where(key_mask[:, None, None, :], aff, -9e15)
        w = np_softmax(aff, -1)
        vproj = np.asarray(pn["out"]["v"], np.float64)
        vproj = float(pn["out"]["g"]) * vproj / np.linalg.norm(vproj.ravel())
        vw = np.einsum("bnD,hDo->bnho", self_feat[:, :n], vproj)
        neigh = np.einsum("brhn,bnho->brho", w, vw).reshape(B, R, D)
        out = out + neigh + np.asarray(pn["out"]["b"], np.float64)
    return visual + np.maximum(out, 0.0)


def test_full_model_ban_matches_numpy_oracle():
    cfg = CFG.replace(fusion="ban", ban_glimpse=2)
    params = init_regat(jax.random.PRNGKey(7), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = _implicit_batch_and_vemb(cfg, params, seed=8)
    got = np.asarray(apply_regat(params, cfg, batch, NTOKEN, train=False))
    roi_mask = np.arange(R)[None, :] < np.asarray(batch["num_boxes"])[:, None]
    q_seq, _, q_vec = np_language(params, np.asarray(batch["question"]))
    v_emb = _np_implicit_vemb(params, cfg, batch, q_vec, roi_mask)
    joint = np_ban(params["joint_emb"], v_emb, q_seq, roi_mask)
    want = np_classifier(params["classifier"], joint)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_full_model_mutan_matches_numpy_oracle():
    cfg = CFG.replace(fusion="mutan", mutan_rank=3, mutan_gamma=2)
    params = init_regat(jax.random.PRNGKey(9), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = _implicit_batch_and_vemb(cfg, params, seed=10)
    got = np.asarray(apply_regat(params, cfg, batch, NTOKEN, train=False))
    roi_mask = np.arange(R)[None, :] < np.asarray(batch["num_boxes"])[:, None]
    _, q_last, q_vec = np_language(params, np.asarray(batch["question"]))
    v_emb = _np_implicit_vemb(params, cfg, batch, q_vec, roi_mask)
    want = np_mutan(params["joint_emb"], v_emb, q_last, roi_mask, cfg.mutan_rank)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)
