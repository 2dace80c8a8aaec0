"""Golden full-model parity (SURVEY §4 item 5): a pure-numpy transcription of
the forward equations, assembled independently of the jnp code, must match
apply_regat end-to-end (eval mode, implicit + BUTD)."""

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


def np_forward(params, cfg, batch):
    q_ids = np.asarray(batch["question"])
    roi_mask = np.arange(R)[None, :] < np.asarray(batch["num_boxes"])[:, None]

    # language stack
    w1 = np_embedding(params["w_emb"]["emb"], q_ids, NTOKEN)
    w2 = np_embedding(params["w_emb"]["emb_"], q_ids, NTOKEN)
    w_emb = np.concatenate([w1, w2], -1)
    q_seq = np_gru(params["q_emb"]["gru"], w_emb)
    q_last = q_seq[:, -1]
    a = np.tanh(np_fc(params["q_att"]["linear1"], q_seq))
    logits = np_fc(params["q_att"]["linear2"], a)[..., 0]
    q_vec = np.einsum("bt,bth->bh", np_softmax(logits, -1), q_seq)

    # implicit relation encoder
    visual = np_fc(params["v_relation"]["v2out"], np.asarray(batch["features"], np.float64), "relu")
    pos_emb = np_position_embedding(np.asarray(batch["bb"], np.float64), CFG.nongt_dim, CFG.imp_pos_emb_dim)
    qb = np.where(roi_mask[..., None], np.broadcast_to(q_vec[:, None, :], (B, R, q_vec.shape[-1])), 0.0)
    v_cat_q = np.concatenate([visual, qb], -1)

    gatt = params["v_relation"]["gatt"]
    self_feat = np_fc(gatt["self_weights"], v_cat_q)
    D = self_feat.shape[-1]
    H = CFG.num_heads
    dh = D // H
    n = CFG.nongt_dim
    out = self_feat.copy()
    key_mask = roi_mask[:, :n]
    for d in range(CFG.dir_num):
        pn = gatt["neighbor"][d]
        q_ = np_fc(pn["query"], self_feat).reshape(B, R, H, dh)
        k_ = np_fc(pn["key"], self_feat[:, :n]).reshape(B, n, H, dh)
        aff = np.einsum("brhd,bnhd->brhn", q_, k_) / np.sqrt(dh)
        pw = np.maximum(np_fc(pn["pair_pos_fc"], pos_emb), 0.0)  # [B,R,n,H]
        aff = aff + np.log(np.maximum(pw, 1e-6)).transpose(0, 1, 3, 2)
        aff = np.where(key_mask[:, None, None, :], aff, -9e15)
        w = np_softmax(aff, -1)
        vproj = np.asarray(pn["out"]["v"], np.float64)
        vproj = float(pn["out"]["g"]) * vproj / np.linalg.norm(vproj.ravel())
        vw = np.einsum("bnD,hDo->bnho", self_feat[:, :n], vproj)
        neigh = np.einsum("brhn,bnho->brho", w, vw).reshape(B, R, D)
        out = out + neigh + np.asarray(pn["out"]["b"], np.float64)
    v_emb = np.maximum(out, 0.0)
    v_emb = visual + v_emb  # residual

    # BUTD fusion (masked softmax over rois)
    je = params["joint_emb"]
    v_att = np_fc(je["v2attention"], v_emb)
    q_att2 = np_fc(je["q2attention"], q_last)[:, None, :]
    lg = np_fc(je["linear"], v_att * q_att2)
    lg = np.where(roi_mask[..., None], lg, -1e9)
    wts = np_softmax(lg, 1)
    wv = (wts * v_emb).sum(1)
    joint = np_fc(je["visual_embed"], wv) * np_fc(je["question_embed"], q_last)

    # classifier
    c = params["classifier"]
    h1 = np.maximum(joint @ np_wn(c["fc1"]) + np.asarray(c["fc1"]["b"], np.float64), 0)
    return h1 @ np_wn(c["fc2"]) + np.asarray(c["fc2"]["b"], np.float64)


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
