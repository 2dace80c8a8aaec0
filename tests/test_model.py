"""Full-model forward tests: every relation type x fusion family, train and
eval mode, static shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.models.regat import apply_regat, init_regat, trainable_mask

NTOKEN = 50
V_DIM = 128
NUM_ANS = 17
R = 12
B = 3


def tiny_cfg(**kw):
    base = dict(
        num_hid=32,
        relation_dim=48,
        num_heads=4,
        nongt_dim=6,
        imp_pos_emb_dim=16,
        dir_num=2,
        num_steps=1,
        residual_connection=True,
        label_bias=False,
        dropout=0.2,
        fusion="butd",
        relation_type="implicit",
        mutan_rank=3,
        ban_glimpse=2,
        mutan_gamma=2,
    )
    base.update(kw)
    return Config(**base)


def make_batch(seed=0, semantic=False):
    rng = np.random.RandomState(seed)
    xy = rng.rand(B, R, 2).astype(np.float32) * 300
    wh = rng.rand(B, R, 2).astype(np.float32) * 100 + 5
    bb = np.concatenate([xy, xy + wh], axis=-1)
    num_boxes = np.array([R, R - 3, R - 5], np.int32)
    for i, nb in enumerate(num_boxes):
        bb[i, nb:] = 0.0
    feats = rng.randn(B, R, V_DIM).astype(np.float32)
    for i, nb in enumerate(num_boxes):
        feats[i, nb:] = 0.0
    norm_bb = rng.rand(B, R, 6).astype(np.float32)
    q = rng.randint(0, NTOKEN, (B, 14)).astype(np.int32)
    q[:, 10:] = NTOKEN  # padded tail
    target = rng.rand(B, NUM_ANS).astype(np.float32)
    batch = {
        "features": jnp.asarray(feats),
        "norm_bb": jnp.asarray(norm_bb),
        "question": jnp.asarray(q),
        "bb": jnp.asarray(bb),
        "target": jnp.asarray(target),
        "num_boxes": jnp.asarray(num_boxes),
        "valid": jnp.ones((B,), bool),
    }
    if semantic:
        batch["adj_label"] = jnp.asarray(
            rng.randint(0, 16, (B, R, R)).astype(np.int32)
        )
    return batch


@pytest.mark.parametrize("relation_type", ["implicit", "spatial", "semantic"])
def test_forward_relation_types(relation_type):
    cfg = tiny_cfg(relation_type=relation_type)
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch(semantic=(relation_type == "semantic"))
    logits = apply_regat(params, cfg, batch, NTOKEN, train=False)
    assert logits.shape == (B, NUM_ANS)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("fusion", ["butd", "ban", "mutan"])
def test_forward_fusions(fusion):
    cfg = tiny_cfg(fusion=fusion)
    params = init_regat(jax.random.PRNGKey(1), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch()
    logits = apply_regat(params, cfg, batch, NTOKEN, train=False)
    assert logits.shape == (B, NUM_ANS)
    assert np.isfinite(np.asarray(logits)).all()
    if fusion == "mutan":
        assert "classifier" not in params  # mutan scores answers directly


def test_train_mode_dropout_stochastic_but_deterministic_per_key():
    cfg = tiny_cfg()
    params = init_regat(jax.random.PRNGKey(2), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch()
    r1 = apply_regat(params, cfg, batch, NTOKEN, train=True, rng=jax.random.PRNGKey(5))
    r2 = apply_regat(params, cfg, batch, NTOKEN, train=True, rng=jax.random.PRNGKey(5))
    r3 = apply_regat(params, cfg, batch, NTOKEN, train=True, rng=jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert np.abs(np.asarray(r1) - np.asarray(r3)).max() > 1e-6


def test_model_padding_invariance():
    """Core TPU property: growing static roi padding leaves logits unchanged."""
    cfg = tiny_cfg()
    params = init_regat(jax.random.PRNGKey(3), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch()
    base = np.asarray(apply_regat(params, cfg, batch, NTOKEN))

    R_big = R + 6
    big = dict(batch)
    for name, width in [("features", V_DIM), ("norm_bb", 6), ("bb", 4)]:
        arr = np.zeros((B, R_big, width), np.float32)
        arr[:, :R] = np.asarray(batch[name])
        big[name] = jnp.asarray(arr)
    grown = np.asarray(apply_regat(params, cfg, big, NTOKEN))
    np.testing.assert_allclose(grown, base, rtol=2e-4, atol=1e-5)


def test_trainable_mask_freezes_second_embedding():
    cfg = tiny_cfg()
    params = init_regat(jax.random.PRNGKey(4), cfg, NTOKEN, V_DIM, NUM_ANS)
    mask = trainable_mask(params, emb2_trainable=False)
    assert mask["w_emb"]["emb_"]["table"] is False
    assert mask["w_emb"]["emb"]["table"] is True
    mask2 = trainable_mask(params, emb2_trainable=True)
    assert mask2["w_emb"]["emb_"]["table"] is True


def test_jit_forward_single_compilation():
    cfg = tiny_cfg()
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)

    @jax.jit
    def fwd(params, batch):
        return apply_regat(params, cfg, batch, NTOKEN, train=False)

    b1 = make_batch(seed=1)
    b2 = make_batch(seed=2)
    fwd(params, b1)
    fwd(params, b2)  # same shapes -> cache hit
    assert fwd._cache_size() == 1


def test_forward_num_steps_and_single_direction():
    """Graph propagation depth >1 and dir_num=1 paths (reference flags
    --num_steps / --dir_num, main.py:80-86)."""
    cfg = tiny_cfg(num_steps=2, dir_num=1)
    params = init_regat(jax.random.PRNGKey(6), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch(seed=6)
    logits = apply_regat(params, cfg, batch, NTOKEN, train=False)
    assert logits.shape == (B, NUM_ANS)
    assert np.isfinite(np.asarray(logits)).all()
    assert len(params["v_relation"]["gatt"]["neighbor"]) == 1


def test_forward_no_residual():
    cfg = tiny_cfg(residual_connection=False)
    params = init_regat(jax.random.PRNGKey(7), cfg, NTOKEN, V_DIM, NUM_ANS)
    logits = apply_regat(params, cfg, make_batch(seed=7), NTOKEN, train=False)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("relation_type", ["implicit", "spatial"])
def test_forward_pallas_matches_jnp(relation_type):
    """Full model with impl='pallas' (kernel v3 fused implicit path /
    kernel v2 explicit path; interpret mode on CPU) equals the jnp oracle."""
    cfg = tiny_cfg(relation_type=relation_type)
    params = init_regat(jax.random.PRNGKey(9), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch(seed=9)
    want = np.asarray(apply_regat(params, cfg, batch, NTOKEN, impl="jnp"))
    got = np.asarray(apply_regat(params, cfg, batch, NTOKEN, impl="pallas"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_forward_label_bias_enabled():
    cfg = tiny_cfg(relation_type="semantic", label_bias=True)
    params = init_regat(jax.random.PRNGKey(8), cfg, NTOKEN, V_DIM, NUM_ANS)
    assert "b" in params["v_relation"]["gatt"]["bias"]["layers"][0]
    batch = make_batch(seed=8, semantic=True)
    logits = apply_regat(params, cfg, batch, NTOKEN, train=False)
    assert np.isfinite(np.asarray(logits)).all()


def test_dropout_zero_is_dropout_free_for_every_fusion():
    """--dropout 0 must make the train-mode forward rng-invariant for EVERY
    fusion. MuTAN's hardcoded Tucker-block input dropout (the PyTorch block
    fusion's dropout_input=0.1) previously ignored drop_rate and kept
    training stochastic at --dropout 0 — breaking determinism harnesses
    built on it (round-3 review finding); it now gates on drop_rate > 0
    like the other hardcoded reference rates (gatt_net/implicit encoder)."""
    import jax

    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.data.loader import BatchLoader
    from tf_vqa_regat_tpu.models.regat import apply_regat, init_regat

    ds = synthetic_dataset(num_images=4, num_questions=16, v_dim=24, num_ans=9)
    ntoken = ds.dictionary.ntoken
    batch = {
        k: jnp.asarray(v)
        for k, v in next(iter(BatchLoader(ds, 16, 12, shuffle=False).epoch(0))).items()
    }
    for fusion in ("butd", "ban", "mutan"):
        cfg = Config(
            num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
            imp_pos_emb_dim=16, fusion=fusion, relation_type="implicit",
            residual_connection=True, ban_glimpse=2, mutan_rank=3,
            mutan_gamma=2, dropout=0.0,
        )
        params = init_regat(jax.random.PRNGKey(0), cfg, ntoken, 24, 9)
        a = apply_regat(params, cfg, batch, ntoken, train=True,
                        rng=jax.random.PRNGKey(1))
        b = apply_regat(params, cfg, batch, ntoken, train=True,
                        rng=jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=fusion)


def test_graph_and_butd_dropout_pinned_to_reference_default(monkeypatch):
    """Reference dropout topology (rel_graph_net.py:71-103): args.dropout
    reaches only the language stack and classifier; the relation encoder and
    BUTD keep hardcoded 0.2 (graph_att_net.py:14, fusion.py:13). --dropout
    0.5 must therefore NOT change the graph/fusion drop rate — and
    --dropout 0 must turn it off entirely (trajectory-harness convention)."""
    from tf_vqa_regat_tpu.models import fusion, relation
    from tf_vqa_regat_tpu.models.regat import apply_regat, init_regat

    seen = {}
    orig_rel = relation.implicit_encoder_apply
    orig_butd = fusion.butd_apply

    def rel_spy(params, *a, **kw):
        seen["rel"] = kw.get("drop_rate")
        return orig_rel(params, *a, **kw)

    def butd_spy(params, v_emb, q_last, roi_mask, drop, *a, **kw):
        seen["butd"] = drop
        return orig_butd(params, v_emb, q_last, roi_mask, drop, *a, **kw)

    monkeypatch.setattr(relation, "implicit_encoder_apply", rel_spy)
    monkeypatch.setattr(fusion, "butd_apply", butd_spy)

    for cfg_drop, want in [(0.5, 0.2), (0.2, 0.2), (0.0, 0.0)]:
        cfg = tiny_cfg(dropout=cfg_drop)
        params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
        apply_regat(
            params, cfg, make_batch(), NTOKEN, train=True,
            rng=jax.random.PRNGKey(1),
        )
        assert seen["rel"] == want, (cfg_drop, seen)
        assert seen["butd"] == want, (cfg_drop, seen)


def test_forward_pallas_matches_jnp_train_mode():
    """TRAIN-mode pallas == jnp: the fused kernel's pos-embedding dropout now
    draws nn.dropout's exact uint8 scheme at the same stream position, so the
    two impls produce IDENTICAL masks — the full stochastic forward must
    agree to float tolerance (previously bernoulli vs bits: different masks,
    different quantized drop probability — review finding)."""
    cfg = tiny_cfg(relation_type="implicit")
    params = init_regat(jax.random.PRNGKey(9), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch(seed=9)
    rng = jax.random.PRNGKey(3)
    want = np.asarray(apply_regat(params, cfg, batch, NTOKEN, train=True, rng=rng))
    got = np.asarray(
        apply_regat(params, cfg, batch, NTOKEN, train=True, rng=rng, impl="pallas")
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_mutan_shared_qdrop_identical_when_no_input_dropout_runs():
    """cfg.mutan_shared_qdrop only changes WHERE the q-side input-dropout
    mask is drawn (per example at [b,1,:] vs per roi after broadcast,
    models/mutan.py); whenever no input dropout runs the two paths must be
    bit-identical: eval mode, and train mode at --dropout 0 (the hardcoded
    block-lib dropout_input=0.1 gates on drop_rate > 0)."""
    base = tiny_cfg(fusion="mutan")
    shared = tiny_cfg(fusion="mutan", mutan_shared_qdrop=True)
    params = init_regat(jax.random.PRNGKey(7), base, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch(seed=7)
    a = apply_regat(params, base, batch, NTOKEN, train=False)
    b = apply_regat(params, shared, batch, NTOKEN, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    base0 = tiny_cfg(fusion="mutan", dropout=0.0)
    shared0 = tiny_cfg(fusion="mutan", dropout=0.0, mutan_shared_qdrop=True)
    rng = jax.random.PRNGKey(11)
    a0 = apply_regat(params, base0, batch, NTOKEN, train=True, rng=rng)
    b0 = apply_regat(params, shared0, batch, NTOKEN, train=True, rng=rng)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))

    # And the cfg wiring is live: with input dropout RUNNING the two paths
    # must differ (different mask shapes) — otherwise a silently dropped
    # `shared_qdrop=cfg.mutan_shared_qdrop` in models/regat.py would pass
    # every other test while bench measured the wrong path.
    at = apply_regat(params, base, batch, NTOKEN, train=True, rng=rng)
    bt = apply_regat(params, shared, batch, NTOKEN, train=True, rng=rng)
    # Not bit-identical: a dropped flag reproduces the default program
    # exactly (deterministic), while the real shared path perturbs the
    # attention block (tiny at these dims, hence no magnitude threshold).
    assert np.abs(np.asarray(at) - np.asarray(bt)).max() > 0


def test_mutan_shared_qdrop_mask_placement(monkeypatch):
    """Pin the mechanism: in the attention Tucker block the default path
    broadcasts the q-side activations to [b, R, mm] BEFORE dropout (per-roi
    masks, upstream `block`-lib semantics), while mutan_shared_qdrop draws
    the mask at [b, 1, mm] (one mask per example, q-side merge matmuls stay
    per-example — the measured MuTAN train speed option, PERF_NOTES)."""
    from tf_vqa_regat_tpu import nn
    from tf_vqa_regat_tpu.models import mutan

    Q_DIM = 32
    params = mutan.mutan_init(
        jax.random.PRNGKey(0), V_DIM, Q_DIM, NUM_ANS, rank=3, glimpse=2
    )
    rs = np.random.RandomState(0)
    visual = jnp.asarray(rs.randn(B, R, V_DIM).astype(np.float32))
    question = jnp.asarray(rs.randn(B, Q_DIM).astype(np.float32))
    roi_mask = jnp.ones((B, R), bool)

    real_dropout = nn.dropout

    def run(shared):
        shapes = []

        def spy(x, rate, train, rngs):
            if train and rate > 0.0:
                shapes.append(tuple(x.shape))
            return real_dropout(x, rate, train, rngs)

        monkeypatch.setattr(nn, "dropout", spy)
        logits, _ = mutan.mutan_apply(
            params, visual, question, roi_mask, drop_rate=0.2, train=True,
            rngs=nn.RngGen(jax.random.PRNGKey(5)), rank=3,
            shared_qdrop=shared,
        )
        monkeypatch.setattr(nn, "dropout", real_dropout)
        assert np.isfinite(np.asarray(logits)).all()
        return shapes

    mm = mutan.MM_DIM
    # att block (h0, h1) then out block (h0, h1; both 2-D, roi-free).
    assert run(shared=False) == [
        (B, R, mm), (B, R, mm), (B, mm), (B, mm)
    ]
    assert run(shared=True) == [
        (B, 1, mm), (B, R, mm), (B, mm), (B, mm)
    ]


def test_mutan_shared_qdrop_trains():
    """Full-model train step sanity for the speed option: finite loss and a
    nonzero gradient on every MuTAN fusion leaf (incl. the q-side merge,
    which under shared_qdrop runs per-example and broadcasts)."""
    from tf_vqa_regat_tpu.train.loss import bce_with_logits_sum

    cfg = tiny_cfg(fusion="mutan", mutan_shared_qdrop=True)
    params = init_regat(jax.random.PRNGKey(13), cfg, NTOKEN, V_DIM, NUM_ANS)
    batch = make_batch(seed=13)

    def loss_fn(p):
        logits = apply_regat(
            p, cfg, batch, NTOKEN, train=True, rng=jax.random.PRNGKey(3)
        )
        return bce_with_logits_sum(logits, batch["target"], batch["valid"])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    joint = grads["joint_emb"]
    flat, _ = jax.tree_util.tree_flatten(joint)
    for g in flat:
        assert np.isfinite(np.asarray(g)).all()
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_mutan_rank_sum_reassociation_matches_naive():
    """Direct oracle for the reassociated Tucker branch (models/mutan.py):
    z = h1 @ (sum_r W1_r * m0_r) + zb must equal the naive
    sum_r m0_r * (h1 @ W1_r + b1_r) to float tolerance — both forward and
    the gradients w.r.t. every block param (same math, renested sums)."""
    from tf_vqa_regat_tpu.models import mutan

    b_, R_, rank = 3, 12, 5
    d0, d1, out = 32, 40, 17
    p = mutan._mutan_block_init(jax.random.PRNGKey(0), d0, d1, out, rank)
    rs = np.random.RandomState(1)
    x0 = jnp.asarray(rs.randn(b_, 1, d0).astype(np.float32))
    x1 = jnp.asarray(rs.randn(b_, R_, d1).astype(np.float32))

    def naive(params):
        h0 = mutan._linear(params["linear0"], x0, jnp.float32)
        h1 = mutan._linear(params["linear1"], x1, jnp.float32)
        m0 = mutan._linear(params["merge0"], h0, jnp.float32)
        m1 = mutan._linear(params["merge1"], h1, jnp.float32)
        m = m0 * m1
        z = jnp.sum(m.reshape(*m.shape[:-1], rank, mutan.MM_DIM), axis=-2)
        return mutan._linear(params["linear_out"], z, jnp.float32)

    def reassoc(params):
        # eval, no dropout, x0 [b,1,:] -> the folded branch
        return mutan._mutan_block_apply(
            params, x0, x1, rank, 0.0, False, None, jnp.float32
        )

    want = naive(p)
    got = reassoc(p)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5
    )

    cot = jnp.asarray(rs.randn(*want.shape).astype(np.float32))
    g_want = jax.grad(lambda q: jnp.vdot(naive(q), cot))(p)
    g_got = jax.grad(lambda q: jnp.vdot(reassoc(q), cot))(p)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        ),
        g_want, g_got,
    )
