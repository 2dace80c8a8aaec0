"""Reference .h5 checkpoint import: save weights from the reference's own
model, import them, and verify the mapping (plus a full forward run)."""

import os
import sys

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.models.regat import apply_regat, init_regat
from tf_vqa_regat_tpu.train.h5_import import import_reference_h5

CFG = Config(
    num_hid=24, relation_dim=32, num_heads=4, nongt_dim=5, imp_pos_emb_dim=16,
    dir_num=2, num_steps=1, residual_connection=True, label_bias=False,
    dropout=0.2, fusion="butd", relation_type="implicit", op="c",
)
NTOKEN, V_DIM, NUM_ANS = 30, 40, 7


def _reference_model():
    from model.classifier import SimpleClassifier
    from model.fusion import BUTD
    from model.language_model import (
        QuestionEmbedding,
        QuestionSelfAttention,
        WordEmbedding,
    )
    from model.rel_graph_net import RelationGraphAttentionNetwork
    from model.relation_encoder import ImplicitRelationEncoder

    w_emb = WordEmbedding(NTOKEN, 300, CFG.dropout, CFG.op)
    q_emb = QuestionEmbedding(CFG.word_dim, CFG.num_hid, 1, False, CFG.dropout)
    q_att = QuestionSelfAttention(CFG.num_hid, CFG.dropout)
    v_relation = ImplicitRelationEncoder(
        V_DIM, CFG.num_hid, CFG.relation_dim, CFG.dir_num, CFG.imp_pos_emb_dim,
        CFG.nongt_dim, num_heads=CFG.num_heads, num_steps=CFG.num_steps,
        residual_connection=CFG.residual_connection, label_bias=CFG.label_bias,
    )
    classifier = SimpleClassifier(CFG.num_hid, CFG.num_hid * 2, NUM_ANS, CFG.dropout)
    joint = BUTD(CFG.relation_dim, CFG.num_hid, CFG.num_hid)
    model = RelationGraphAttentionNetwork(
        w_emb, q_emb, q_att, v_relation, joint, classifier, "butd", "implicit"
    )
    b, R = 2, 5
    model(
        tf.zeros((b, R, V_DIM)), tf.zeros((b, R, 6)),
        tf.zeros((b, 14), tf.int32),
        tf.zeros((b, R, CFG.nongt_dim, CFG.imp_pos_emb_dim)),
        None, None,
    )
    return model


def test_h5_roundtrip_and_forward(tmp_path):
    model = _reference_model()
    h5 = str(tmp_path / "ref.h5")
    model.save_weights(h5)

    params = import_reference_h5(h5, CFG, NTOKEN, V_DIM, NUM_ANS)

    # structure matches a fresh init exactly
    fresh = init_regat(jax.random.PRNGKey(0), CFG, NTOKEN, V_DIM, NUM_ANS)
    assert jax.tree.structure(params) == jax.tree.structure(fresh)
    jax.tree.map(lambda a, b: _same_shape(a, b), params, fresh)

    # spot-check exact weight values against the reference variables
    np.testing.assert_array_equal(
        np.asarray(params["w_emb"]["emb"]["table"]),
        model.w_emb.emb.embeddings.numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(params["q_emb"]["gru"]["kernel"]),
        model.q_emb.gru.weights[0].numpy(),
    )
    np.testing.assert_array_equal(
        np.asarray(params["classifier"]["fc2"]["v"]),
        [l for l in model.classifier.layers if hasattr(l, "v")][1].v.numpy(),
    )

    # the imported params drive a finite full forward
    rng = np.random.RandomState(0)
    b, R = 2, 8
    xy = rng.rand(b, R, 2).astype(np.float32) * 100
    wh = rng.rand(b, R, 2).astype(np.float32) * 50 + 4
    batch = {
        "features": jnp.asarray(rng.randn(b, R, V_DIM).astype(np.float32)),
        "norm_bb": jnp.zeros((b, R, 6)),
        "question": jnp.asarray(rng.randint(0, NTOKEN, (b, 14)).astype(np.int32)),
        "bb": jnp.asarray(np.concatenate([xy, xy + wh], -1)),
        "target": jnp.zeros((b, NUM_ANS)),
        "num_boxes": jnp.asarray(np.array([R, R - 2], np.int32)),
        "valid": jnp.ones((b,), bool),
    }
    logits = apply_regat(params, CFG, batch, NTOKEN, train=False)
    assert logits.shape == (b, NUM_ANS)
    assert np.isfinite(np.asarray(logits)).all()


def _same_shape(a, b):
    assert np.shape(a) == np.shape(b), (np.shape(a), np.shape(b))


def test_h5_export_roundtrip(tmp_path):
    """Two-way migration: our params -> reference .h5 -> back, bit-exact.
    The exported file must load in the reference's own model (that IS the
    export path), and re-importing must reproduce every leaf exactly."""
    from tf_vqa_regat_tpu.train.h5_export import export_reference_h5

    params = init_regat(jax.random.PRNGKey(3), CFG, NTOKEN, V_DIM, NUM_ANS)
    h5 = str(tmp_path / "exported.h5")
    export_reference_h5(params, h5, CFG, NTOKEN, V_DIM, NUM_ANS)

    back = import_reference_h5(h5, CFG, NTOKEN, V_DIM, NUM_ANS)
    assert jax.tree.structure(back) == jax.tree.structure(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        back, params,
    )

    # and the reference's own load_weights accepts it (fresh model, by name)
    model = _reference_model()
    model.load_weights(h5)
    np.testing.assert_array_equal(
        model.w_emb.emb.embeddings.numpy(),
        np.asarray(params["w_emb"]["emb"]["table"]),
    )


def test_h5_import_rejects_unsupported_combo(tmp_path):
    with pytest.raises(ValueError):
        import_reference_h5(
            "x.h5", CFG.replace(fusion="ban"), NTOKEN, V_DIM, NUM_ANS
        )


def test_h5_export_rejects_checkpoint_config_mismatch(tmp_path):
    """Export validates checkpoint-vs-flags with a real raise (-O-proof)
    where keras cannot: a dir_num mismatch zips over attention directions,
    which would otherwise silently truncate and export one direction at its
    random init (every per-direction tensor has dir_num-independent shapes,
    so no assign would complain). A num_heads mismatch, by contrast, is
    caught loudly by keras' own assign shape check (pair_pos_fc is [P, H])
    before the grouped-conv guard fires — that guard stays as
    defense-in-depth for malformed pytrees."""
    from tf_vqa_regat_tpu.train.h5_export import export_reference_h5

    params = init_regat(jax.random.PRNGKey(4), CFG, NTOKEN, V_DIM, NUM_ANS)
    with pytest.raises(ValueError, match="direction"):
        export_reference_h5(
            params, str(tmp_path / "d.h5"), CFG.replace(dir_num=1),
            NTOKEN, V_DIM, NUM_ANS,
        )
