"""Import reference-trained keras .h5 checkpoints into this framework.

The reference saves weights-only H5 via keras
(`model.save_weights('{output}{relation_type}-{fusion}-pretrained_model.h5')`,
reference main.py:145). A user switching frameworks can point
``--mode eval --checkpoint model.h5`` here: the file is loaded back into the
reference's own model classes (imported from the read-only reference checkout
under legacy keras, which keeps keras' name-based weight restoration exact)
and the variables are then mapped into this framework's param pytree with the
same correspondences the cross-framework parity tests verify
(tests/test_reference_parity.py).

Supported: implicit relations + BUTD fusion (the only combination the
reference can actually train — its explicit encoders and BAN/MuTAN paths are
broken/absent, SURVEY §2.2 M10/M12).

Caveat: predictions will differ slightly from the reference's because this
framework fixes the reference's question-self-attention softmax axis
(models/language.py); the imported weights are otherwise exact.

Requires tensorflow + tf_keras at call time (present in dev images; the
import path is gated so normal training never touches TF).
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

REFERENCE_PATH = os.environ.get("REGAT_REFERENCE_PATH", "/root/reference")


def _require_reference_tf():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    if os.environ.get("TF_USE_LEGACY_KERAS") != "1":
        raise RuntimeError("h5 import needs TF_USE_LEGACY_KERAS=1 before TF loads")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import tensorflow as tf  # noqa: F401

    return tf


def _wn_params(wn_layer) -> Dict[str, Any]:
    p = {"v": jnp.asarray(wn_layer.v.numpy()), "g": jnp.asarray(wn_layer.g.numpy())}
    if wn_layer.layer.bias is not None:
        p["b"] = jnp.asarray(wn_layer.layer.bias.numpy())
    return p


def _fc_params(fc) -> Dict[str, Any]:
    from model.weight_norm import WeightNorm

    return {"layers": [_wn_params(l) for l in fc.layers if isinstance(l, WeightNorm)]}


def _conv_params(conv, num_heads: int) -> Dict[str, Any]:
    kernel = conv.v.numpy()[0, 0]  # [in_per_group, filters]
    o = kernel.shape[1] // num_heads
    v = np.stack([kernel[:, h * o : (h + 1) * o] for h in range(num_heads)], 0)
    return {
        "v": jnp.asarray(v),
        "g": jnp.asarray(conv.g.numpy()),
        "b": jnp.asarray(conv.layer.bias.numpy()),
    }


def build_reference_model(cfg, ntoken: int, v_dim: int, num_ans: int):
    """Construct the reference's OWN keras model (implicit+BUTD) with
    variables created, mirroring its builder (rel_graph_net.py:68-106).
    Shared by the .h5 importer and the trajectory-equivalence harness."""
    if cfg.relation_type != "implicit" or cfg.fusion != "butd":
        raise ValueError(
            "reference model construction supports implicit+butd (the only "
            f"combination the reference trains); got "
            f"{cfg.relation_type}+{cfg.fusion}"
        )
    tf = _require_reference_tf()
    from model.classifier import SimpleClassifier
    from model.fusion import BUTD
    from model.language_model import (
        QuestionEmbedding,
        QuestionSelfAttention,
        WordEmbedding,
    )
    from model.rel_graph_net import RelationGraphAttentionNetwork
    from model.relation_encoder import ImplicitRelationEncoder

    w_emb = WordEmbedding(ntoken, 300, cfg.dropout, cfg.op)
    q_emb = QuestionEmbedding(cfg.word_dim, cfg.num_hid, 1, False, cfg.dropout)
    q_att = QuestionSelfAttention(cfg.num_hid, cfg.dropout)
    v_relation = ImplicitRelationEncoder(
        v_dim, cfg.num_hid, cfg.relation_dim, cfg.dir_num, cfg.imp_pos_emb_dim,
        cfg.nongt_dim, num_heads=cfg.num_heads, num_steps=cfg.num_steps,
        residual_connection=cfg.residual_connection, label_bias=cfg.label_bias,
    )
    classifier = SimpleClassifier(cfg.num_hid, cfg.num_hid * 2, num_ans, cfg.dropout)
    joint = BUTD(cfg.relation_dim, cfg.num_hid, cfg.num_hid)
    model = RelationGraphAttentionNetwork(
        w_emb, q_emb, q_att, v_relation, joint, classifier, cfg.fusion,
        cfg.relation_type,
    )
    # Warm-up forward to create variables (the reference does the same before
    # load_weights, rel_graph_net.py:112-123).
    b, R = 2, max(cfg.nongt_dim, 4)
    model(
        tf.zeros((b, R, v_dim)), tf.zeros((b, R, 6)),
        tf.zeros((b, 14), tf.int32),
        tf.zeros((b, R, cfg.nongt_dim, cfg.imp_pos_emb_dim))[:, : cfg.nongt_dim],
        None, None,
    )
    return model


def reference_model_to_params(model, cfg) -> Dict[str, Any]:
    """Map a built reference keras model's variables into this framework's
    param pytree (correspondences proven in tests/test_reference_parity.py)."""
    from model.weight_norm import WeightNorm

    w_emb, q_emb, q_att = model.w_emb, model.q_emb, model.q_att
    v_relation, joint, classifier = (
        model.v_relation, model.joint_emb, model.classifier,
    )
    params: Dict[str, Any] = {}
    we = {"emb": {"table": jnp.asarray(w_emb.emb.embeddings.numpy())}}
    if "c" in cfg.op:
        we["emb_"] = {"table": jnp.asarray(w_emb.emb_.embeddings.numpy())}
    params["w_emb"] = we

    kernel, recurrent, bias = (w.numpy() for w in q_emb.gru.weights)
    params["q_emb"] = {
        "gru": {
            "kernel": jnp.asarray(kernel),
            "recurrent_kernel": jnp.asarray(recurrent),
            "bias": jnp.asarray(bias),
        }
    }
    params["q_att"] = {
        "linear1": _fc_params(q_att.linear1),
        "linear2": _fc_params(q_att.linear2),
    }
    gatt = v_relation.implicit_relation
    params["v_relation"] = {
        "v2out": _fc_params(v_relation.v2out),
        "gatt": {
            "self_weights": _fc_params(gatt.self_weights),
            "neighbor": [
                {
                    "query": _fc_params(nb.query),
                    "key": _fc_params(nb.key),
                    "pair_pos_fc": _fc_params(nb.pair_pos_fc),
                    "out": _conv_params(nb.linear_out_, cfg.num_heads),
                }
                for nb in gatt.neighbor_net
            ],
        },
    }
    params["joint_emb"] = {
        "v2attention": _fc_params(joint.v2attention),
        "q2attention": _fc_params(joint.q2attention),
        "linear": _fc_params(joint.linear),
        "visual_embed": _fc_params(joint.visual_embed),
        "question_embed": _fc_params(joint.question_embed),
    }
    wns = [l for l in classifier.layers if isinstance(l, WeightNorm)]
    params["classifier"] = {"fc1": _wn_params(wns[0]), "fc2": _wn_params(wns[1])}
    return params


def import_reference_h5(h5_path: str, cfg, ntoken: int, v_dim: int, num_ans: int):
    """Load a reference implicit+BUTD .h5 into this framework's param pytree."""
    model = build_reference_model(cfg, ntoken, v_dim, num_ans)
    model.load_weights(h5_path)
    return reference_model_to_params(model, cfg)
