"""Export this framework's params to a reference-loadable keras .h5.

Inverse of train/h5_import.py: build the reference's OWN keras model
(implicit+BUTD — the only combination the reference trains), assign this
framework's param pytree into its variables using the same correspondences
the cross-framework parity tests verify, then `model.save_weights(path)`.
The result loads in the reference exactly like its own artifact
(reference main.py:145 save; rel_graph_net.py:112-124 load path), giving
users a two-way migration story: reference .h5 -> here (h5_import) and
here -> reference .h5 (this module).

Caveat mirror of the import: this framework fixes the reference's
question-self-attention softmax axis, so the reference will reproduce our
predictions only modulo that quirk (train with --ref_compat_q_att for
bit-comparable behavior).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from tf_vqa_regat_tpu.train.h5_import import build_reference_model


def _set_wn(wn_layer, p: Dict[str, Any]) -> None:
    wn_layer.v.assign(np.asarray(p["v"]))
    wn_layer.g.assign(np.asarray(p["g"]))
    if "b" in p:
        wn_layer.layer.bias.assign(np.asarray(p["b"]))


def _set_fc(fc, p: Dict[str, Any]) -> None:
    from model.weight_norm import WeightNorm  # reference checkout

    wns = [l for l in fc.layers if isinstance(l, WeightNorm)]
    if len(wns) != len(p["layers"]):
        # a real error, not a debug assert (-O strips those): zip would
        # silently assign only the shorter side and export wrong weights
        raise ValueError(
            f"checkpoint/config mismatch: reference FCNet has {len(wns)} "
            f"weight-norm layers, checkpoint has {len(p['layers'])}"
        )
    for layer, lp in zip(wns, p["layers"]):
        _set_wn(layer, lp)


def _set_conv(conv, p: Dict[str, Any], num_heads: int) -> None:
    # inverse of h5_import._conv_params: [H, D, o] -> [1, 1, D, H*o]
    v = np.asarray(p["v"])
    H, D, o = v.shape
    if H != num_heads:
        raise ValueError(
            f"checkpoint/config mismatch: checkpoint grouped-conv has {H} "
            f"heads, --num_heads is {num_heads}"
        )
    kernel = np.concatenate([v[h] for h in range(H)], axis=1)[None, None]
    conv.v.assign(kernel)
    conv.g.assign(np.asarray(p["g"]))
    conv.layer.bias.assign(np.asarray(p["b"]))


def params_to_reference_model(model, params: Dict[str, Any], cfg) -> None:
    """Assign this framework's param pytree into a built reference model."""
    from model.weight_norm import WeightNorm

    model.w_emb.emb.embeddings.assign(np.asarray(params["w_emb"]["emb"]["table"]))
    if "c" in cfg.op:
        model.w_emb.emb_.embeddings.assign(
            np.asarray(params["w_emb"]["emb_"]["table"])
        )

    gru = params["q_emb"]["gru"]
    kernel_v, recurrent_v, bias_v = model.q_emb.gru.weights
    kernel_v.assign(np.asarray(gru["kernel"]))
    recurrent_v.assign(np.asarray(gru["recurrent_kernel"]))
    bias_v.assign(np.asarray(gru["bias"]))

    _set_fc(model.q_att.linear1, params["q_att"]["linear1"])
    _set_fc(model.q_att.linear2, params["q_att"]["linear2"])

    vr = params["v_relation"]
    _set_fc(model.v_relation.v2out, vr["v2out"])
    gatt = model.v_relation.implicit_relation
    _set_fc(gatt.self_weights, vr["gatt"]["self_weights"])
    if len(gatt.neighbor_net) != len(vr["gatt"]["neighbor"]):
        # same -O-proof guard as _set_fc: zip truncation would silently
        # leave one direction's attention at its random init
        raise ValueError(
            f"checkpoint/config mismatch: --dir_num builds "
            f"{len(gatt.neighbor_net)} attention directions, checkpoint has "
            f"{len(vr['gatt']['neighbor'])}"
        )
    for nb, np_ in zip(gatt.neighbor_net, vr["gatt"]["neighbor"]):
        _set_fc(nb.query, np_["query"])
        _set_fc(nb.key, np_["key"])
        _set_fc(nb.pair_pos_fc, np_["pair_pos_fc"])
        _set_conv(nb.linear_out_, np_["out"], cfg.num_heads)

    je = params["joint_emb"]
    _set_fc(model.joint_emb.v2attention, je["v2attention"])
    _set_fc(model.joint_emb.q2attention, je["q2attention"])
    _set_fc(model.joint_emb.linear, je["linear"])
    _set_fc(model.joint_emb.visual_embed, je["visual_embed"])
    _set_fc(model.joint_emb.question_embed, je["question_embed"])

    wns = [l for l in model.classifier.layers if isinstance(l, WeightNorm)]
    _set_wn(wns[0], params["classifier"]["fc1"])
    _set_wn(wns[1], params["classifier"]["fc2"])


def export_reference_h5(
    params: Dict[str, Any], h5_path: str, cfg, ntoken: int, v_dim: int, num_ans: int
) -> str:
    """Write `params` as a reference-loadable weights-only .h5."""
    model = build_reference_model(cfg, ntoken, v_dim, num_ans)
    params_to_reference_model(model, params, cfg)
    model.save_weights(h5_path)
    return h5_path
