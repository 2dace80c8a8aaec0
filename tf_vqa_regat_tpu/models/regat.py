"""Full ReGAT network: init / apply / builder.

Reference top model: rel_graph_net.py:9-66 (forward) and 68-125 (builder).
Differences by design (all documented at the module that owns them):
  - geometry (implicit position embedding, spatial adjacency) computed in-jit
    from raw boxes instead of per-step host numpy;
  - one GRU application (models/language.py);
  - validity-masked rois instead of zero-feature padding;
  - the spatial builder reads `arg.relation_dim` NameError
    (rel_graph_net.py:89) and the explicit encoders' typo are fixed;
  - no eval-mode warm-up forward pass (JAX init is shape-driven,
    vs rel_graph_net.py:112-123).

The batch is a dict of statically-shaped arrays:
  features  [b, R, v_dim] float32   region features
  norm_bb   [b, R, 6]     float32   normalized box features
  question  [b, 14]       int32     token ids (pad = ntoken)
  bb        [b, R, 4]     float32   raw boxes
  target    [b, A]        float32   soft answer scores
  num_boxes [b]           int32     valid roi count per example
  valid     [b]           bool      example validity (padded final batches)
  adj_label [b, R, R]     int32     semantic edge labels (semantic mode only)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu import nn
from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.models import classifier as clf
from tf_vqa_regat_tpu.models import fusion, language, relation
from tf_vqa_regat_tpu.ops.position import position_matrix
from tf_vqa_regat_tpu.ops.spatial_graph import broadcast_adj_labels, build_spatial_graph

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def resolve_impl(cfg: Config) -> str:
    """Graph-attention implementation selector.

    Measured on v5e at flagship shapes (b=256, R=100, H=16, n=20), chained
    fwd per direction: XLA bias-chain + attention 1.03 ms; kernel v2
    (block-diagonal all-heads, explicit path) ties XLA; kernel v3 (fully
    fused implicit path, ops/pallas/implicit_attention.py) 2.2 ms. The
    kernel study in PERF_NOTES.md shows XLA's batched small-matmul engine is
    at the measured ceiling for these shapes, so XLA stays the default;
    --use_pallas opts into the oracle-validated kernel path (correctness
    alternate, not a perf win)."""
    if cfg.use_pallas and jax.default_backend() == "tpu":
        return "pallas"
    return "jnp"


def init_regat(
    key: jax.Array, cfg: Config, ntoken: int, v_dim: int, num_ans: int
) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
    params: Dict[str, Any] = {
        "w_emb": language.word_embedding_init(keys[0], ntoken, 300, cfg.op),
        "q_emb": language.question_embedding_init(keys[1], cfg.word_dim, cfg.num_hid),
        "q_att": language.question_self_attention_init(keys[2], cfg.num_hid),
    }
    if cfg.relation_type == "implicit":
        params["v_relation"] = relation.implicit_encoder_init(
            keys[3], v_dim, cfg.num_hid, cfg.relation_dim, cfg.dir_num,
            cfg.imp_pos_emb_dim, cfg.num_heads, cfg.label_bias,
        )
    elif cfg.relation_type == "spatial":
        params["v_relation"] = relation.explicit_encoder_init(
            keys[3], v_dim, cfg.num_hid, cfg.relation_dim, cfg.dir_num,
            cfg.spa_label_num, cfg.num_heads, cfg.label_bias,
        )
    elif cfg.relation_type == "semantic":
        params["v_relation"] = relation.explicit_encoder_init(
            keys[3], v_dim, cfg.num_hid, cfg.relation_dim, cfg.dir_num,
            cfg.sem_label_num, cfg.num_heads, cfg.label_bias,
        )
    else:
        raise ValueError(f"unknown relation_type {cfg.relation_type!r}")

    if cfg.fusion == "butd":
        params["joint_emb"] = fusion.butd_init(
            keys[4], cfg.relation_dim, cfg.num_hid, cfg.num_hid
        )
    elif cfg.fusion == "ban":
        from tf_vqa_regat_tpu.models import ban

        params["joint_emb"] = ban.ban_init(
            keys[4], cfg.relation_dim, cfg.num_hid, cfg.ban_glimpse
        )
    elif cfg.fusion == "mutan":
        from tf_vqa_regat_tpu.models import mutan

        # MuTAN scores answers directly; no separate classifier (matching the
        # PyTorch ReGAT, which sets classifier=None for mutan).
        params["joint_emb"] = mutan.mutan_init(
            keys[4], cfg.relation_dim, cfg.num_hid, num_ans, cfg.mutan_rank,
            cfg.mutan_gamma,
        )
    else:
        raise ValueError(f"unknown fusion {cfg.fusion!r}")

    if cfg.fusion != "mutan":
        params["classifier"] = clf.classifier_init(
            keys[5], cfg.num_hid, cfg.num_hid * 2, num_ans
        )
    return params


def apply_regat(
    params: Dict[str, Any],
    cfg: Config,
    batch: Dict[str, jax.Array],
    ntoken: int,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    impl: str = "jnp",
    sp_mesh=None,
) -> jax.Array:
    """Forward pass -> logits [b, num_answers].

    sp_mesh (+ cfg.sp_rois): the roi-axis analog of sequence parallelism
    (SURVEY §2.5) — anchor the visual activations' roi axis to the 'model'
    mesh axis with sharding constraints; GSPMD propagates the layout through
    the relation encoder and inserts the (tiny, 20-key) gathers over ICI.
    Useful only at roi counts far beyond this model's 100; provided for
    framework completeness and tested for numerical equivalence."""
    compute_dtype = _DTYPES[cfg.compute_dtype]
    rngs = nn.RngGen(rng) if (train and rng is not None) else None
    drop = cfg.dropout
    # Reference dropout topology (rel_graph_net.py:71-103): args.dropout
    # reaches ONLY the language stack and the classifier; the relation
    # encoder and BUTD keep their hardcoded 0.2 defaults
    # (graph_att_net.py:14,23-24, graph_att_layer.py:15,26-28,
    # fusion.py:13-18) — so --dropout 0.5 must not change the graph/fusion
    # regularization (review finding). Pinned likewise, with the repo-wide
    # convention that --dropout 0 turns EVERY dropout off (the
    # trajectory-equivalence harness relies on a fully deterministic step).
    # BAN/MuTAN are net-new families (no reference code): they take
    # cfg.dropout directly, documented in models/ban.py / models/mutan.py.
    graph_drop = 0.2 if drop > 0 else 0.0

    features = batch["features"]
    b, R, _ = features.shape
    roi_mask = (
        jnp.arange(R, dtype=jnp.int32)[None, :] < batch["num_boxes"][:, None]
    )  # [b, R]

    shard_rois = lambda x: x
    if sp_mesh is not None and cfg.sp_rois:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tf_vqa_regat_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        def shard_rois(x):
            spec = [None] * x.ndim
            spec[0], spec[1] = DATA_AXIS, MODEL_AXIS
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(sp_mesh, P(*spec))
            )

        features = shard_rois(features)

    w_emb = language.word_embedding_apply(
        params["w_emb"], batch["question"], ntoken, cfg.op, drop, train, rngs, compute_dtype
    )
    q_seq, q_last = language.question_embedding_apply(params["q_emb"], w_emb, compute_dtype)
    q_vec = language.question_self_attention_apply(
        params["q_att"], q_seq, drop, train, rngs, compute_dtype,
        ref_compat=cfg.ref_compat_q_att,
    )

    rel_kw = dict(
        nongt_dim=cfg.nongt_dim,
        num_heads=cfg.num_heads,
        num_steps=cfg.num_steps,
        residual_connection=cfg.residual_connection,
        drop_rate=graph_drop,
        train=train,
        rngs=rngs,
        compute_dtype=compute_dtype,
        impl=impl,
        fold=cfg.fold_dual_attention,
    )
    if cfg.relation_type == "implicit":
        # Raw pairwise geometry only — 16x smaller than the embedding; the
        # sinusoid+FC bias is generated downstream (in-VMEM by the fused
        # Pallas kernel; by the jnp oracle in ops/graph_attention.py).
        if cfg.ref_compat_pos:
            from tf_vqa_regat_tpu.ops.position import position_matrix_ref_compat

            pos_mat = position_matrix_ref_compat(batch["bb"], cfg.nongt_dim)
        else:
            pos_mat = position_matrix(batch["bb"], cfg.nongt_dim)
        v_emb = shard_rois(
            relation.implicit_encoder_apply(
                params["v_relation"], features, pos_mat, q_vec, roi_mask, **rel_kw
            )
        )
    else:
        label_num = cfg.spa_label_num if cfg.relation_type == "spatial" else cfg.sem_label_num
        if "adj_label" in batch:
            adj_label = batch["adj_label"]
        elif cfg.relation_type == "spatial":
            # Spatial adjacency is a pure function of the boxes — build in-jit.
            adj_label = jax.vmap(build_spatial_graph)(batch["bb"], batch["norm_bb"])
        else:
            raise ValueError("semantic relation requires adj_label in the batch")
        adj_onehot = broadcast_adj_labels(adj_label, label_num)
        v_emb = shard_rois(
            relation.explicit_encoder_apply(
                params["v_relation"], features, adj_onehot, q_vec, roi_mask, **rel_kw
            )
        )

    if cfg.fusion == "butd":
        joint, _ = fusion.butd_apply(
            params["joint_emb"], v_emb, q_last, roi_mask, graph_drop, train,
            rngs, compute_dtype,
        )
    elif cfg.fusion == "ban":
        from tf_vqa_regat_tpu.models import ban

        joint, _ = ban.ban_apply(
            params["joint_emb"], v_emb, q_seq, roi_mask, drop, train, rngs, compute_dtype
        )
    else:
        from tf_vqa_regat_tpu.models import mutan

        logits, _ = mutan.mutan_apply(
            params["joint_emb"], v_emb, q_last, roi_mask, drop, train, rngs,
            compute_dtype, rank=cfg.mutan_rank,
            shared_qdrop=cfg.mutan_shared_qdrop,
        )
        return logits  # mutan scores answers directly

    return clf.classifier_apply(
        params["classifier"], joint, drop, train, rngs, compute_dtype
    )


def trainable_mask(params: Dict[str, Any], emb2_trainable: bool) -> Dict[str, Any]:
    """Boolean pytree: which leaves receive optimizer updates.

    - The second word-embedding table is frozen until a TF-IDF init unfreezes
      it (reference language_model.py:56-58,84-85).
    - Biases that feed *directly into a softmax* are shift-invariant no-ops:
      their true gradient is zero, realized numerically only by cancellation.
      Left trainable, Adamax turns that float noise into O(lr) drift (noise /
      max(noise) ~ 1), which breaks run-to-run and topology-equivalence
      determinism without affecting the model function. They are frozen:
      q_att's scoring bias (softmax over tokens), BUTD's attention bias
      (softmax over rois), BAN's h_bias (softmax over roi x token), MuTAN's
      glimpse-scoring bias (softmax over rois).
    """
    mask = jax.tree.map(lambda _: True, params)
    if "emb_" in params["w_emb"] and not emb2_trainable:
        mask["w_emb"]["emb_"] = jax.tree.map(lambda _: False, params["w_emb"]["emb_"])

    def freeze_last_bias(fc_mask):
        if "b" in fc_mask["layers"][-1]:
            fc_mask["layers"][-1]["b"] = False

    freeze_last_bias(mask["q_att"]["linear2"])
    # The graph-attention K-projection bias is inert too: it shifts every
    # key's affinity by the same per-query constant (aff += q . b), which the
    # softmax over keys cancels (reference graph_att_layer.py:58-66).
    gatt = mask.get("v_relation", {}).get("gatt")
    if gatt is not None:
        for neigh in gatt["neighbor"]:
            freeze_last_bias(neigh["key"])
    joint = mask.get("joint_emb", {})
    if "linear" in joint:  # BUTD
        freeze_last_bias(joint["linear"])
    if "h_bias" in joint:  # BAN
        mask["joint_emb"]["h_bias"] = False
    if "att_linear1" in joint:  # MuTAN
        freeze_last_bias(joint["att_linear1"])
    return mask
