"""Language stack: word embedding, GRU question encoder, question self-attention.

Mirrors reference model/language_model.py with two deliberate fixes:

1. The GRU runs once; both the full sequence (for self-attention) and the last
   state (for fusion) come from the same application. The reference re-ran the
   GRU (rel_graph_net.py:44,57) — numerically identical since its dropout is
   forced to 0 (language_model.py:105).

2. QuestionSelfAttention softmaxes over the *sequence* axis per example. The
   reference transposes logits to [seq, batch] and softmaxes over axis 1 (the
   batch!) then flat-reshapes across examples (language_model.py:163-167) —
   a transcription bug relative to the PyTorch original (which uses
   ``F.softmax(logits, 1)`` on [batch, seq]). We implement the original,
   correct semantics.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu import nn
from tf_vqa_regat_tpu.ops import weight_norm as wn
from tf_vqa_regat_tpu.ops.embedding import embedding_apply, embedding_init
from tf_vqa_regat_tpu.ops.gru import gru_apply, gru_init


# ---------------------------------------------------------------- WordEmbedding
def word_embedding_init(key: jax.Array, ntoken: int, emb_dim: int, op: str) -> Dict[str, Any]:
    """reference language_model.py:49-61; op containing 'c' adds a second
    (initially frozen) table whose output is concatenated -> 600-d."""
    k1, k2 = jax.random.split(key)
    params = {"emb": embedding_init(k1, ntoken + 1, emb_dim)}
    if "c" in op:
        params["emb_"] = embedding_init(k2, ntoken + 1, emb_dim)
    return params


def word_embedding_load_glove(
    params: Dict[str, Any],
    glove: np.ndarray,  # [ntoken, 300]
    op: str,
    tfidf: Optional[Any] = None,  # scipy sparse [ntoken, ext_ntoken] or None
    tfidf_weights: Optional[np.ndarray] = None,  # [ext_ntoken - ntoken, 300]
) -> Tuple[Dict[str, Any], bool]:
    """Replicates init_embedding (language_model.py:63-90): the primary table
    gets [glove; zero pad row]; with tfidf, the second table gets
    [tfidf @ [glove; vg_glove]; pad] and becomes trainable.

    Returns (new_params, emb__trainable).
    """
    ntoken, emb_dim = glove.shape
    pad = np.zeros((1, emb_dim), np.float32)
    primary = np.concatenate([glove.astype(np.float32), pad], axis=0)
    new = dict(params)
    new["emb"] = {"table": jnp.asarray(primary)}
    emb__trainable = False
    if "emb_" in params:
        second = primary
        if tfidf is not None:
            ext = np.concatenate(
                [glove.astype(np.float32), tfidf_weights.astype(np.float32)], axis=0
            )
            mixed = np.asarray(tfidf @ ext, dtype=np.float32)  # [ntoken, 300]
            second = np.concatenate([mixed, pad], axis=0)
            emb__trainable = True
        new["emb_"] = {"table": jnp.asarray(second)}
    return new, emb__trainable


def word_embedding_apply(
    params: Dict[str, Any],
    question: jax.Array,  # [b, T] int32
    padding_idx: int,
    op: str,
    drop_rate: float,
    train: bool,
    rngs: Optional[nn.RngGen],
    compute_dtype=jnp.float32,
) -> jax.Array:
    emb = embedding_apply(params["emb"], question, padding_idx, compute_dtype)
    if "c" in op:
        emb2 = embedding_apply(params["emb_"], question, padding_idx, compute_dtype)
        emb = jnp.concatenate([emb, emb2], axis=-1)
    return nn.dropout(emb, drop_rate, train, rngs)


# ------------------------------------------------------------ QuestionEmbedding
def question_embedding_init(key: jax.Array, in_dim: int, num_hid: int) -> Dict[str, Any]:
    return {"gru": gru_init(key, in_dim, num_hid)}


def question_embedding_apply(
    params: Dict[str, Any], w_emb: jax.Array, compute_dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """Returns (all hidden states [b, T, h], last state [b, h])."""
    seq = gru_apply(params["gru"], w_emb, compute_dtype)
    return seq, seq[:, -1]


# -------------------------------------------------------- QuestionSelfAttention
def question_self_attention_init(key: jax.Array, num_hid: int) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {
        "linear1": wn.fcnet_init(k1, [num_hid, num_hid]),
        "linear2": wn.fcnet_init(k2, [num_hid, 1]),
    }


def question_self_attention_apply(
    params: Dict[str, Any],
    q_seq: jax.Array,  # [b, T, h]
    drop_rate: float,
    train: bool,
    rngs: Optional[nn.RngGen],
    compute_dtype=jnp.float32,
    ref_compat: bool = False,
) -> jax.Array:
    # linear1 carries dropout-before-dense (reference language_model.py:140);
    # linear2 has none (language_model.py:143).
    a = wn.fcnet_apply(params["linear1"], q_seq, None, drop_rate, train, rngs, compute_dtype)
    a = jnp.tanh(a)
    logits = wn.fcnet_apply(
        params["linear2"], a, None, 0.0, train, rngs, compute_dtype,
    ).astype(jnp.float32)  # f32 softmax statistics
    b, T = logits.shape[0], logits.shape[1]
    if ref_compat:
        # Reproduce the reference's transcription bug exactly
        # (language_model.py:163-167): transpose logits to [T, b], softmax
        # over the BATCH axis, then flat-reshape back to [b, T] — scrambling
        # (example, position) identity. Used only for trajectory-equivalence
        # runs and the fix A/B (cfg.ref_compat_q_att).
        weights = jax.nn.softmax(logits[..., 0].T, axis=1).reshape(b, T)
    else:
        weights = jax.nn.softmax(logits[..., 0], axis=-1)  # [b, T], per-example
    pooled = jnp.einsum(
        "bt,bth->bh",
        weights.astype(compute_dtype),
        q_seq.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return nn.dropout(pooled, drop_rate, train, rngs)
