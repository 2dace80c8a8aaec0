"""Pallas fused graph-attention kernel vs the jnp oracle (interpret mode on
CPU; the same kernel compiles on TPU via Mosaic)."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu.ops.pallas.graph_attention import fused_graph_attention


def _oracle(q, k, vw, bias):
    dh = q.shape[-1]
    aff = np.einsum("brhd,bnhd->brhn", q, k) / np.sqrt(dh) + bias
    w = np.exp(aff - aff.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    return np.einsum("brhn,bnho->brho", w, vw)


def _inputs(seed=0, b=2, R=12, H=4, dh=16, n=5, o=16):
    rng = np.random.RandomState(seed)
    return (
        rng.randn(b, R, H, dh).astype(np.float32),
        rng.randn(b, n, H, dh).astype(np.float32),
        rng.randn(b, n, H, o).astype(np.float32),
        rng.randn(b, R, H, n).astype(np.float32),
    )


def test_forward_matches_oracle():
    q, k, vw, bias = _inputs()
    got = np.asarray(
        fused_graph_attention(*map(jnp.asarray, (q, k, vw, bias)), interpret=True)
    )
    want = _oracle(q, k, vw, bias)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_forward_with_neg_inf_mask():
    q, k, vw, bias = _inputs(seed=1)
    bias[:, :, :, 3:] = -9e15  # masked keys
    got = np.asarray(
        fused_graph_attention(*map(jnp.asarray, (q, k, vw, bias)), interpret=True)
    )
    want = _oracle(q, k, vw, bias)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert np.isfinite(got).all()


def test_custom_vjp_matches_autodiff_of_oracle():
    q, k, vw, bias = _inputs(seed=2)

    def loss_p(q, k, vw, bias):
        return jnp.sum(fused_graph_attention(q, k, vw, bias, interpret=True) ** 2)

    def loss_j(q, k, vw, bias):
        dh = q.shape[-1]
        aff = jnp.einsum("brhd,bnhd->brhn", q, k) / np.sqrt(dh) + bias
        w = jax.nn.softmax(aff, -1)
        return jnp.sum(jnp.einsum("brhn,bnho->brho", w, vw) ** 2)

    args = tuple(map(jnp.asarray, (q, k, vw, bias)))
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(*args)
    gj = jax.grad(loss_j, argnums=(0, 1, 2, 3))(*args)
    for a, b_, name in zip(gp, gj, ["q", "k", "vw", "bias"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_broadcast_bias():
    q, k, vw, _ = _inputs(seed=3)
    b, R, H, n = 2, 12, 4, 5
    bias_small = np.random.RandomState(4).randn(b, R, 1, n).astype(np.float32)
    got = np.asarray(
        fused_graph_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(vw),
            jnp.asarray(bias_small), interpret=True,
        )
    )
    want = _oracle(q, k, vw, np.broadcast_to(bias_small, (b, R, H, n)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# Kernel v3: fully-fused implicit attention (sinusoid + dropout + pos-FC +
# log-bias + key-mask + softmax + AV), ops/pallas/implicit_attention.py.
# Validated against the jnp oracle path of graph_attention_apply, which is
# itself numpy-golden-tested in tests/test_graph_attention.py.
# --------------------------------------------------------------------------
from tf_vqa_regat_tpu.ops import weight_norm as wn  # noqa: E402
from tf_vqa_regat_tpu.ops.graph_attention import (  # noqa: E402
    graph_attention_apply,
    graph_attention_init,
)
from tf_vqa_regat_tpu.ops.pallas.implicit_attention import (  # noqa: E402
    fused_implicit_graph_attention,
)
from tf_vqa_regat_tpu.ops.position import position_embedding, position_matrix  # noqa: E402

_B, _R, _N, _D, _H, _P = 2, 12, 5, 64, 4, 16


def _boxes(seed=0, b=_B, R=_R):
    rng = np.random.RandomState(seed)
    x1 = rng.rand(b, R, 2) * 500
    wh = rng.rand(b, R, 2) * 300 + 5
    return np.concatenate([x1, x1 + wh], -1).astype(np.float32)


def _v3_setup(seed=0):
    params = graph_attention_init(jax.random.PRNGKey(seed), _D, _H, pos_emb_dim=_P)
    rng = np.random.RandomState(seed + 10)
    roi = jnp.asarray(rng.randn(_B, _R, _D).astype(np.float32))
    pos_mat = position_matrix(jnp.asarray(_boxes(seed)), _N)
    key_mask = jnp.asarray(rng.rand(_B, _N) > 0.25)
    # Keep at least one valid key per example (degenerate all-masked rows have
    # deliberately different semantics: eps-denominator zeros vs softmax NaN).
    key_mask = key_mask.at[:, 0].set(True)
    return params, roi, pos_mat, key_mask


def _apply(params, roi, pos_mat, key_mask, impl, **kw):
    return graph_attention_apply(
        params, roi, nongt_dim=_N, num_heads=_H, pos_mat=pos_mat,
        key_mask=key_mask, impl=impl, **kw,
    )


def test_v3_eval_matches_jnp_oracle():
    params, roi, pos_mat, key_mask = _v3_setup()
    got = np.asarray(_apply(params, roi, pos_mat, key_mask, "pallas", train=False))
    want = np.asarray(_apply(params, roi, pos_mat, key_mask, "jnp", train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_v3_grads_match_jnp_oracle():
    params, roi, pos_mat, key_mask = _v3_setup(seed=1)

    def loss(p, impl):
        return jnp.sum(_apply(p, roi, pos_mat, key_mask, impl, train=False) ** 2)

    gp = jax.grad(loss)(params, "pallas")
    gj = jax.grad(loss)(params, "jnp")
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_j = jax.tree.leaves(gj)
    assert len(flat_p) == len(flat_j)
    for (path, a), b in zip(flat_p, flat_j):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_v3_train_dropout_mask_semantics():
    """The kernel's in-VMEM dropout (host-supplied keep-mask, scaled by
    1/keep) must equal applying nn.dropout's inverted-dropout semantics to
    the materialized position embedding."""
    params, roi, pos_mat, key_mask = _v3_setup(seed=2)
    layer = params["pair_pos_fc"]["layers"][0]
    drop = 0.3
    dropmask = jnp.asarray(
        (np.random.RandomState(7).rand(_B, _R, _N, _P) > drop).astype(np.uint8)
    )

    # Kernel path with the fixed mask.
    dh, o = _D // _H, _D // _H
    trunc = roi[:, :_N]
    q = wn.fcnet_apply(params["query"], roi, None, 0.0, False, None)
    k = wn.fcnet_apply(params["key"], trunc, None, 0.0, False, None)
    from tf_vqa_regat_tpu.ops.graph_attention import _grouped_kernel

    vw = jnp.einsum("bnd,hdo->bnho", trunc, _grouped_kernel(params["out"]))
    got = fused_implicit_graph_attention(
        q.reshape(_B, _R, _H, dh), k.reshape(_B, _N, _H, dh), vw, pos_mat,
        wn.wn_kernel(layer), layer.get("b"), key_mask, drop, dropmask,
        interpret=True,
    ).reshape(_B, _R, _D) + params["out"]["b"]

    # Oracle: same mask applied to the materialized embedding.
    pe = position_embedding(pos_mat, _P) * dropmask / (1.0 - drop)
    want = graph_attention_apply(
        params, roi, nongt_dim=_N, num_heads=_H, pos_emb=pe,
        key_mask=key_mask, impl="jnp", train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_v3_no_pos_bias_fc_bias_none():
    """b_pos=None path (use_bias=False pos FC) stays finite and correct."""
    params, roi, pos_mat, key_mask = _v3_setup(seed=3)
    del params["pair_pos_fc"]["layers"][0]["b"]
    got = np.asarray(_apply(params, roi, pos_mat, key_mask, "pallas", train=False))
    want = np.asarray(_apply(params, roi, pos_mat, key_mask, "jnp", train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_pallas_with_label_bias_matches_jnp():
    """pos_mat + label_bias WITHOUT adj_mask must not take the fused v3
    branch (the kernel has no edge-label input) — previously the gate only
    checked adj_mask and silently dropped the label bias (round-3 review
    finding). impl='pallas' routes through the v2 kernel with the full bias
    and must match the jnp oracle."""
    params, roi, pos_mat, key_mask = _v3_setup(seed=4)
    rng = np.random.RandomState(11)
    lb = jnp.asarray(rng.randn(_B, _R, _N).astype(np.float32))
    got = np.asarray(
        _apply(params, roi, pos_mat, key_mask, "pallas", train=False,
               label_bias=lb)
    )
    want = np.asarray(
        _apply(params, roi, pos_mat, key_mask, "jnp", train=False,
               label_bias=lb)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # and the bias actually matters (the old silent-drop would produce the
    # no-bias output instead)
    base = np.asarray(_apply(params, roi, pos_mat, key_mask, "jnp", train=False))
    assert np.abs(got - base).max() > 1e-4
