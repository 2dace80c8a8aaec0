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
