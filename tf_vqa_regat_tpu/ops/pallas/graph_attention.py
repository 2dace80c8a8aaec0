"""Fused masked graph-attention Pallas kernel.

Fuses QK^T -> scale -> +bias (geometry/adjacency/validity, precombined) ->
softmax over keys -> @ (V W_grouped) into one VMEM-resident kernel, so none of
the [b, R, H, n] affinity/weight intermediates round-trip HBM (the reference's
eager TF materialized five of them, graph_att_layer.py:63-117).

Shape notes (flagship: R<=100, n=20, H=16, dh=64, o=64): the key axis n=20 is
far below the 128-lane tile, so a flash-attention-style n-tiling would waste
the MXU — instead each grid step owns one batch element and loops the (static)
head axis, doing two small MXU matmuls per head: [R, dh] x [dh, n] and
[R, n] x [n, o] (SURVEY §7 "hard parts": the small-nongt shape is why naive
flash tiling is wrong here).

Backward runs as plain XLA (custom_vjp recomputing the softmax from saved
inputs): the backward contractions are the same small shapes, and XLA fuses
them well; the forward kernel is where the intermediate traffic was.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, vw_ref, bias_ref, out_ref, *, scale):
    H = q_ref.shape[2]
    for h in range(H):  # static unroll over heads
        qh = q_ref[0, :, h, :]  # [R, dh]
        kh = k_ref[0, :, h, :]  # [n, dh]
        aff = (
            jax.lax.dot_general(
                qh,
                kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias_ref[0, :, h, :]
        )  # [R, n]
        m = jnp.max(aff, axis=-1, keepdims=True)
        e = jnp.exp(aff - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)
        out_ref[0, :, h, :] = jnp.dot(
            w, vw_ref[0, :, h, :], preferred_element_type=jnp.float32
        )  # [R, o]


def _fwd(q, k, vw, bias, interpret):
    b, R, H, dh = q.shape
    n = k.shape[1]
    o = vw.shape[3]
    scale = 1.0 / (dh**0.5)
    kernel = functools.partial(_fwd_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, R, H, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, H, dh), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, H, o), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, H, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, H, o), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, R, H, o), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * R * H * n * (dh + o),
            bytes_accessed=4 * b * (R * H * dh + n * H * (dh + o) + R * H * n + R * H * o),
            transcendentals=b * R * H * n,
        ),
    )(q, k, vw, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(q, k, vw, bias, interpret):
    return _fwd(q, k, vw, bias, interpret)


def _fused_fwd(q, k, vw, bias, interpret):
    return _fwd(q, k, vw, bias, interpret), (q, k, vw, bias)


def _fused_bwd(interpret, res, g):
    q, k, vw, bias = res
    dh = q.shape[-1]
    scale = 1.0 / (dh**0.5)
    # Recompute softmax weights (cheap: the QK matmul is tiny vs the rest of
    # the model); backward contractions stay in XLA.
    aff = (
        jnp.einsum("brhd,bnhd->brhn", q, k, preferred_element_type=jnp.float32)
        * scale
        + bias
    )
    w = jax.nn.softmax(aff, axis=-1)
    dvw = jnp.einsum("brhn,brho->bnho", w, g, preferred_element_type=jnp.float32)
    dw = jnp.einsum("brho,bnho->brhn", g, vw, preferred_element_type=jnp.float32)
    daff = w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))
    dbias = daff
    dq = scale * jnp.einsum(
        "brhn,bnhd->brhd", daff, k, preferred_element_type=jnp.float32
    )
    dk = scale * jnp.einsum(
        "brhn,brhd->bnhd", daff, q, preferred_element_type=jnp.float32
    )
    return dq, dk, dvw, dbias


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_graph_attention(
    q: jax.Array,  # [b, R, H, dh]
    k: jax.Array,  # [b, n, H, dh]
    vw: jax.Array,  # [b, n, H, o]  (V pre-projected by the grouped kernel)
    bias: jax.Array,  # broadcastable to [b, R, H, n]
    interpret: bool = False,
) -> jax.Array:  # [b, R, H, o]
    b, R, H, _ = q.shape
    n = k.shape[1]
    bias = jnp.broadcast_to(bias, (b, R, H, n)).astype(jnp.float32)
    return _fused(
        q.astype(jnp.float32), k.astype(jnp.float32), vw.astype(jnp.float32),
        bias, interpret,
    )
