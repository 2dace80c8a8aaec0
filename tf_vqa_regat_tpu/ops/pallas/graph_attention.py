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

Performance status (v5e, chained timing at flagship shapes b=256, R=100,
H=16, n=20):
  v1 (per-head loop):        3.10 ms fwd — the [R, dh] x [dh, 20] matmuls
                             fill 20 of 128 MXU columns;
  v2 (block-diagonal heads): 1.67 ms fwd — parity with XLA's batched einsums
                             (1.68 ms); both are bound by per-matmul MXU
                             scheduling overhead at these tiny shapes, not
                             bandwidth or FLOPs.
XLA remains the default path (models/regat.py::resolve_impl) since it matches
the kernel with less machinery; remaining headroom would come from fusing the
bias/pos-embedding computation into the kernel (saves the 131 MB bias
materialization), future work.
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


def _fwd_kernel_v2(
    q_ref,      # [1, R, H*dh]   (pre-flattened by the caller)
    kt_ref,     # [1, H, dh, n]  (pre-transposed)
    vwt_ref,    # [1, H, n, o]
    bias_ref,   # [1, R, H*n]    (pre-flattened)
    out_ref,    # [1, R, H*o]
    kbd,        # scratch [H*dh, H*n]
    vwbd,       # scratch [H*n, H*o]
    *, scale, H, n,
):
    """Block-diagonal all-heads formulation: instead of 2 starved MXU matmuls
    per head ([R, dh] x [dh, n] fills 20 of 128 columns), assemble
    block-diagonal K / VW tiles in persistent scratch so all H heads contract
    in three full-width MXU ops per batch element:

        aff  = [R, H*dh] @ Kbd [H*dh, H*n]          (QK^T, all heads)
        sums = e @ S [H*n, H]; denom = sums @ S^T   (segmented softmax)
        out  = w @ VWbd [H*n, H*o]                  (AV + head concat)

    The padded block-diagonal FLOPs are Hx the useful work but tiny in
    absolute terms; MXU utilization is what matters at these shapes. All
    in-kernel values stay 2-D (Mosaic rejects multi-dim shape casts);
    flattening/transposition happens in XLA around the call, where it fuses
    into producers.

    Softmax stability uses the per-row *global* max — within each n-key
    segment it is one shared constant, so segment softmaxes are unchanged.
    A fully-masked segment (empty adjacency row) yields all-zero weights here
    (denominator eps) where the reference's softmax gives uniform weights over
    the masked keys; zero attention is the saner semantics for an edgeless
    node, and the implicit path never hits this (key_mask keeps >=1 valid
    key).
    """
    dh = kt_ref.shape[2]
    o = vwt_ref.shape[3]

    # Zero the scratch once; only diagonal blocks are ever (re)written.
    @pl.when(pl.program_id(0) == 0)
    def _():
        kbd[:, :] = jnp.zeros_like(kbd)
        vwbd[:, :] = jnp.zeros_like(vwbd)

    for h in range(H):  # static unroll: diagonal block writes
        kbd[h * dh : (h + 1) * dh, h * n : (h + 1) * n] = kt_ref[0, h]
        vwbd[h * n : (h + 1) * n, h * o : (h + 1) * o] = vwt_ref[0, h]

    aff = (
        jnp.dot(q_ref[0], kbd[:, :], preferred_element_type=jnp.float32) * scale
        + bias_ref[0]
    )  # [R, H*n]

    m = jnp.max(aff, axis=-1, keepdims=True)
    e = jnp.exp(aff - m)
    seg = jax.lax.broadcasted_iota(jnp.int32, (H * n, H), 0) // n
    S = (seg == jax.lax.broadcasted_iota(jnp.int32, (H * n, H), 1)).astype(jnp.float32)
    sums = jnp.dot(e, S, preferred_element_type=jnp.float32)  # [R, H]
    St = (
        jax.lax.broadcasted_iota(jnp.int32, (H, H * n), 1) // n
        == jax.lax.broadcasted_iota(jnp.int32, (H, H * n), 0)
    ).astype(jnp.float32)
    denom = jnp.dot(sums, St, preferred_element_type=jnp.float32)  # [R, H*n]
    w = e / (denom + 1e-30)

    out_ref[0] = jnp.dot(w, vwbd[:, :], preferred_element_type=jnp.float32)


_KERNEL_VERSION = 2  # 1 = per-head loop; 2 = block-diagonal all-heads


def _fwd_v1(q, k, vw, bias, interpret):
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


def _fwd_v2(q, k, vw, bias, interpret):
    b, R, H, dh = q.shape
    n = k.shape[1]
    o = vw.shape[3]
    scale = 1.0 / (dh**0.5)
    # XLA-side layout prep (fuses into the producers): 2-D-per-block shapes.
    q2 = q.reshape(b, R, H * dh)
    kt = jnp.transpose(k, (0, 2, 3, 1))  # [b, H, dh, n]
    vwt = jnp.transpose(vw, (0, 2, 1, 3))  # [b, H, n, o]
    bias2 = bias.reshape(b, R, H * n)
    kernel = functools.partial(_fwd_kernel_v2, scale=scale, H=H, n=n)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, R, H * dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, dh, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, n, o), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, H * n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, H * o), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, R, H * o), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((H * dh, H * n), jnp.float32),
            pltpu.VMEM((H * n, H * o), jnp.float32),
        ],
        # The persistent block-diagonal scratch is zeroed only at program 0,
        # which is sound only if the grid executes sequentially on one core —
        # pin that requirement explicitly (megacore must not split the grid).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * R * H * H * n * (dh + o),  # block-diag padded
            bytes_accessed=4 * b * (R * H * dh + n * H * (dh + o) + R * H * n + R * H * o),
            transcendentals=b * R * H * n,
        ),
    )(q2, kt, vwt, bias2)
    return out.reshape(b, R, H, o)


def _fwd(q, k, vw, bias, interpret):
    if _KERNEL_VERSION == 2:
        return _fwd_v2(q, k, vw, bias, interpret)
    return _fwd_v1(q, k, vw, bias, interpret)


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
    # Reproduce the forward's exact weight semantics so fwd/bwd agree even on
    # degenerate rows. v2 normalizes with the per-row max across ALL heads and
    # an eps denominator: a head segment whose affinities all underflow
    # relative to the global max (e.g. fully masked while another head's row
    # max dominates) gets all-zero weights, where per-head jax.nn.softmax
    # would return uniform weights.
    if _KERNEL_VERSION == 2:
        m = jnp.max(aff, axis=(-2, -1), keepdims=True)  # global over (H, n)
        e = jnp.exp(aff - m)
        w = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)
    else:
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
