"""Kernel v3: fully-fused implicit graph attention.

Fuses the ENTIRE per-direction implicit-relation hot path of the reference
(graph_att_layer.py:63-117 plus the position-embedding host stage,
position_emb.py:96-151) into one Pallas kernel:

    sinusoid(position matrix) -> dropout -> pos-FC -> relu -> log-clamp
    -> + key-mask -> QK^T/sqrt(dh) + bias -> segmented softmax -> @ (V W)

Why: kernel v2 (graph_attention.py) tied XLA at 1.67 ms because both were
bound by op-scheduling at these tiny shapes, and the bias still arrived via
a materialized position embedding (131 MB at flagship b=256, R=100, n=20,
P=64) plus einsum/relu/log/broadcast traffic. v3 takes the 16x smaller
position MATRIX [b, R, n, 4] (3 MB) instead and generates the bias in VMEM,
eliminating the embedding round-trip and the [b, R, H, n] bias tensor from
HBM entirely.

Formulation notes (all in-kernel values 2-D; Mosaic rejects multi-dim shape
casts):

- position features arrive geom-major [R, 4n]; one constant matmul against
  `rep` [4n, Pn] both scatters each feature to its m-major P-lane block and
  applies the 100/wavelength^(j/k) frequency scaling, so the sinusoid is a
  single lane-wise select of sin/cos (ops/position.py::position_embedding
  lane layout, bit-matched);
- the pos-FC consumes the [R, Pn] embedding with a block-SCATTERED kernel
  `wbd` [Pn, Hn] with wbd[m*P+p, h*n+m] = W[p, h]: one matmul produces the
  per-head bias directly in the h-major [R, Hn] layout the affinity matmul
  uses — no in-kernel transpose. wbd is built from the weight-normed W by
  differentiable XLA ops OUTSIDE the custom_vjp boundary, so dW flows
  through construction automatically;
- QK/AV use kernel v2's block-diagonal all-heads trick (persistent VMEM
  scratch; grid pinned sequential via dimension_semantics);
- softmax normalizes with the per-row global max over all heads and an eps
  denominator — identical semantics to kernel v2, reproduced exactly in the
  backward;
- dropout on the position embedding (the reference's FCNet places dropout
  before the dense, fc.py:33-38) uses a HOST-SUPPLIED uint8 keep-mask in
  the embedding's exact lane layout, applied in-kernel and reused by the
  backward — fwd and bwd see the same mask by construction with no extra
  residual traffic vs v2 (which saved the same-sized bias tensor);
- backward runs as plain XLA einsums on saved (q, k, vw, post-relu pos
  weights): the contractions are tiny and XLA fuses them well; the forward
  is where the intermediate HBM traffic was. The no-grad (eval) path uses a
  kernel variant that skips the pos-weight store.

Performance (v5e, chained, flagship shapes b=256, R=100, H=16, n=20, P=64;
PERF_NOTES.md "kernel study" for the protocol): the fusion does NOT win —
v3 measures 2.2 ms fwd for the bias+attention chain vs XLA's 1.03 ms. The
block-diagonal/block-scattered matmuls pay 16-20x padded FLOPs to pack all
heads into one MXU pass, and at n=20 that trade loses to XLA's batched
small-matmul engine; a per-head true-FLOP variant (v4 probe) is also 2.4x
slower because 4096 tiny per-example matmuls are pass-overhead-bound and
the per-example K matrices forbid folding batch into M. XLA is at the
measured ceiling for these shapes, so `resolve_impl` keeps the jnp path as
the default; this kernel is retained as a correctness-validated alternate
(exact TPU==interpret equality; oracle-matched in tests/test_pallas.py)
and as the documented record of the fusion experiment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -9e15  # reference mask value (graph_att_layer.py:95)


def _rep_matrix(n: int, P: int, wave_length: float = 1000.0) -> np.ndarray:
    """Constant [4n, Pn] scatter+frequency matrix.

    rep[g*n + m, m*P + g*2k + j] = 100 * wave^-( (j%k)/k ) with k = P//8:
    row layout is geom-major position features; column layout is the m-major
    embedding with per-geom [sin x k | cos x k] lane blocks — exactly
    ops/position.py::position_embedding's layout.
    """
    k = P // 8
    rep = np.zeros((4 * n, P * n), np.float32)
    for g in range(4):
        for m in range(n):
            for j in range(2 * k):
                freq = wave_length ** (-(8.0 / P) * (j % k))
                rep[g * n + m, m * P + g * 2 * k + j] = 100.0 * freq
    return rep


def _is_cos_row(n: int, P: int) -> np.ndarray:
    """Constant [1, Pn] lane mask: which embedding lanes take cos."""
    k = P // 8
    lane = np.arange(P * n)
    return (((lane % P) % (2 * k)) >= k)[None, :].astype(np.float32)


def _kernel_v3(
    q_ref,      # [1, R, H*dh]
    kt_ref,     # [1, H, dh, n]
    vwt_ref,    # [1, H, n, o]
    pm_ref,     # [1, R, 4n]    geom-major position features
    rep_ref,    # [4n, Pn]      constant (broadcast over grid)
    cos_ref,    # [1, Pn]       constant sin/cos lane select
    wbd_ref,    # [Pn, Hn]      block-scattered pos-FC kernel
    bvec_ref,   # [1, Hn]       pos-FC bias, tiled per head block
    mrow_ref,   # [1, 1, Hn]    per-example key-mask row (0 / -9e15)
    *rest,      # [mask_ref] + out_ref [+ pwr_ref] + kbd, vwbd scratch
    scale, H, n, inv_keep, with_mask, save_pwr,
):
    i = 0
    mask_ref = rest[i] if with_mask else None
    i += 1 if with_mask else 0
    out_ref = rest[i]
    pwr_ref = rest[i + 1] if save_pwr else None
    kbd, vwbd = rest[-2], rest[-1]

    dh = kt_ref.shape[2]
    o = vwt_ref.shape[3]

    # Persistent block-diagonal K / VW tiles (kernel v2 trick); grid is
    # pinned sequential so zeroing once at program 0 is sound.
    @pl.when(pl.program_id(0) == 0)
    def _():
        kbd[:, :] = jnp.zeros_like(kbd)
        vwbd[:, :] = jnp.zeros_like(vwbd)

    for h in range(H):  # static unroll: diagonal block writes
        kbd[h * dh : (h + 1) * dh, h * n : (h + 1) * n] = kt_ref[0, h]
        vwbd[h * n : (h + 1) * n, h * o : (h + 1) * o] = vwt_ref[0, h]

    # --- bias generation: sinusoid -> (dropout) -> pos-FC -> relu -> log ---
    pe_pre = jnp.dot(
        pm_ref[0], rep_ref[:, :], preferred_element_type=jnp.float32
    )  # [R, Pn]
    pe = jnp.where(cos_ref[0:1, :] > 0, jnp.cos(pe_pre), jnp.sin(pe_pre))
    if with_mask:
        pe = pe * (mask_ref[0].astype(jnp.float32) * inv_keep)
    pw_raw = (
        jnp.dot(pe, wbd_ref[:, :], preferred_element_type=jnp.float32)
        + bvec_ref[0:1, :]
    )  # [R, Hn]
    pwr = jnp.maximum(pw_raw, 0.0)
    if save_pwr:
        pwr_ref[0] = pwr
    bias = jnp.log(jnp.maximum(pwr, 1e-6)) + mrow_ref[0]

    # --- affinity + segmented softmax + AV (kernel v2 formulation) ---
    aff = (
        jnp.dot(q_ref[0], kbd[:, :], preferred_element_type=jnp.float32) * scale
        + bias
    )  # [R, Hn]
    m = jnp.max(aff, axis=-1, keepdims=True)  # global over all heads
    e = jnp.exp(aff - m)
    seg = jax.lax.broadcasted_iota(jnp.int32, (H * n, H), 0) // n
    S = (seg == jax.lax.broadcasted_iota(jnp.int32, (H * n, H), 1)).astype(jnp.float32)
    sums = jnp.dot(e, S, preferred_element_type=jnp.float32)  # [R, H]
    St = (
        jax.lax.broadcasted_iota(jnp.int32, (H, H * n), 1) // n
        == jax.lax.broadcasted_iota(jnp.int32, (H, H * n), 0)
    ).astype(jnp.float32)
    denom = jnp.dot(sums, St, preferred_element_type=jnp.float32)  # [R, Hn]
    w = e / (denom + 1e-30)

    out_ref[0] = jnp.dot(w, vwbd[:, :], preferred_element_type=jnp.float32)


def _call_v3(q2, kt, vwt, pm, wbd, bvec, mrow, mask, inv_keep, save_pwr, interpret):
    b, R, Hdh = q2.shape
    _, H, dh, n = kt.shape
    o = vwt.shape[3]
    P = wbd.shape[0] // n
    scale = 1.0 / (dh**0.5)
    rep = jnp.asarray(_rep_matrix(n, P))
    cos_row = jnp.asarray(_is_cos_row(n, P))
    with_mask = mask is not None

    kernel = functools.partial(
        _kernel_v3, scale=scale, H=H, n=n,
        inv_keep=inv_keep, with_mask=with_mask, save_pwr=save_pwr,
    )
    in_specs = [
        pl.BlockSpec((1, R, H * dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, dh, n), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H, n, o), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, R, 4 * n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((4 * n, P * n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P * n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((P * n, H * n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H * n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        # mrow is carried rank-3 [b, 1, Hn]: Mosaic requires a block's last
        # two dims to be (divisible by 8, 128) or equal to the array's —
        # a rank-2 (1, Hn) block of a [b, Hn] array fails the sublane rule.
        pl.BlockSpec((1, 1, H * n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q2, kt, vwt, pm, rep, cos_row, wbd, bvec[None, :], mrow[:, None, :]]
    if with_mask:
        in_specs.append(
            pl.BlockSpec((1, R, P * n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(mask)

    out_shape = [jax.ShapeDtypeStruct((b, R, H * o), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, R, H * o), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    if save_pwr:
        out_shape.append(jax.ShapeDtypeStruct((b, R, H * n), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, R, H * n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )

    flops_attn = 2 * b * R * H * H * n * (dh + o)  # block-diag padded
    flops_bias = 2 * b * R * P * n * (4 * n + H * n)
    res = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((H * dh, H * n), jnp.float32),
            pltpu.VMEM((H * n, H * o), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops_attn + flops_bias,
            bytes_accessed=4 * b * R * (H * dh + 4 * n + H * o)
            + (b * R * P * n if with_mask else 0),
            transcendentals=b * R * (P * n + H * n),
        ),
    )(*args)
    return res if save_pwr else (res, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _fused_v3(q2, kt, vwt, pm, wbd, bvec, mrow, mask, inv_keep, interpret):
    # Primal (no-grad / eval) path: kernel variant without the pos-weight
    # store.
    out, _ = _call_v3(
        q2, kt, vwt, pm, wbd, bvec, mrow, mask, inv_keep,
        save_pwr=False, interpret=interpret,
    )
    return out


def _fused_v3_fwd(q2, kt, vwt, pm, wbd, bvec, mrow, mask, inv_keep, interpret):
    out, pwr = _call_v3(
        q2, kt, vwt, pm, wbd, bvec, mrow, mask, inv_keep,
        save_pwr=True, interpret=interpret,
    )
    return out, (q2, kt, vwt, pm, wbd, mrow, mask, pwr)


def _fused_v3_bwd(inv_keep, interpret, res, g):
    q2, kt, vwt, pm, wbd, mrow, mask, pwr = res
    b, R, _ = q2.shape
    _, H, dh, n = kt.shape
    P = wbd.shape[0] // n
    scale = 1.0 / (dh**0.5)

    # Recompute the dropped position embedding (cheap VPU work; this is the
    # only place the [b, R, Pn] embedding ever materializes in HBM, and only
    # on the backward pass).
    rep = jnp.asarray(_rep_matrix(n, P))
    cos_row = jnp.asarray(_is_cos_row(n, P))
    pe_pre = jnp.einsum("brg,gq->brq", pm, rep, preferred_element_type=jnp.float32)
    pe = jnp.where(cos_row[0] > 0, jnp.cos(pe_pre), jnp.sin(pe_pre))
    if mask is not None:
        pe = pe * (mask.astype(jnp.float32) * inv_keep)

    # Reconstruct affinities exactly as the forward computed them.
    bias = jnp.log(jnp.maximum(pwr, 1e-6)) + mrow[:, None, :]  # [b, R, Hn]
    q4 = q2.reshape(b, R, H, dh)
    aff = (
        jnp.einsum("brhd,bhdn->brhn", q4, kt, preferred_element_type=jnp.float32)
        * scale
        + bias.reshape(b, R, H, n)
    )
    # v2/v3 softmax semantics: global row max, eps denominator.
    m = jnp.max(aff, axis=(-2, -1), keepdims=True)
    e = jnp.exp(aff - m)
    w = e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)

    g4 = g.reshape(b, R, H, -1)
    dvwt = jnp.einsum("brhn,brho->bhno", w, g4, preferred_element_type=jnp.float32)
    dw = jnp.einsum("brho,bhno->brhn", g4, vwt, preferred_element_type=jnp.float32)
    daff = w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))
    dq2 = (
        scale
        * jnp.einsum("brhn,bhdn->brhd", daff, kt, preferred_element_type=jnp.float32)
    ).reshape(b, R, H * dh)
    dkt = scale * jnp.einsum(
        "brhn,brhd->bhdn", daff, q4, preferred_element_type=jnp.float32
    )
    dbias = daff.reshape(b, R, H * n)
    # d log(max(relu(x), 1e-6)) chain: nonzero only where pwr > 1e-6.
    dpwr = jnp.where(pwr > 1e-6, dbias / pwr, 0.0)
    dwbd = jnp.einsum("brp,brq->pq", pe, dpwr, preferred_element_type=jnp.float32)
    dbvec = jnp.sum(dpwr, axis=(0, 1))
    return (
        dq2, dkt, dvwt, jnp.zeros_like(pm), dwbd, dbvec,
        jnp.zeros_like(mrow), None,
    )


_fused_v3.defvjp(_fused_v3_fwd, _fused_v3_bwd)


def fused_implicit_graph_attention(
    q: jax.Array,  # [b, R, H, dh]
    k: jax.Array,  # [b, n, H, dh]
    vw: jax.Array,  # [b, n, H, o]   V pre-projected by the grouped kernel
    pos_mat: jax.Array,  # [b, R, n, 4] pairwise position matrix
    w_pos: jax.Array,  # [P, H] weight-normed pos-FC kernel (materialized)
    b_pos,  # [H] pos-FC bias or None
    key_mask,  # [b, n] bool or None
    drop_rate: float = 0.0,
    dropmask=None,  # [b, R, n, P] uint8 keep-mask (train) or None
    interpret: bool = False,
) -> jax.Array:  # [b, R, H, o]
    b, R, H, dh = q.shape
    n = k.shape[1]
    o = vw.shape[3]
    P = w_pos.shape[0]

    # XLA-side layout prep (fuses into producers).
    q2 = q.astype(jnp.float32).reshape(b, R, H * dh)
    kt = jnp.transpose(k.astype(jnp.float32), (0, 2, 3, 1))  # [b, H, dh, n]
    vwt = jnp.transpose(vw.astype(jnp.float32), (0, 2, 1, 3))  # [b, H, n, o]
    # geom-major position features [b, R, 4n].
    pm = jnp.transpose(pos_mat.astype(jnp.float32), (0, 1, 3, 2)).reshape(b, R, 4 * n)
    # Block-scattered pos-FC kernel: wbd[m*P+p, h*n+m] = w_pos[p, h]. Built by
    # differentiable ops so the custom-vjp cotangent dwbd chains back to
    # w_pos (and through weight-norm) automatically.
    wbd = jnp.einsum("mM,ph->mphM", jnp.eye(n, dtype=jnp.float32), w_pos).reshape(
        n * P, H * n
    )
    bvec = (
        jnp.repeat(b_pos.astype(jnp.float32), n)
        if b_pos is not None
        else jnp.zeros((H * n,), jnp.float32)
    )
    if key_mask is not None:
        km = jnp.where(key_mask, 0.0, jnp.float32(NEG_INF))  # [b, n]
        mrow = jnp.tile(km, (1, H))  # [b, Hn], h-major
    else:
        mrow = jnp.zeros((b, H * n), jnp.float32)
    mask = None
    inv_keep = 1.0
    if dropmask is not None and drop_rate > 0.0:
        # [b, R, n, P] -> the embedding's exact [b, R, nP] lane layout
        # (m-major blocks of P — a plain reshape).
        mask = dropmask.reshape(b, R, n * P)
        # nn.dropout's quantized inverse (t/256 drop probability): the mask
        # upstream is drawn as bits >= t, so E[mask * inv_keep] == 1 exactly
        t = min(255, max(1, int(round(drop_rate * 256.0))))
        inv_keep = 256.0 / (256 - t)
    out = _fused_v3(q2, kt, vwt, pm, wbd, bvec, mrow, mask, inv_keep, interpret)
    return out.reshape(b, R, H, o)
