"""Weight-normalized dense layers and the FCNet MLP builder.

Reference semantics (model/weight_norm.py:9-49): the kernel is reparameterized
as ``g * v / ||v||_2`` where **g is a scalar** and the norm is over the *whole*
tensor (``tf.nn.l2_normalize(v, axis=None)``), with ``g`` initialized to the
norm of the freshly-initialized kernel. This differs from per-output-column
PyTorch ``weight_norm``; we keep the reference semantics (SURVEY §2.2-M1).

FCNet structure (model/fc.py:11-50): for every dense layer (including the
last), an optional Dropout sits *before* the weight-normed dense, and the
activation (relu/tanh/identity) follows it.

XLA fuses the normalize into the matmul epilogue; no custom kernel is needed
for these layers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu import nn


def wn_dense_init(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    use_bias: bool = True,
) -> Dict[str, Any]:
    v = nn.glorot_uniform(key, (in_dim, out_dim))
    g = jnp.sqrt(jnp.sum(jnp.square(v)))  # reference _init_norm (weight_norm.py:37-39)
    params = {"v": v, "g": g}
    if use_bias:
        params["b"] = jnp.zeros((out_dim,), jnp.float32)
    return params


def wn_kernel(params: Dict[str, Any], compute_dtype=jnp.float32) -> jax.Array:
    """Materialize the weight-normed kernel: g * v / ||v||_F (scalar g)."""
    v = params["v"]
    scale = params["g"] * jax.lax.rsqrt(jnp.sum(jnp.square(v)) + 1e-12)
    return (v * scale).astype(compute_dtype)


def wn_dense_apply(
    params: Dict[str, Any],
    x: jax.Array,
    compute_dtype=jnp.float32,
    out_dtype=None,
) -> jax.Array:
    """Matmul in compute_dtype, output *stored* in compute_dtype too (TPU MXU
    accumulates in f32 internally regardless of the requested output type).

    Under compute_dtype=bfloat16 this keeps the whole activation chain in
    bf16: profiling the flagship train step (tools/profile_step.py) showed
    ~40% of device time in HBM-bound elementwise fusions and layout copies
    over f32 activations — storing them bf16 halves that traffic. Callers
    that need f32 outputs (softmax logits, the answer logits that feed the
    loss) pass ``out_dtype=jnp.float32``."""
    kernel = wn_kernel(params, compute_dtype)
    y = jnp.dot(
        x.astype(compute_dtype),
        kernel,
        preferred_element_type=out_dtype or compute_dtype,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y


_ACTS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    None: lambda x: x,
}


def fcnet_init(
    key: jax.Array,
    dims: Sequence[int],
    use_bias: bool = True,
) -> Dict[str, Any]:
    """MLP over a dim list, e.g. [in, hidden, out]. Mirrors model/fc.py."""
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        layers.append(wn_dense_init(sub, dims[i], dims[i + 1], use_bias))
    return {"layers": layers}


def fcnet_apply(
    params: Dict[str, Any],
    x: jax.Array,
    activation: Optional[str] = "relu",
    drop_rate: float = 0.0,
    train: bool = False,
    rngs: Optional[nn.RngGen] = None,
    compute_dtype=jnp.float32,
) -> jax.Array:
    act = _ACTS[activation]
    for layer in params["layers"]:
        x = nn.dropout(x, drop_rate, train, rngs)
        x = wn_dense_apply(layer, x, compute_dtype)
        x = act(x)
    return x
