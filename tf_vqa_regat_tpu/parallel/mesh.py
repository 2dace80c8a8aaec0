"""Mesh + sharding-rule construction."""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp_size: int = 0,
    tp_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """1-D data mesh by default; optional 2-D (data, model) for TP.
    dp_size=0 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_size <= 0:
        assert n % tp_size == 0, f"{n} devices not divisible by tp={tp_size}"
        dp_size = n // tp_size
    assert dp_size * tp_size == n, (
        f"mesh {dp_size}x{tp_size} != {n} devices"
    )
    arr = np.asarray(devices).reshape(dp_size, tp_size)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for params.

    With tp=1 everything is replicated. With tp>1, tensor-parallel rules:
      - graph-attention Q/K projections: output (head) dim sharded;
      - grouped output projection [H, D, o]: head axis sharded;
      - classifier hidden+output matmuls: column/row sharded (the 3,129-way
        answer matmul is the largest single matmul in the model);
    everything else replicated. XLA/GSPMD propagates and inserts collectives.
    """
    tp = mesh.shape[MODEL_AXIS]

    def spec_for(path: str, leaf) -> P:
        if tp == 1 or not hasattr(leaf, "ndim"):
            return P()
        if "v_relation" in path and "neighbor" in path:
            if path.endswith("out/v"):
                return P(MODEL_AXIS, None, None)  # [H, D, o] shard heads
            if ("query" in path or "/key/" in path) and path.endswith("/v"):
                return P(None, MODEL_AXIS)  # [D, D] shard head-major out dim
        if "classifier" in path:
            if path.endswith("fc1/v"):
                return P(None, MODEL_AXIS)
            if path.endswith("fc1/b"):
                return P(MODEL_AXIS)
            if path.endswith("fc2/v"):
                return P(MODEL_AXIS, None)
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    specs = []
    for keypath, leaf in flat:
        specs.append(NamedSharding(mesh, spec_for(_path_str(keypath), leaf)))
    return jax.tree.unflatten(treedef, specs)


def _key_str(k) -> str:
    for attr in ("key", "idx", "name"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _path_str(keypath) -> str:
    return "/".join(_key_str(k) for k in keypath)


def train_state_shardings(params: Any, optimizer, mesh: Mesh) -> Dict[str, Any]:
    """Explicit shardings for the full train state. Optimizer-state moment
    leaves (mu/nu mirror the param tree) inherit the param shardings by path;
    counts and other scalars are replicated. Making these explicit on both
    in_shardings and out_shardings keeps the donated train step's jit cache
    key stable (one compilation per run)."""
    rep = replicated(mesh)
    pshard = param_shardings(params, mesh)
    flat_p = {
        _path_str(kp): s
        for kp, s in jax.tree_util.tree_flatten_with_path(pshard)[0]
    }

    abstract_opt = jax.eval_shape(optimizer.init, params)

    def opt_leaf(keypath, leaf):
        parts = [_key_str(k) for k in keypath]
        for marker in ("mu", "nu"):
            if marker in parts:
                sub = "/".join(parts[parts.index(marker) + 1 :])
                if sub in flat_p:
                    return flat_p[sub]
        return rep

    opt_sh = jax.tree_util.tree_map_with_path(opt_leaf, abstract_opt)
    return {"params": pshard, "opt_state": opt_sh, "step": rep}
