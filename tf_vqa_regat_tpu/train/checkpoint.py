"""Orbax checkpointing: full TrainState (params + Adamax state + step) plus
metadata (epoch, best eval score, PRNG seed) saved every epoch, with
resume-from-latest and best-model tracking.

The reference saved weights-only once after the final epoch and supported no
resume (main.py:145,155; SURVEY §2.4-T7 / §5 failure-recovery row). The
`--checkpoint` eval flag loads either a full state dir or a params-only dir.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(output: str) -> str:
    return os.path.abspath(os.path.join(output, "checkpoints"))


def save_checkpoint(
    output: str,
    state: Dict[str, Any],
    epoch: int,
    best_score: float,
    is_best: bool,
) -> None:
    root = _ckpt_dir(output)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"epoch_{epoch:04d}")
    ckptr = ocp.StandardCheckpointer()
    host_state = jax.device_get(state)
    ckptr.save(path, host_state, force=True)
    ckptr.wait_until_finished()
    meta = {"epoch": epoch, "best_score": best_score}
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    if is_best:
        best = os.path.join(root, "best")
        ckptr2 = ocp.StandardCheckpointer()
        ckptr2.save(best, host_state, force=True)
        ckptr2.wait_until_finished()


def latest_checkpoint(output: str) -> Optional[str]:
    root = _ckpt_dir(output)
    if not os.path.isdir(root):
        return None
    epochs = [
        d for d in os.listdir(root)
        if d.startswith("epoch_") and os.path.isdir(os.path.join(root, d))
    ]
    if not epochs:
        return None
    return os.path.join(root, sorted(epochs)[-1])


def restore_checkpoint(
    path: str, abstract_state: Dict[str, Any]
) -> Dict[str, Any]:
    """Restore against an abstract (shape/dtype/sharding) target state."""
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        abstract_state,
    )
    return ckptr.restore(path, target)


def restore_meta(output: str) -> Tuple[int, float]:
    root = _ckpt_dir(output)
    meta_path = os.path.join(root, "meta.json")
    if not os.path.exists(meta_path):
        return -1, -1.0
    with open(meta_path) as fh:
        meta = json.load(fh)
    return int(meta["epoch"]), float(meta["best_score"])


def save_params_only(output: str, relation_type: str, fusion: str, params: Any) -> str:
    """The reference's final artifact
    ('{output}{relation_type}-{fusion}-pretrained_model.h5', main.py:145) —
    same naming contract, orbax format."""
    path = os.path.abspath(
        os.path.join(output, f"{relation_type}-{fusion}-pretrained_model")
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(params), force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, abstract_params: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), abstract_params
    )
    restored = ckptr.restore(os.path.abspath(path), target)
    return restored
