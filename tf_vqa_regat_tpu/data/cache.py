"""Packed-feature cache protocol (--packed_cache) — the single definition
site shared by the replicated (device_store.py) and sharded
(sharded_store.py) stores.

Protocol: the converted feature table (+ int8 dequant scales) persists as
.npy; a meta sidecar carrying the cache signature is written LAST and
atomically (tmp + os.replace), so readers only ever trust complete caches
and concurrent first runs race benignly. bf16 is stored as a uint16 view
(np.save drops the ml_dtypes bfloat16 descr). Reads memory-map.

This used to exist as two hand-rolled copies with identical semantics
(round-3 review finding): a crash-safety fix to one could silently miss the
other. Any change to the commit ordering or the read guard now applies to
both stores at once.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np


def load_packed_cache(
    meta_p: str,
    feat_p: str,
    scale_p: str,
    sig: dict,
    feature_dtype: str,
    expect_shape: Optional[Tuple[int, ...]] = None,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """(features, scales) memory-mapped from a COMPLETE cache whose meta
    matches `sig`, else (None, None). `expect_shape` additionally pins the
    packed layout (the sharded cache's [dp, max_rows, v] depends on dp)."""
    from ml_dtypes import bfloat16 as _bf16

    try:
        with open(meta_p) as fh:
            if json.load(fh) != sig:
                return None, None
        feat = np.load(feat_p, mmap_mode="r")
        if feature_dtype == "bfloat16":
            feat = feat.view(_bf16)
        if expect_shape is not None and feat.shape != tuple(expect_shape):
            return None, None
        scale = (
            np.load(scale_p, mmap_mode="r") if feature_dtype == "int8" else None
        )
        return feat, scale
    except (OSError, ValueError):
        return None, None


def save_packed_cache(
    meta_p: str,
    feat_p: str,
    scale_p: str,
    sig: dict,
    feats: np.ndarray,
    scale: Optional[np.ndarray],
    feature_dtype: str,
) -> None:
    """Write the arrays, then the meta sidecar last — each atomically."""
    os.makedirs(os.path.dirname(meta_p) or ".", exist_ok=True)

    def _atomic_save(path, arr):
        tmp = f"{path}.{os.getpid()}.tmp"
        with open(tmp, "wb") as fh:
            np.save(fh, arr)
        os.replace(tmp, path)

    _atomic_save(
        feat_p, feats.view(np.uint16) if feature_dtype == "bfloat16" else feats
    )
    if scale is not None:
        _atomic_save(scale_p, scale)
    tmp = f"{meta_p}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        json.dump(sig, fh)
    os.replace(tmp, meta_p)  # meta last: readers only trust complete caches
