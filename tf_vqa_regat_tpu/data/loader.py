"""Static-shape batch packing + host->device prefetch.

TPU-first replacement for the reference's per-step python collation
(dataset.py:288-355, SURVEY §3.1 hot loop (a)):

  - every batch has the same static shape: [batch, R] rois (R = 36 or 100)
    with a per-example `num_boxes` validity count, instead of padding to the
    per-batch max;
  - the final partial batch is padded to full size with a `valid` example
    mask, so eval never triggers a recompile;
  - epoch shuffling is a seeded numpy permutation (deterministic per
    (seed, epoch), replacing np.random.shuffle at dataset.py:357-361);
  - a background thread assembles the next batches and `jax.device_put`s them
    against the target sharding while the TPU computes (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import numpy as np

from tf_vqa_regat_tpu.data.features import VQADataset


class BatchLoader:
    def __init__(
        self,
        dataset: VQADataset,
        batch_size: int,
        num_rois: int,
        shuffle: bool,
        seed: int = 42,
        include_adj: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_rois = num_rois
        self.shuffle = shuffle
        self.seed = seed
        self.include_adj = include_adj
        n = len(dataset)
        self.steps_per_epoch = (n + batch_size - 1) // batch_size

    def __len__(self) -> int:
        return self.steps_per_epoch

    @property
    def num_examples(self) -> int:
        return len(self.dataset)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState((self.seed * 100003 + epoch_idx) % (2**31))
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield self._pack(idx)

    def _pack(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        ds = self.dataset
        ent = ds.entries
        store = ds.store
        B, R = self.batch_size, self.num_rois
        n_real = len(idx)

        features = np.zeros((B, R, store.v_dim), np.float32)
        norm_bb = np.zeros((B, R, store.s_dim), np.float32)
        bb = np.zeros((B, R, 4), np.float32)
        num_boxes = np.zeros((B,), np.int32)
        target = np.zeros((B, ds.num_ans), np.float32)
        valid = np.zeros((B,), bool)
        # Precomputed edge labels: semantic from the HDF5 semantic_adj_matrix,
        # spatial from image_adj_matrix when present (reference
        # dataset.py:210-224); spatial otherwise falls back to the in-jit
        # builder (models/regat.py).
        adj_source = None
        if self.include_adj:
            if ds.relation_type == "semantic":
                adj_source = store.semantic_adj
            elif ds.relation_type == "spatial":
                adj_source = store.spatial_adj
        adj = np.zeros((B, R, R), np.int32) if adj_source is not None else None

        for row, entry_i in enumerate(idx):
            img = ent.image_index[entry_i]
            f, nb, rb = store.image_slice(img)
            nbox = min(len(f), R)
            features[row, :nbox] = f[:nbox]
            norm_bb[row, :nbox] = nb[:nbox]
            bb[row, :nbox] = rb[:nbox]
            num_boxes[row] = nbox
            s, e = ent.label_offsets[entry_i], ent.label_offsets[entry_i + 1]
            target[row, ent.labels[s:e]] = ent.scores[s:e]
            valid[row] = True
            if adj is not None:
                a = adj_source[img]
                k = min(a.shape[0], R)
                adj[row, :k, :k] = a[:k, :k]

        question = np.zeros((B, ent.q_tokens.shape[1]), np.int32)
        question[:n_real] = ent.q_tokens[idx]
        question[n_real:] = ds.padding_idx

        batch = {
            "features": features,
            "norm_bb": norm_bb,
            "question": question,
            "bb": bb,
            "target": target,
            "num_boxes": num_boxes,
            "valid": valid,
        }
        if adj is not None:
            batch["adj_label"] = adj
        return batch


def prefetch_to_device(
    host_iter: Iterator[Dict[str, np.ndarray]],
    sharding=None,
    depth: int = 2,
) -> Iterator[Dict[str, jax.Array]]:
    """Background-thread host->HBM double buffering. `sharding` is the target
    jax.sharding.Sharding for every array in the batch (batch dim sharded for
    DP); None puts on the default device."""
    if depth <= 0:
        for b in host_iter:
            yield _put(b, sharding)
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for b in host_iter:
                q.put(_put(b, sharding))
        except Exception as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def _put(batch: Dict[str, np.ndarray], sharding) -> Dict[str, jax.Array]:
    # Multi-process aware: each process transfers only the slices its local
    # devices hold (parallel/distributed.py::put_global).
    from tf_vqa_regat_tpu.parallel.distributed import put_global_tree

    return put_global_tree(batch, sharding)
