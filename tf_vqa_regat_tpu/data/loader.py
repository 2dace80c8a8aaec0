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
from ml_dtypes import bfloat16 as jnp_bfloat16  # numpy-compatible bf16 scalar

from tf_vqa_regat_tpu.data.features import VQADataset
from tf_vqa_regat_tpu.data.ordering import epoch_perm_rng


class BatchLoader:
    def __init__(
        self,
        dataset: VQADataset,
        batch_size: int,
        num_rois: int,
        shuffle: bool,
        seed: int = 42,
        include_adj: bool = False,
        feature_dtype: str = "float32",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_rois = num_rois
        self.shuffle = shuffle
        self.seed = seed
        self.include_adj = include_adj
        # Wire format of the (dominant) feature tensor: "bfloat16" halves
        # host->device bytes (~200 MB/batch at flagship shapes -> ~100 MB);
        # box tables stay float32 (they feed the discrete spatial-graph
        # classifier — see device_store.DeviceStore docstring). "int8" is a
        # device-store concept (per-row quantized resident tables); its host
        # wire equivalent is the bf16 reduced format.
        from tf_vqa_regat_tpu.data.entries import assert_unique_labels

        # same guard as the device stores' pack_soft_targets: duplicate
        # labels would make this packer's assign-scatter diverge from the
        # device gather's add-scatter
        assert_unique_labels(dataset.entries, dataset.num_ans)
        if feature_dtype == "int8":
            feature_dtype = "bfloat16"
        elif feature_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"unknown feature_dtype {feature_dtype!r} "
                "(float32 | bfloat16 | int8)"
            )
        self.feature_dtype = feature_dtype
        n = len(dataset)
        self.steps_per_epoch = (n + batch_size - 1) // batch_size
        self._rows: Optional[np.ndarray] = None  # [num_img, R] gather table
        self._nbox: Optional[np.ndarray] = None  # [num_img] boxes per image

    def __len__(self) -> int:
        return self.steps_per_epoch

    @property
    def num_examples(self) -> int:
        return len(self.dataset)

    def epoch(self, epoch_idx: int = 0, skip: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Batches of one epoch; `skip` drops the first N batches WITHOUT
        packing them (mid-epoch resume: the order is a seeded permutation, so
        the remaining batches are identical to the uninterrupted epoch's)."""
        n = len(self.dataset)
        if self.shuffle:
            rng = epoch_perm_rng(self.seed, epoch_idx)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        for start in range(skip * self.batch_size, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield self._pack(idx)

    def _ensure_gather_table(self) -> None:
        """Precompute the per-image [num_img, R] flat-row gather table once.

        Replaces the per-entry python slice loop (the reference's collation
        pattern, dataset.py:288-355): packing a flagship batch entry-by-entry
        measured 1.98 s/batch (130 q/s) — slower than the train step it feeds.
        One fancy-index gather over this table packs the same batch in tens of
        milliseconds (PERF_NOTES.md, host-path study)."""
        if self._nbox is not None:
            return
        store, R = self.dataset.store, self.num_rois
        r = np.arange(R, dtype=np.int64)[None, :]
        if store.adaptive:
            pos = store.pos_boxes
            counts = (pos[:, 1] - pos[:, 0]).astype(np.int32)
            self._nbox = np.minimum(counts, R)
            if getattr(store, "features_lazy", False):
                # mmap mode packs via per-image contiguous slices (_pack's
                # lazy branch) and never reads the gather table — at real
                # scale it is ~100 MB of int64 held for the loader's
                # lifetime, in exactly the bounded-RAM mode (review finding)
                self._rows = None
            else:
                rows = pos[:, :1].astype(np.int64) + r  # [num_img, R]
                # pad slots are -1: the native gather zeroes them directly,
                # the numpy fallback clips + masks — both match gather_batch
                self._rows = np.where(r < self._nbox[:, None], rows, -1)
        else:
            k = min(store.features.shape[1], R)
            self._nbox = np.full(store.features.shape[0], k, np.int32)
            self._rows = None  # fixed layout: direct [img, :k] slicing

    def _pack(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        ds = self.dataset
        ent = ds.entries
        store = ds.store
        B, R = self.batch_size, self.num_rois
        n_real = len(idx)
        self._ensure_gather_table()

        imgs = ent.image_index[idx]  # [n_real]
        nbox = self._nbox[imgs]
        roi_pad = np.arange(R, dtype=np.int32)[None, :] >= nbox[:, None]

        features = np.zeros((B, R, store.v_dim), np.float32)
        norm_bb = np.zeros((B, R, store.s_dim), np.float32)
        bb = np.zeros((B, R, 4), np.float32)
        if getattr(store, "features_lazy", False):
            # mmap (h5py-backed) features: fancy indexing is unsupported on
            # h5py datasets — read per-image contiguous slices instead (the
            # disk-backed streaming pattern; bounded RAM, disk-speed).
            for row, img in enumerate(imgs):
                f, nb_, rb = store.image_slice(int(img))
                k = int(nbox[row])
                features[row, :k] = f[:k]
                norm_bb[row, :k] = nb_[:k]
                bb[row, :k] = rb[:k]
        elif store.adaptive:
            from tf_vqa_regat_tpu import native

            rows = self._rows[imgs].reshape(-1)  # [n_real * R], -1 = pad

            def take(tab, out):
                dst = out[:n_real].reshape(n_real * R, tab.shape[-1])
                # Threaded C++ memcpy gather (native/pack.cc) — the numpy
                # fancy-index path is GIL-bound single-threaded; fall back
                # to it when no compiler/lib is available.
                if not native.gather_rows(tab, rows, dst):
                    g = tab[np.clip(rows, 0, None)].reshape(
                        n_real, R, tab.shape[-1]
                    )
                    g[roi_pad] = 0.0  # zero padded rois (gather_batch parity)
                    out[:n_real] = g

            take(store.features, features)
            take(store.normalized_bb, norm_bb)
            take(store.bb, bb)
        else:
            k = min(store.features.shape[1], R)
            features[:n_real, :k] = store.features[imgs, :k]
            norm_bb[:n_real, :k] = store.normalized_bb[imgs, :k]
            bb[:n_real, :k] = store.bb[imgs, :k]

        num_boxes = np.zeros((B,), np.int32)
        num_boxes[:n_real] = nbox
        valid = np.zeros((B,), bool)
        valid[:n_real] = True

        # Soft targets: ragged (entry -> labels/scores) scatter, vectorized
        # with the repeat/cumsum trick over the offset table.
        target = np.zeros((B, ds.num_ans), np.float32)
        starts = ent.label_offsets[idx]
        lens = (ent.label_offsets[idx + 1] - starts).astype(np.int64)
        total = int(lens.sum())
        if total:
            row_ids = np.repeat(np.arange(n_real), lens)
            flat = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            flat = flat + np.repeat(starts, lens)
            target[row_ids, ent.labels[flat]] = ent.scores[flat]

        question = np.zeros((B, ent.q_tokens.shape[1]), np.int32)
        question[:n_real] = ent.q_tokens[idx]
        question[n_real:] = ds.padding_idx

        if self.feature_dtype == "bfloat16":
            features = features.astype(jnp_bfloat16)

        batch = {
            "features": features,
            "norm_bb": norm_bb,
            "question": question,
            "bb": bb,
            "target": target,
            "num_boxes": num_boxes,
            "valid": valid,
        }

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
        if adj_source is not None:
            adj = np.zeros((B, R, R), np.int32)
            k = min(adj_source.shape[1], R)
            adj[:n_real, :k, :k] = adj_source[imgs][:, :k, :k]
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
    stop = threading.Event()

    def _blocking_put(item) -> bool:
        """q.put that also watches `stop`: if the consumer abandoned the
        generator mid-epoch (exception in the train step caught by an outer
        retry loop / notebook), the producer must not block forever on a
        full queue pinning ~depth packed device batches for the life of the
        process (round-3 review finding)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for b in host_iter:
                if not _blocking_put(_put(b, sharding)):
                    return  # consumer gone; drop buffers and exit
        except Exception as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            _blocking_put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # runs on exhaustion AND on generator.close() (GeneratorExit when
        # the consumer drops the iterator): unblock and end the producer
        stop.set()


def _put(batch: Dict[str, np.ndarray], sharding) -> Dict[str, jax.Array]:
    # Multi-process aware: each process transfers only the slices its local
    # devices hold (parallel/distributed.py::put_global).
    from tf_vqa_regat_tpu.parallel.distributed import put_global_tree

    return put_global_tree(batch, sharding)
