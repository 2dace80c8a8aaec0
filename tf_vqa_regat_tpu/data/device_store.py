"""Device-resident dataset: feature tables live in HBM, batches are gathered
on-device by index.

The host-streaming loader moves ~210 MB per batch-256 (features + boxes); at
measured host->HBM bandwidth that caps throughput around 400 q/s while the
train step itself runs at >5,000 q/s. With the tables resident, the per-step
transfer is a [batch] int32 index vector (~1 KB) and the gather runs at HBM
bandwidth inside the jitted step.

Capacity: the gather is only available when the split's tables fit in device
memory — synthetic benches and the fixed-36 val split do on one v5e chip
(fp32; bf16 halves it). `estimate_nbytes` vs cfg.device_store_budget_gb
decides (train/loop.py::_DataPath auto mode), falling back to host streaming;
splits too large to replicate (the ~40 GB fp32 adaptive train set) use the
data-axis-sharded tables in data/sharded_store.py instead.

Soft targets are stored ragged-padded ([N, K<=MAX_LABELS] labels/scores,
label -1 = empty) and scattered to the dense [batch, num_ans] matrix
on-device.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu.data.features import VQADataset
from tf_vqa_regat_tpu.data.ordering import batch_shuffle_rng, epoch_perm_rng

MAX_LABELS = 16  # VQA soft targets have <=10 answers; headroom for safety

# image-level (entry-independent) device tables, shareable across splits
# built on one FeatureStore (see DeviceStore.__init__'s memo)
_IMAGE_KEYS = ("features", "feat_scale", "norm_bb", "bb", "img_start", "img_len", "adj")


class _ImageTableHolder:
    """Weakref-able handle bundling one upload of the image-level device
    tables; every DeviceStore sharing them holds a strong reference."""

    __slots__ = ("arrays", "__weakref__")

    def __init__(self, arrays):
        self.arrays = arrays


CHUNK_ROWS = 262144  # rows per conversion chunk (~2 GB f32 at 2048-d)


def quantize_rows(chunk: np.ndarray):
    """Symmetric per-row int8 quantization: (q int8, scale f32[rows]) with
    scale = rowmax/127 — shared by the replicated (chunked) and sharded
    (per-image) table builders."""
    s = np.maximum(np.abs(chunk).max(axis=-1), 1e-12) / 127.0
    q = np.clip(np.round(chunk / s[..., None]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def _materialize_features(src, feature_dtype: str):
    """Flat [T, v] feature table at the target dtype, built CHUNK-BY-CHUNK so
    an h5py-backed (mmap) source never fully materializes in f32: host peak
    RAM is the converted table + one chunk. Returns (features, scale-or-None)
    — int8 produces the per-row dequantization scale (see DeviceStore)."""
    shape = src.shape
    if len(shape) == 3:  # fixed-36 layout [n_img, 36, v] -> flat rows
        T, v = shape[0] * shape[1], shape[2]
    else:
        T, v = shape
    if feature_dtype == "bfloat16":
        import jax.numpy as _jnp

        out = np.empty((T, v), _jnp.bfloat16)
    elif feature_dtype == "int8":
        out = np.empty((T, v), np.int8)
        scale = np.empty((T,), np.float32)
    elif feature_dtype == "float32":
        if isinstance(src, np.ndarray):
            return src.reshape(T, v), None  # zero-copy for the plain case
        out = np.empty((T, v), np.float32)
    else:
        raise ValueError(f"unknown feature_dtype {feature_dtype!r}")
    step = max(CHUNK_ROWS // (shape[1] if len(shape) == 3 else 1), 1)
    for lo in range(0, shape[0], step):
        chunk = np.asarray(src[lo : lo + step], np.float32).reshape(-1, v)
        a = lo * (shape[1] if len(shape) == 3 else 1)
        b = a + chunk.shape[0]
        if feature_dtype == "int8":
            out[a:b], scale[a:b] = quantize_rows(chunk)
        else:
            out[a:b] = chunk.astype(out.dtype)
    return out, (scale if feature_dtype == "int8" else None)


def _source_fingerprint(src) -> str:
    """Cheap content identity for the packed-cache signature: sha1 over the
    shape and ~64 strided row samples, read as contiguous slices (h5py-safe,
    no full-table read). Shape alone would serve STALE features when the
    source is re-extracted or swapped for a same-shape file."""
    import hashlib

    h = hashlib.sha1()
    h.update(repr(tuple(src.shape)).encode())
    n = src.shape[0]
    step = max(n // 64, 1)
    for lo in range(0, n, step):
        h.update(np.asarray(src[lo : lo + 1], np.float32).tobytes())
    return h.hexdigest()


def _cached_features(store, feature_dtype: str, cache_dir: str):
    """Packed-feature cache (--packed_cache): the converted flat [T, v] table
    (+ int8 scales) persisted as .npy so repeat runs memory-map it instead of
    re-reading and re-converting the HDF5 source — at the real ~58 GB
    adaptive scale a cache hit turns minutes of startup (full HDF5 read +
    chunked dtype conversion, _materialize_features) into an mmap open, and
    with --mmap_features the HDF5 read shrinks to the ~64 sampled rows of
    the staleness fingerprint.

    Keyed by CONTENT (source fingerprint + layout + dtype), not split name:
    the VQA-CP train/test splits share one merged feature table, and a
    name key would convert and persist the identical multi-GB table twice
    (review finding). The meta sidecar still pins the full signature so a
    same-prefix collision (vanishingly unlikely) rebuilds rather than
    serving wrong data. Write/read protocol (atomic, meta-last,
    bf16-as-uint16): data/cache.py, shared with the sharded store."""
    import os

    from tf_vqa_regat_tpu.data.cache import load_packed_cache, save_packed_cache

    sha = _source_fingerprint(store.features)
    key = f"feat-{sha[:16]}-{'adaptive' if store.adaptive else 'fixed'}-{feature_dtype}"
    meta_p = os.path.join(cache_dir, key + ".meta.json")
    feat_p = os.path.join(cache_dir, key + ".features.npy")
    scale_p = os.path.join(cache_dir, key + ".scale.npy")
    sig = {
        "src_shape": [int(x) for x in store.features.shape],
        "src_sha1": sha,
        "feature_dtype": feature_dtype,
        "version": 2,
    }
    feat, scale = load_packed_cache(meta_p, feat_p, scale_p, sig, feature_dtype)
    if feat is not None:
        return feat, scale

    feat, scale = _materialize_features(store.features, feature_dtype)
    save_packed_cache(meta_p, feat_p, scale_p, sig, feat, scale, feature_dtype)
    return feat, scale


def pack_soft_targets(ent, num_ans: int):
    """Ragged soft targets -> padded [N, MAX_LABELS] label/score tables
    (label -1 = empty), via the vectorized repeat/cumsum scatter (the same
    trick as the host loader's dense scatter — no per-entry Python loop at
    the 440k-entry real scale). Loud, not lossy (round-2 verdict weak #4 +
    round-3 review):

      - an entry with more than MAX_LABELS answers raises (silent
        truncation would drop score mass only on the device path);
      - an entry with DUPLICATE answer labels raises: the device gather
        scatters with add while the host packer assigns last-wins, so
        duplicates would make loss/score depend on the resolved data mode.
        Reference target pickles are duplicate-free by construction
        (compute_softscore); anything else is corrupt input.
    """
    N = len(ent)
    labels = np.full((N, MAX_LABELS), -1, np.int32)
    scores = np.zeros((N, MAX_LABELS), np.float32)
    if N == 0 or len(ent.labels) == 0:
        return labels, scores
    counts = np.diff(ent.label_offsets).astype(np.int64)
    max_k = int(counts.max())
    if max_k > MAX_LABELS:
        raise ValueError(
            f"an entry has {max_k} answer labels > MAX_LABELS={MAX_LABELS}; "
            f"raise device_store.MAX_LABELS — truncating would silently "
            f"drop soft-target score mass"
        )
    from tf_vqa_regat_tpu.data.entries import assert_unique_labels

    assert_unique_labels(ent, num_ans)
    rows = np.repeat(np.arange(N, dtype=np.int64), counts)
    cols = np.arange(len(ent.labels), dtype=np.int64) - np.repeat(
        ent.label_offsets[:-1].astype(np.int64), counts
    )
    labels[rows, cols] = ent.labels
    scores[rows, cols] = ent.scores
    return labels, scores


def build_image_arrays(
    dataset: VQADataset, include_adj: bool = False,
    feature_dtype: str = "float32", cache_dir: str = "",
) -> Dict[str, np.ndarray]:
    """The image-level (entry-independent) tables: features (materialized at
    `feature_dtype`, chunked — mmap-safe, or mapped from the packed cache
    when `cache_dir` is set), boxes, image offsets, adjacency. For datasets
    sharing one FeatureStore (VQA-CP train/test over the merged COCO table)
    these are split-independent — see DeviceStore's device-array memo."""
    store = dataset.store
    if cache_dir:
        feat, feat_scale = _cached_features(store, feature_dtype, cache_dir)
    else:
        feat, feat_scale = _materialize_features(store.features, feature_dtype)
    if store.adaptive:
        norm_bb = store.normalized_bb
        bb = store.bb
        img_start = store.pos_boxes[:, 0].astype(np.int32)
        img_len = (store.pos_boxes[:, 1] - store.pos_boxes[:, 0]).astype(np.int32)
    else:
        n_img, n_box, v = store.features.shape
        norm_bb = store.normalized_bb.reshape(n_img * n_box, -1)
        bb = store.bb.reshape(n_img * n_box, -1)
        img_start = (np.arange(n_img, dtype=np.int32)) * n_box
        img_len = np.full((n_img,), n_box, np.int32)
    arrays = {
        "features": feat,
        "norm_bb": norm_bb,
        "bb": bb,
        "img_start": img_start,
        "img_len": img_len,
    }
    if include_adj:
        adj = (
            store.semantic_adj
            if dataset.relation_type == "semantic"
            else store.spatial_adj
        )
        if adj is not None:
            arrays["adj"] = adj.astype(np.int8)
    if feat_scale is not None:
        arrays["feat_scale"] = feat_scale
    return arrays


def build_entry_arrays(dataset: VQADataset) -> Dict[str, np.ndarray]:
    """The per-entry tables (differ per split even over a shared store)."""
    ent = dataset.entries
    labels, scores = pack_soft_targets(ent, dataset.num_ans)
    return {
        "entry_img": ent.image_index.astype(np.int32),
        "questions": ent.q_tokens.astype(np.int32),
        "labels": labels,
        "scores": scores,
    }


def build_arrays(
    dataset: VQADataset, include_adj: bool = False,
    feature_dtype: str = "float32", cache_dir: str = "",
) -> Dict[str, np.ndarray]:
    """Host-side column tables ready for one device_put."""
    arrays = build_image_arrays(dataset, include_adj, feature_dtype, cache_dir)
    arrays.update(build_entry_arrays(dataset))
    return arrays


def nbytes(arrays: Dict[str, np.ndarray]) -> int:
    return sum(int(a.nbytes) for a in arrays.values())


def estimate_nbytes(
    dataset: VQADataset, include_adj: bool = False, feature_dtype: str = "float32"
) -> int:
    """Device-table footprint WITHOUT building the tables (the budget check
    runs before construction), accounting for feature_dtype."""
    store = dataset.store
    n_entries = len(dataset.entries)
    # reduced dtypes apply to the features table only (boxes stay f32; see
    # DeviceStore). int8 adds a f32 per-row scale vector.
    float_scale = {"bfloat16": 0.5, "int8": 0.25}.get(feature_dtype, 1.0)
    total = int(store.features.nbytes * float_scale) + int(
        store.normalized_bb.nbytes + store.bb.nbytes
    )
    if feature_dtype == "int8":
        # per-row f32 scale vector (h5py datasets lack .itemsize — use dtype)
        n_rows = int(np.prod(store.features.shape[:-1]))
        total += 4 * n_rows
    n_img = (
        store.pos_boxes.shape[0] if store.adaptive else store.features.shape[0]
    )
    total += 2 * 4 * n_img  # img_start/img_len
    total += 4 * n_entries  # entry_img
    total += 4 * n_entries * dataset.entries.q_tokens.shape[1]  # questions
    total += (4 + 4) * n_entries * MAX_LABELS  # labels + scores
    if include_adj:
        adj = (
            store.semantic_adj
            if dataset.relation_type == "semantic"
            else store.spatial_adj
        )
        if adj is not None:
            total += int(adj.size)  # stored as int8: 1 byte per element
    return total


class DeviceStore:
    """Tables placed on device (replicated across the mesh).

    feature_dtype="bfloat16" halves the resident footprint and gather traffic
    of the `features` table (the dominant one: 2048-d vs 6-d/4-d boxes); the
    gather casts back to float32. The box tables (bb/norm_bb) stay float32:
    they feed the *discrete* spatial-graph classifier (strict-inequality
    containment, IoU>=0.5, angular sector thresholds — ops/spatial_graph.py),
    where rounding could flip edge labels near thresholds, and they are tiny
    so there is nothing to save. Region features only feed continuous matmuls
    (~3 significant digits of signal), so their rounding is benign."""

    def __init__(
        self,
        dataset: VQADataset,
        sharding=None,
        include_adj: bool = False,
        feature_dtype: str = "float32",
        cache_dir: str = "",
    ):
        # feature table materialized at feature_dtype, chunk-by-chunk
        # (mmap-safe). int8 = symmetric per-row quantization (scale =
        # rowmax/127, dequantized in gather_batch): 4x smaller than f32 —
        # the single-chip enabler for the full ~58 GB adaptive train table
        # (f32 and bf16 both exceed one v5e's 16 GB HBM; int8+scales is
        # ~14.7 GB). Training dynamics under int8 validated in PERF_NOTES.md.
        from tf_vqa_regat_tpu.parallel.distributed import put_global_tree

        # Datasets sharing ONE FeatureStore (VQA-CP train/test over the
        # merged COCO table) would otherwise convert AND upload the identical
        # image-level tables once per split — 2x startup and, decisively, 2x
        # HBM (review finding). The memo lives on the source store, weakly:
        # alive exactly while some DeviceStore still holds the tables, so a
        # dropped store frees its HBM. (resolve_data_mode's budget estimate
        # stays per-split — conservative for the shared-store case.)
        import weakref

        key = (
            feature_dtype,
            include_adj and dataset.relation_type,
            sharding,
        )
        memo = getattr(dataset.store, "_device_img_memo", None)
        holder = memo.get(key) and memo[key]() if memo else None
        if holder is not None:
            self.arrays = put_global_tree(build_entry_arrays(dataset), sharding)
            self.arrays.update(holder.arrays)
        else:
            host = build_arrays(dataset, include_adj, feature_dtype, cache_dir)
            # Multi-process aware placement (each process feeds its local
            # devices).
            self.arrays = put_global_tree(host, sharding)
            holder = _ImageTableHolder(
                {k: v for k, v in self.arrays.items() if k in _IMAGE_KEYS}
            )
            if memo is None:
                memo = {}
                dataset.store._device_img_memo = memo
            memo[key] = weakref.ref(holder)
        self._img_holder = holder  # keeps the shared tables (and memo) alive

        self.num_entries = len(dataset.entries)
        self.num_ans = dataset.num_ans
        self.padding_idx = dataset.padding_idx
        self.has_adj = "adj" in self.arrays
        # per-entry box counts, for roi bucketing (host-side sampler)
        store = dataset.store
        if store.adaptive:
            img_len = (store.pos_boxes[:, 1] - store.pos_boxes[:, 0]).astype(np.int32)
        else:
            img_len = np.full(store.features.shape[0], store.features.shape[1], np.int32)
        self.entry_nbox = img_len[dataset.entries.image_index].astype(np.int32)

    def epoch_indices(self, epoch: int, batch_size: int, shuffle: bool, seed: int) -> Iterator[np.ndarray]:
        """Host-side index batches, padded to batch_size with -1 (invalid)."""
        n = self.num_entries
        if shuffle:
            rng = epoch_perm_rng(seed, epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size].astype(np.int32)
            if len(idx) < batch_size:
                idx = np.concatenate(
                    [idx, np.full(batch_size - len(idx), -1, np.int32)]
                )
            yield idx

    def epoch_indices_bucketed(
        self,
        epoch: int,
        batch_size: int,
        buckets: "list[int]",
        shuffle: bool,
        seed: int,
    ) -> "Iterator[tuple[int, np.ndarray]]":
        """Roi-bucketed batches: each yielded (R, idx) batch contains only
        entries whose image has <= R boxes, routed to the compiled program for
        that static R (SURVEY §7 padding economics: always-padding the
        adaptive split to 100 rois costs ~40% throughput vs 64; measured
        R=100/64/36 -> 8.5k/12.0k/16.6k train q/s on v5e).

        Batches are homogeneous per bucket; bucket order is shuffled with the
        entries, so the training stream interleaves sizes. Every entry appears
        exactly once per epoch. Images with more boxes than the largest
        bucket truncate to it — the same clamp a plain --num_rois applies
        (callers warn; see _DataPath).
        """
        buckets = sorted(buckets)
        bucket_of = self._bucket_of(buckets)
        rng = batch_shuffle_rng(seed, epoch)
        jobs = []  # (R, idx-batch)
        for bi, R in enumerate(buckets):
            ids = np.where(bucket_of == bi)[0].astype(np.int32)
            if len(ids) == 0:
                continue
            if shuffle:
                ids = ids[rng.permutation(len(ids))]
            for start in range(0, len(ids), batch_size):
                idx = ids[start : start + batch_size]
                if len(idx) < batch_size:
                    idx = np.concatenate(
                        [idx, np.full(batch_size - len(idx), -1, np.int32)]
                    )
                jobs.append((R, idx))
        if shuffle:
            order = rng.permutation(len(jobs))
            jobs = [jobs[i] for i in order]
        yield from jobs

    def _bucket_of(self, buckets: "list[int]") -> np.ndarray:
        """Bucket index per entry; oversized images clamp to the last bucket."""
        return np.minimum(
            np.searchsorted(np.asarray(buckets), self.entry_nbox), len(buckets) - 1
        )

    def bucketed_batch_counts(self, batch_size: int, buckets: "list[int]") -> "list[int]":
        """Per bucket: number of (R, idx) batches an epoch yields."""
        bucket_of = self._bucket_of(sorted(buckets))
        return [
            -(-int((bucket_of == bi).sum()) // batch_size)
            for bi in range(len(buckets))
        ]

    def bucketed_steps_per_epoch(self, batch_size: int, buckets: "list[int]") -> int:
        return int(sum(self.bucketed_batch_counts(batch_size, buckets)))


def gather_batch(
    arrays: Dict[str, jax.Array],
    idx: jax.Array,  # [B] int32, -1 = padded example
    num_rois: int,
    num_ans: int,
    padding_idx: int,
) -> Dict[str, jax.Array]:
    """On-device batch assembly: pure gathers/scatters, fused into the step."""
    B = idx.shape[0]
    valid = idx >= 0
    safe_idx = jnp.where(valid, idx, 0)

    img = arrays["entry_img"][safe_idx]  # [B]
    # invalid (padded) examples get zero boxes so all their rois mask to zero
    n_box = jnp.where(
        valid, jnp.minimum(arrays["img_len"][img], num_rois), 0
    )  # [B]
    features, norm_bb, bb = gather_image_features(arrays, img, n_box, num_rois)

    question = jnp.where(
        valid[:, None],
        arrays["questions"][safe_idx],
        jnp.full((B, arrays["questions"].shape[1]), padding_idx, jnp.int32),
    )

    labels = arrays["labels"][safe_idx]  # [B, K]
    scores = arrays["scores"][safe_idx]
    lab_ok = (labels >= 0) & valid[:, None]
    target = jnp.zeros((B, num_ans), jnp.float32)
    target = target.at[
        jnp.arange(B)[:, None], jnp.where(lab_ok, labels, 0)
    ].add(jnp.where(lab_ok, scores, 0.0))

    batch = {
        "features": features,
        "norm_bb": norm_bb,
        "bb": bb,
        "question": question,
        "target": target,
        "num_boxes": n_box,
        "valid": valid,
    }
    if "adj" in arrays:
        batch["adj_label"] = gather_adj(arrays, img, num_rois, valid)
    return batch


def gather_adj(
    arrays, img: jax.Array, num_rois: int, valid: Optional[jax.Array] = None
) -> jax.Array:
    """[B, num_rois, num_rois] int32 adjacency labels gathered from the
    store's [n_img, A, A] int8 table, clamped/zero-padded to num_rois.
    Shared by gather_batch and serve.serve_step so on-device batch assembly
    cannot drift between training/eval and serving (review finding).

    `valid` masks padded batch rows to ALL-ZERO labels: their safe index is
    0, so without the mask they would carry image 0's real adjacency while
    the host packer ships zeros — a device/host batch-parity break on every
    partial final batch (review finding; downstream attention already
    ignores those rows via key_mask, this pins the store contract itself)."""
    k = min(arrays["adj"].shape[1], num_rois)
    adj = jnp.zeros((img.shape[0], num_rois, num_rois), jnp.int32)
    adj = adj.at[:, :k, :k].set(arrays["adj"][img][:, :k, :k].astype(jnp.int32))
    if valid is not None:
        adj = jnp.where(valid[:, None, None], adj, 0)
    return adj


def gather_image_features(
    arrays: Dict[str, jax.Array],
    img: jax.Array,  # [B] image indices
    n_box: jax.Array,  # [B] valid box count per example (0 = fully padded)
    num_rois: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(features, norm_bb, bb) [B, R, ...] for a batch of image indices —
    the device-side gather shared by gather_batch and the serving engine
    (serve.py: a request ships only token ids + an image index; the region
    features never leave HBM)."""
    start = arrays["img_start"][img]  # [B]
    r = jnp.arange(num_rois, dtype=jnp.int32)
    rows = start[:, None] + r[None, :]  # [B, R]
    roi_ok = r[None, :] < n_box[:, None]
    T = arrays["features"].shape[0]
    rows = jnp.clip(rows, 0, T - 1)
    B = img.shape[0]

    def take(tab):
        out = jnp.take(tab, rows.reshape(-1), axis=0).reshape(B, num_rois, -1)
        out = out.astype(jnp.float32)  # bf16/int8 tables re-widen here
        return jnp.where(roi_ok[..., None], out, jnp.zeros_like(out))

    features = take(arrays["features"])
    if "feat_scale" in arrays:  # int8 tables: dequantize by the per-row scale
        scale = jnp.take(arrays["feat_scale"], rows.reshape(-1), axis=0)
        features = features * scale.reshape(B, num_rois, 1)
    return features, take(arrays["norm_bb"]), take(arrays["bb"])
