"""Data-axis-sharded device store: feature tables partitioned across chips.

The replicated DeviceStore (device_store.py) needs the whole split on every
chip (~40 GB fp32 for the adaptive train split — too big for one v5e). Here
each data-parallel shard owns a *disjoint subset of images*: its slice of the
feature tables lives in its own HBM, and each step it gathers its share of the
batch from purely local rows inside a `shard_map` region — no cross-chip
traffic for data at all. The model step around it stays GSPMD (grads
all-reduce over ICI as usual).

Sampling semantics: entries are assigned to the shard that owns their image;
each epoch every shard draws a seeded permutation of its local entries
(shard-local shuffle — the standard sharded-dataset trade: global coverage per
epoch, shuffling within shards). Ragged tails pad with -1 and mask out, so
every epoch visits every entry exactly once.

Image->shard assignment greedily balances total box counts so per-shard table
sizes (padded to the max shard) stay within ~1/dp of the split.
"""

from __future__ import annotations

from typing import Iterator, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tf_vqa_regat_tpu.data.device_store import MAX_LABELS, gather_batch, quantize_rows
from tf_vqa_regat_tpu.data.features import VQADataset
from tf_vqa_regat_tpu.data.ordering import (
    batch_shuffle_rng,
    shard_bucket_perm_rng,
    shard_perm_rng,
)
from tf_vqa_regat_tpu.parallel.mesh import DATA_AXIS


def _padded_step_batches(per_shard: "List[np.ndarray]", per: int):
    """[dp*per] index batches from per-shard local-id lists: SPMD step count
    = max over shards of ceil(len/per); short segments pad with -1 (invalid,
    masked out by gather_batch)."""
    dp = len(per_shard)
    steps = max((len(ids) + per - 1) // per for ids in per_shard)
    for i in range(steps):
        out = np.full((dp, per), -1, np.int32)
        for s in range(dp):
            chunk = per_shard[s][i * per : (i + 1) * per]
            out[s, : len(chunk)] = chunk
        yield out.reshape(dp * per)


def _assign_images(box_counts: np.ndarray, n_shards: int) -> List[np.ndarray]:
    """Greedy balanced partition of image indices by box count."""
    order = np.argsort(-box_counts, kind="stable")
    loads = np.zeros(n_shards, np.int64)
    buckets: List[List[int]] = [[] for _ in range(n_shards)]
    for img in order:
        s = int(np.argmin(loads))
        buckets[s].append(int(img))
        loads[s] += int(box_counts[img])
    return [np.asarray(sorted(b), np.int64) for b in buckets]


def sharded_layout(dataset: VQADataset, dp: int):
    """(n_img, max_rows, max_entries, max_local_imgs) of the pad-to-max
    sharded layout at `dp` shards — from metadata only (box counts, entry
    counts; no feature reads), using the SAME greedy image assignment the
    constructor builds. NOTE: _assign_images balances BOX counts, so a shard
    owning many small images can hold far more than n_img/dp images —
    anything padded per-image (the ensemble's adjacency tables) must size by
    max_local_imgs, not n_img // dp."""
    store = dataset.store
    ent = dataset.entries
    if store.adaptive:
        img_len = (store.pos_boxes[:, 1] - store.pos_boxes[:, 0]).astype(np.int64)
    else:
        n_img_, n_box, _ = store.features.shape
        img_len = np.full((n_img_,), n_box, np.int64)
    n_img = len(img_len)
    buckets = _assign_images(img_len, dp)
    max_rows = max((int(img_len[b].sum()) for b in buckets), default=1) or 1
    max_local_imgs = max((len(b) for b in buckets), default=1) or 1
    img_shard = np.zeros(n_img, np.int32)
    for s, b in enumerate(buckets):
        img_shard[b] = s
    entry_shard = img_shard[ent.image_index]
    max_entries = (
        max(int((entry_shard == s).sum()) for s in range(dp)) if len(ent) else 1
    ) or 1
    return n_img, max_rows, max_entries, max_local_imgs


def estimate_sharded_nbytes(
    dataset: VQADataset,
    include_adj: bool,
    feature_dtype: str,
    dp: int,
) -> int:
    """PER-SHARD device footprint of a ShardedDeviceStore at `dp` shards
    (layout from sharded_layout — exact vs the built store, tested). This is
    the sharded half of the one sizing policy resolve_data_mode
    (train/loop.py) applies: 'auto' promotes a split too large to replicate
    onto the sharded store whenever this per-shard slice fits the
    per-device budget."""
    store = dataset.store
    ent = dataset.entries
    n_img, max_rows, max_entries, max_local_imgs = sharded_layout(dataset, dp)

    v_dim = store.features.shape[-1]
    s_dim = store.normalized_bb.shape[-1]
    feat_itemsize = {"bfloat16": 2, "int8": 1}.get(feature_dtype, 4)
    per_row = v_dim * feat_itemsize + s_dim * 4 + 4 * 4  # features+norm_bb+bb
    if feature_dtype == "int8":
        per_row += 4  # f32 dequant scale per row
    total = max_rows * per_row
    total += 2 * 4 * n_img  # local_start/local_len ([n_img] int32 per shard)
    q_len = ent.q_tokens.shape[1]
    total += max_entries * (q_len * 4 + MAX_LABELS * (4 + 4) + 4)

    if include_adj:
        # match the constructor flag-for-flag: whichever family's table the
        # constructor would upload under include_adj=True is what gets
        # counted. NOTE the production resolve path (train/loop.py
        # resolve_data_mode) passes include_adj only for SEMANTIC here,
        # because build_store constructs the sharded store with
        # include_adj=(relation_type == 'semantic') — spatial adjacency is
        # built in-jit from boxes and is never resident in sharded mode.
        adj = (
            store.semantic_adj
            if dataset.relation_type == "semantic"
            else store.spatial_adj
        )
        if adj is not None:
            total += max_local_imgs * adj.shape[1] * adj.shape[2]  # int8
    return int(total)


class ShardedDeviceStore:
    def __init__(
        self,
        dataset: VQADataset,
        mesh,
        include_adj: bool = False,
        feature_dtype: str = "float32",
        cache_dir: str = "",
    ):
        self._feature_dtype = feature_dtype
        self.mesh = mesh
        self.dp = mesh.shape[DATA_AXIS]
        ent = dataset.entries
        store = dataset.store
        self.num_ans = dataset.num_ans
        self.padding_idx = dataset.padding_idx
        self.num_entries = len(ent)

        if store.adaptive:
            img_start = store.pos_boxes[:, 0]
            img_len = (store.pos_boxes[:, 1] - store.pos_boxes[:, 0]).astype(np.int64)
        else:
            n_img, n_box, _ = store.features.shape
            img_start = np.arange(n_img, dtype=np.int64) * n_box
            img_len = np.full((n_img,), n_box, np.int64)
        n_img = len(img_len)

        buckets = _assign_images(img_len, self.dp)
        # per-shard feature tables (rows re-packed contiguously per shard)
        shard_rows = [int(img_len[b].sum()) for b in buckets]
        max_rows = max(shard_rows) if shard_rows else 1
        v_dim = store.features.shape[-1]
        s_dim = store.normalized_bb.shape[-1]

        # Box tables + shard metadata always rebuild (cheap: 6-d/4-d rows).
        norms = np.zeros((self.dp, max_rows, s_dim), np.float32)
        bbs = np.zeros((self.dp, max_rows, 4), np.float32)
        local_start = np.zeros((self.dp, n_img), np.int32)  # per shard, by local img
        local_len = np.zeros((self.dp, n_img), np.int32)
        # map global image -> (shard, local image slot)
        img_shard = np.zeros(n_img, np.int32)
        img_local = np.zeros(n_img, np.int32)
        n_local_imgs = np.zeros(self.dp, np.int32)
        for s, bucket in enumerate(buckets):
            off = 0
            for li, img in enumerate(bucket):
                ln = int(img_len[img])
                st = int(img_start[img])
                if store.adaptive:
                    norms[s, off : off + ln] = store.normalized_bb[st : st + ln]
                    bbs[s, off : off + ln] = store.bb[st : st + ln]
                else:
                    norms[s, off : off + ln] = store.normalized_bb[img]
                    bbs[s, off : off + ln] = store.bb[img]
                local_start[s, li] = off
                local_len[s, li] = ln
                img_shard[img] = s
                img_local[img] = li
                off += ln
            n_local_imgs[s] = len(bucket)

        # The feature fill is THE expensive part (full source read + dtype
        # conversion: minutes at the real ~58 GB adaptive scale) — served
        # from the packed cache (--packed_cache, same flag as the replicated
        # store) when the fingerprint matches; sharded mode is where real
        # training lands (resolve_data_mode), so repeat runs must not
        # re-read the HDF5.
        feats = feat_scale = None
        if cache_dir:
            feats, feat_scale = self._load_cached_feats(
                dataset, cache_dir, feature_dtype, img_len, max_rows, v_dim
            )
        if feats is None:
            feats, feat_scale = self._fill_feats(
                store, buckets, img_start, img_len, local_start,
                feature_dtype, max_rows, v_dim,
            )
            if cache_dir:
                self._save_cached_feats(
                    dataset, cache_dir, feature_dtype, img_len, feats,
                    feat_scale,
                )

        # entries per shard, padded to the max shard entry count
        entry_shard = img_shard[ent.image_index]
        shard_entry_ids = [np.where(entry_shard == s)[0] for s in range(self.dp)]
        self.local_entry_counts = np.asarray([len(e) for e in shard_entry_ids])
        max_entries = int(self.local_entry_counts.max()) if self.num_entries else 1

        q_len = ent.q_tokens.shape[1]
        questions = np.full((self.dp, max_entries, q_len), self.padding_idx, np.int32)
        labels = np.full((self.dp, max_entries, MAX_LABELS), -1, np.int32)
        scores = np.zeros((self.dp, max_entries, MAX_LABELS), np.float32)
        entry_img = np.zeros((self.dp, max_entries), np.int32)
        # one shared packer with the MAX_LABELS / duplicate-label guards
        # (device_store.pack_soft_targets), gathered per shard — vectorized,
        # no per-entry Python loop at real scale
        from tf_vqa_regat_tpu.data.device_store import pack_soft_targets

        packed_labels, packed_scores = pack_soft_targets(ent, self.num_ans)
        for s, ids in enumerate(shard_entry_ids):
            k = len(ids)
            questions[s, :k] = ent.q_tokens[ids]
            labels[s, :k] = packed_labels[ids]
            scores[s, :k] = packed_scores[ids]
            entry_img[s, :k] = img_local[ent.image_index[ids]]

        host = {
            "features": feats.reshape(self.dp * max_rows, v_dim),
            "norm_bb": norms.reshape(self.dp * max_rows, s_dim),
            "bb": bbs.reshape(self.dp * max_rows, 4),
            "img_start": local_start.reshape(self.dp * n_img),
            "img_len": local_len.reshape(self.dp * n_img),
            "entry_img": entry_img.reshape(self.dp * max_entries),
            "questions": questions.reshape(self.dp * max_entries, q_len),
            "labels": labels.reshape(self.dp * max_entries, MAX_LABELS),
            "scores": scores.reshape(self.dp * max_entries, MAX_LABELS),
        }
        if feat_scale is not None:
            host["feat_scale"] = feat_scale.reshape(self.dp * max_rows)
        # Image assignment kept for extra adjacency tables (sharded ensemble:
        # members share these feature tables, each bringing its own edge
        # labels partitioned the same way — the assignment depends only on
        # box counts, never on the relation type).
        self._img_buckets = buckets
        self._max_local_imgs = int(n_local_imgs.max()) if n_img else 1
        # Global image id -> (owning shard, local slot) and global box count:
        # the serving path's lookup keys (build_sharded_image_gather) — a
        # request addresses images globally, not by shard-local entry index.
        self.img_shard = img_shard
        self.img_local = img_local
        self.img_len_global = np.asarray(img_len, np.int32)

        # Precomputed edge labels (semantic; spatial builds in-jit from bb):
        # per-shard adjacency ordered by LOCAL image slot — gather_batch
        # indexes arrays["adj"][entry_img], which holds local slots here, so
        # the local-gather path needs no adjacency-specific code.
        self.has_adj = False
        if include_adj:
            adj_src = (
                dataset.store.semantic_adj
                if dataset.relation_type == "semantic"
                else dataset.store.spatial_adj
            )
            if adj_src is not None:
                host["adj"] = self._adj_local_host(adj_src)
                self.has_adj = True
        sh = NamedSharding(mesh, P(DATA_AXIS))
        from tf_vqa_regat_tpu.parallel.distributed import put_global

        # Multi-process aware: each process places only its local shards.
        self.arrays = {k: put_global(v, sh) for k, v in host.items()}
        self.max_entries = max_entries
        # local -> global entry mapping ([dp, max_entries], -1 = pad): batch
        # index vectors hold shard-LOCAL entry indices, so any consumer that
        # needs entry identity (run_prediction's question ids) translates
        # through this table.
        self.local_to_global = np.full((self.dp, max_entries), -1, np.int64)
        for s, ids in enumerate(shard_entry_ids):
            self.local_to_global[s, : len(ids)] = ids
        # per-shard box count of each local entry (roi-bucket assignment)
        self._local_entry_nbox = [
            local_len[s][entry_img[s, : len(ids)]].copy()
            for s, ids in enumerate(shard_entry_ids)
        ]

    # ---- packed-feature cache (sharded layout) -----------------------------
    # Same idea as device_store._cached_features, keyed additionally by dp
    # (the layout depends on the shard count) and by a fingerprint of the
    # per-image box counts (they pin the greedy assignment). bf16 stored as
    # a uint16 view (np.save drops the ml_dtypes descr).

    @staticmethod
    def _cache_paths(dataset, cache_dir, feature_dtype, dp):
        import os

        from tf_vqa_regat_tpu.data.device_store import _source_fingerprint

        # content-keyed, not name-keyed: VQA-CP train/test share one merged
        # table and an identical shard layout (it depends only on per-image
        # box counts) — a name key would persist the identical multi-GB file
        # twice (review finding; same fix as device_store._cached_features)
        sha = _source_fingerprint(dataset.store.features)
        key = (
            f"feat-{sha[:16]}-sharded{dp}-"
            f"{'adaptive' if dataset.store.adaptive else 'fixed'}-"
            f"{feature_dtype}"
        )
        return (
            os.path.join(cache_dir, key + ".meta.json"),
            os.path.join(cache_dir, key + ".features.npy"),
            os.path.join(cache_dir, key + ".scale.npy"),
        )

    def _cache_sig(self, dataset, feature_dtype, img_len):
        import hashlib

        from tf_vqa_regat_tpu.data.device_store import _source_fingerprint

        return {
            "src_shape": [int(x) for x in dataset.store.features.shape],
            "src_sha1": _source_fingerprint(dataset.store.features),
            "img_len_sha1": hashlib.sha1(
                np.ascontiguousarray(img_len, np.int64).tobytes()
            ).hexdigest(),
            "feature_dtype": feature_dtype,
            "dp": int(self.dp),
            "version": 1,
        }

    def _load_cached_feats(
        self, dataset, cache_dir, feature_dtype, img_len, max_rows, v_dim
    ):
        from tf_vqa_regat_tpu.data.cache import load_packed_cache

        meta_p, feat_p, scale_p = self._cache_paths(
            dataset, cache_dir, feature_dtype, self.dp
        )
        return load_packed_cache(
            meta_p, feat_p, scale_p,
            self._cache_sig(dataset, feature_dtype, img_len),
            feature_dtype, expect_shape=(self.dp, max_rows, v_dim),
        )

    def _save_cached_feats(
        self, dataset, cache_dir, feature_dtype, img_len, feats, feat_scale
    ):
        from tf_vqa_regat_tpu.data.cache import save_packed_cache

        meta_p, feat_p, scale_p = self._cache_paths(
            dataset, cache_dir, feature_dtype, self.dp
        )
        save_packed_cache(
            meta_p, feat_p, scale_p,
            self._cache_sig(dataset, feature_dtype, img_len),
            feats, feat_scale, feature_dtype,
        )

    @staticmethod
    def _fill_feats(
        store, buckets, img_start, img_len, local_start, feature_dtype,
        max_rows, v_dim,
    ):
        """Per-shard feature tables allocated directly at the TARGET dtype
        and filled per image (contiguous slices — works for h5py-backed mmap
        sources too), so neither --feature_dtype nor --mmap_features ever
        stages the full table in f32: host peak RAM is the converted table +
        one image slice."""
        dp = len(buckets)
        if feature_dtype == "bfloat16":
            feats = np.zeros((dp, max_rows, v_dim), jnp.bfloat16)
        elif feature_dtype == "int8":
            feats = np.zeros((dp, max_rows, v_dim), np.int8)
        elif feature_dtype == "float32":
            feats = np.zeros((dp, max_rows, v_dim), np.float32)
        else:
            raise ValueError(f"unknown feature_dtype {feature_dtype!r}")
        feat_scale = (
            np.zeros((dp, max_rows), np.float32)
            if feature_dtype == "int8"
            else None
        )
        for s, bucket in enumerate(buckets):
            for li, img in enumerate(bucket):
                ln = int(img_len[img])
                st = int(img_start[img])
                off = int(local_start[s, li])
                if store.adaptive:
                    f_img = np.asarray(store.features[st : st + ln], np.float32)
                else:
                    f_img = np.asarray(store.features[img], np.float32)
                if feature_dtype == "int8":
                    q, sc = quantize_rows(f_img)
                    feats[s, off : off + ln] = q
                    feat_scale[s, off : off + ln] = sc
                else:
                    feats[s, off : off + ln] = f_img.astype(feats.dtype)
        return feats, feat_scale

    def _adj_local_host(self, adj_src) -> np.ndarray:
        """Host-side per-shard adjacency table in LOCAL image-slot order,
        flattened to [dp * max_local_imgs, A, A] for the P('data') put."""
        A = adj_src.shape[1]
        adj_local = np.zeros((self.dp, self._max_local_imgs, A, A), np.int8)
        for s, bucket in enumerate(self._img_buckets):
            for li, img in enumerate(bucket):
                adj_local[s, li] = adj_src[img]
        return adj_local.reshape(self.dp * self._max_local_imgs, A, A)

    def sharded_adj_table(self, adj_src) -> jax.Array:
        """Extra adjacency table partitioned with THIS store's image
        assignment — lets the sharded ensemble share one base store across
        members whose relation types need different edge tables."""
        from tf_vqa_regat_tpu.parallel.distributed import put_global

        sh = NamedSharding(self.mesh, P(DATA_AXIS))
        return put_global(self._adj_local_host(adj_src), sh)

    def image_meta_arrays(self):
        """Replicated [n_img] int32 lookup tables for global-image-id
        addressing (the serving path): owning shard, local slot within it,
        and the global box count. Tiny (12 bytes/image), so replication is
        free next to the partitioned feature tables."""
        from tf_vqa_regat_tpu.parallel.distributed import put_global
        from tf_vqa_regat_tpu.parallel.mesh import replicated

        rep = replicated(self.mesh)
        return {
            "img_shard": put_global(self.img_shard.astype(np.int32), rep),
            "img_local": put_global(self.img_local.astype(np.int32), rep),
            "img_len": put_global(self.img_len_global, rep),
        }

    @property
    def entry_nbox(self) -> np.ndarray:
        """Box counts over all entries (shard-concatenated order) — feeds the
        roi-bucket truncation warning, same contract as DeviceStore."""
        return np.concatenate(self._local_entry_nbox)

    def steps_per_epoch(self, batch_size: int) -> int:
        """Steps actually executed per epoch: the max over shards of their
        local step counts (ragged tails pad with -1). Use this — not
        ceil(total/batch) — for anything epoch-keyed (e.g. the LR schedule)."""
        per = batch_size // self.dp
        return int(max((n + per - 1) // per for n in self.local_entry_counts))

    def epoch_indices(
        self, epoch: int, batch_size: int, shuffle: bool, seed: int
    ) -> Iterator[np.ndarray]:
        """Global [batch] index vectors; segment s holds shard-local entry
        indices (or -1 padding). batch_size must divide by dp."""
        dp = self.dp
        assert batch_size % dp == 0, f"batch {batch_size} not divisible by dp={dp}"
        per = batch_size // dp
        orders = []
        for s in range(dp):
            n = int(self.local_entry_counts[s])
            if shuffle:
                rng = shard_perm_rng(seed, epoch, s)
                orders.append(rng.permutation(n))
            else:
                orders.append(np.arange(n))
        yield from _padded_step_batches(orders, per)

    # ---- roi bucketing (sharded analog of DeviceStore's; SURVEY §7 padding
    # economics — measured +30% mixed-size train throughput on v5e) ----------

    def _local_bucket_of(self, buckets: "list[int]") -> "List[np.ndarray]":
        """Per shard: bucket index of each local entry; oversized images clamp
        to the last bucket (same clamp as a plain --num_rois)."""
        b = np.asarray(sorted(buckets))
        return [
            np.minimum(np.searchsorted(b, nb), len(b) - 1)
            for nb in self._local_entry_nbox
        ]

    def bucketed_batch_counts(self, batch_size: int, buckets: "list[int]") -> "List[int]":
        """Per bucket: steps executed = MAX over shards of the shard's local
        batch count (SPMD: every shard must run the same static-R program each
        step; shards short on a bucket pad their segment with -1)."""
        per = batch_size // self.dp
        bos = self._local_bucket_of(buckets)
        return [
            max(-(-int((bo == bi).sum()) // per) for bo in bos)
            for bi in range(len(buckets))
        ]

    def bucketed_steps_per_epoch(self, batch_size: int, buckets: "list[int]") -> int:
        return int(sum(self.bucketed_batch_counts(batch_size, buckets)))

    def epoch_indices_bucketed(
        self,
        epoch: int,
        batch_size: int,
        buckets: "list[int]",
        shuffle: bool,
        seed: int,
    ) -> "Iterator[tuple[int, np.ndarray]]":
        """Bucketed (R, [batch]) index vectors; segment s of each batch holds
        shard-LOCAL entry ids of shard s's entries in that bucket (-1 pad).
        All shards step through the same deterministic (R, step) schedule —
        computed from global metadata, so every process agrees — and every
        local entry appears exactly once per epoch. The bucket mix interleaves
        under shuffle (job order permuted), like the replicated store."""
        buckets = sorted(buckets)
        dp = self.dp
        assert batch_size % dp == 0, f"batch {batch_size} not divisible by dp={dp}"
        per = batch_size // dp
        bos = self._local_bucket_of(buckets)
        rng = batch_shuffle_rng(seed, epoch)
        jobs = []
        for bi, R in enumerate(buckets):
            per_shard = []
            for s in range(dp):
                ids = np.where(bos[s] == bi)[0].astype(np.int32)
                if shuffle:
                    srng = shard_bucket_perm_rng(seed, epoch, s, bi)
                    ids = ids[srng.permutation(len(ids))]
                per_shard.append(ids)
            for blk in _padded_step_batches(per_shard, per):
                jobs.append((R, blk))
        if shuffle:
            order = rng.permutation(len(jobs))
            jobs = [jobs[i] for i in order]
        yield from jobs


def build_sharded_gather(mesh, num_rois: int, num_ans: int, padding_idx: int):
    """shard_map'ed gather: each device assembles its batch segment from its
    local table shard; the result re-enters the GSPMD world with the batch dim
    sharded over the data axis."""
    from jax import shard_map

    def local_gather(arrays, idx):
        return gather_batch(arrays, idx, num_rois, num_ans, padding_idx)

    # prefix specs: every table is sharded on axis 0 over the data axis, and
    # every output is a batch-segment sharded the same way (key-agnostic, so
    # optional tables — int8's feat_scale, semantic adjacency — just work)
    return shard_map(
        local_gather, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )


def build_sharded_image_gather(mesh, num_rois: int):
    """Distributed HBM lookup by GLOBAL image id, REPLICATED result — the
    serving path over a split too big to replicate (round-4 verdict item 5).

    Each device gathers the requested images IT OWNS from its local table
    slice (zeros elsewhere — the ownership test is `img_shard[img] == me`),
    and one psum over the data axis assembles the full [B, R, ...] batch on
    every device: exactly-one-owner means the sum IS the owner's rows. The
    batch dim stays unsharded so batch-1 serving works on any mesh; latency
    cost is one ICI all-reduce of the gathered batch (~a few MB at serving
    batch sizes), never a host round trip.

    Signature: f(arrays, img_meta, img [B] global ids, n_box [B]) ->
    (features, norm_bb, bb, adj_label|None), all [B, R, ...] f32/int32
    replicated. `arrays` is ShardedDeviceStore.arrays (tables partitioned
    over the data axis); `img_meta` is store.image_meta_arrays()
    (replicated id->owner lookups). n_box must already be 0 for invalid
    slots (the caller masks by `valid`).
    """
    from jax import shard_map

    def local_gather(arrays, img_meta, img, n_box):
        me = jax.lax.axis_index(DATA_AXIS)
        owned = img_meta["img_shard"][img] == me  # [B]
        li = img_meta["img_local"][img]  # [B] local slot (garbage if !owned)
        n_eff = jnp.where(owned, n_box, 0)
        start = arrays["img_start"][li]  # local row offset
        r = jnp.arange(num_rois, dtype=jnp.int32)
        rows = start[:, None] + r[None, :]
        roi_ok = r[None, :] < n_eff[:, None]
        T = arrays["features"].shape[0]
        rows = jnp.clip(rows, 0, T - 1)
        B = img.shape[0]

        def take(tab):
            out = jnp.take(tab, rows.reshape(-1), axis=0)
            out = out.reshape(B, num_rois, -1).astype(jnp.float32)
            return jnp.where(roi_ok[..., None], out, jnp.zeros_like(out))

        features = take(arrays["features"])
        if "feat_scale" in arrays:  # int8 tables: per-row dequant scale
            scale = jnp.take(arrays["feat_scale"], rows.reshape(-1), axis=0)
            features = features * scale.reshape(B, num_rois, 1)
        adj = None
        if "adj" in arrays:
            k = min(arrays["adj"].shape[1], num_rois)
            a = arrays["adj"][jnp.clip(li, 0, arrays["adj"].shape[0] - 1)]
            adj = jnp.zeros((B, num_rois, num_rois), jnp.int32)
            adj = adj.at[:, :k, :k].set(a[:, :k, :k].astype(jnp.int32))
            # n_box == 0 marks invalid slots (caller masks by `valid`): their
            # li points at whatever image 0's owner holds, so zero them like
            # the replicated gather_adj's valid-mask does
            adj = jnp.where((owned & (n_eff > 0))[:, None, None], adj, 0)
        out = (features, take(arrays["norm_bb"]), take(arrays["bb"]), adj)
        # exactly one shard owns each image -> psum selects the owner's rows
        return jax.tree.map(lambda x: jax.lax.psum(x, DATA_AXIS), out)

    return shard_map(
        local_gather, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P(), P()),
        out_specs=P(),
    )
