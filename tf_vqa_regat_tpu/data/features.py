"""Bottom-up-attention region feature store (HDF5) + the VQA dataset facade.

Mirrors the reference's data layout (dataset.py:159-247) while fixing its
broken fixed-36 path (split_entries unconditionally indexed pos_boxes, which is
None when adaptive=False — dataset.py:228-230,302; SURVEY §3.4):

  adaptive: image_features [total_boxes, 2048], pos_boxes [num_images, 2]
  fixed-36: image_features [num_images, 36, 2048]

Both paths produce statically-shaped batches (rois padded to
``cfg.resolved_num_rois()`` with a per-example valid-box count).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Dict, List, Optional

import h5py
import numpy as np

from tf_vqa_regat_tpu.data.dictionary import Dictionary
from tf_vqa_regat_tpu.data.entries import EntryTable, load_entries


@dataclass
class FeatureStore:
    adaptive: bool
    features: np.ndarray  # adaptive: [total_boxes, v]; fixed: [num_img, 36, v]
    normalized_bb: np.ndarray  # matching layout, 6-d
    bb: np.ndarray  # matching layout, 4-d
    pos_boxes: Optional[np.ndarray] = None  # adaptive only, [num_img, 2]
    semantic_adj: Optional[np.ndarray] = None  # [num_img, 100, 100]
    spatial_adj: Optional[np.ndarray] = None  # [num_img, 100, 100]
    # mmap mode: `features` is the live h5py Dataset (contiguous slicing
    # works; fancy indexing does not) and this handle keeps the file open.
    h5_file: Optional[object] = None

    @property
    def features_lazy(self) -> bool:
        return self.h5_file is not None

    @property
    def v_dim(self) -> int:
        return self.features.shape[-1]

    @property
    def s_dim(self) -> int:
        return self.normalized_bb.shape[-1]

    def image_slice(self, idx: int):
        """(features, norm_bb, bb) for one image, [n_boxes, ...]."""
        if self.adaptive:
            s, e = self.pos_boxes[idx]
            return self.features[s:e], self.normalized_bb[s:e], self.bb[s:e]
        return self.features[idx], self.normalized_bb[idx], self.bb[idx]


def load_feature_store(
    dataroot: str, name: str, adaptive: bool, relation_type,
    mmap: bool = False,
) -> FeatureStore:
    """Open the split's HDF5 (reference path scheme, dataset.py:183-199).

    Default: materialize into host RAM, as the reference does
    (dataset.py:206-230 — ~58 GB f32 for the adaptive train split, which is
    the reference's real hardware floor). ``mmap=True`` keeps the dominant
    `image_features` table LAZY (an open h5py Dataset): the device stores
    then convert it chunk-by-chunk straight into the target dtype
    (device_store.build_arrays), so host peak RAM is the *converted* table
    (+ one chunk) — e.g. ~15 GB for int8 instead of ~73 GB. Box tables and
    adjacency are small relative to features and always materialize.

    ``relation_type`` may be a single type or an iterable of types: the
    ensemble evaluates members of SEVERAL relation types over one shared
    store, so it needs every member's adjacency table loaded regardless of
    the top-level --relation_type (round-3 review finding)."""
    needed = (
        {relation_type} if isinstance(relation_type, str) else set(relation_type)
    )
    prefix = "_36" if "test" in name else "36"
    h5_root = os.path.join(
        dataroot,
        "Bottom-up-features-adaptive" if adaptive else "Bottom-up-features-fixed",
    )
    h5_path = os.path.join(h5_root, "%s%s.hdf5" % (name, "" if adaptive else prefix))
    hf = h5py.File(h5_path, "r")
    try:
        features = hf["image_features"] if mmap else np.asarray(
            hf["image_features"], np.float32
        )
        normalized_bb = np.asarray(hf["spatial_features"], np.float32)
        bb = np.asarray(hf["image_bb"], np.float32)
        semantic_adj = None
        spatial_adj = None
        if "semantic_adj_matrix" in hf and "semantic" in needed:
            semantic_adj = np.asarray(hf["semantic_adj_matrix"], np.int32)
        if "image_adj_matrix" in hf and "spatial" in needed:
            spatial_adj = np.asarray(hf["image_adj_matrix"], np.int32)
        pos_boxes = np.asarray(hf["pos_boxes"], np.int64) if adaptive else None
    except Exception:
        hf.close()  # don't leak the handle/lock on a malformed file
        raise
    if not mmap:
        hf.close()
    return FeatureStore(
        adaptive=adaptive,
        features=features,
        normalized_bb=normalized_bb,
        bb=bb,
        pos_boxes=pos_boxes,
        semantic_adj=semantic_adj,
        spatial_adj=spatial_adj,
        h5_file=hf if mmap else None,
    )


def load_imgid2idx(dataroot: str, name: str, adaptive: bool) -> Dict[int, int]:
    prefix = "_36" if "test" in name else "36"
    path = os.path.join(
        dataroot, "imgids", "%s%s_imgid2idx.pkl" % (name, "" if adaptive else prefix)
    )
    with open(path, "rb") as fh:
        return pickle.load(fh)


@dataclass
class VQADataset:
    """One split, ready to batch: entries + features + answer vocabulary.

    ``ntoken`` is snapshotted at tokenization time: the TF-IDF init later
    *extends* the shared dictionary (19,901 -> 28,333 words, SURVEY §3.5), but
    the questions were padded with the pre-extension padding_idx and the model
    embedding must be sized to it — the reference builds the model before
    calling tfidf_from_questions (reference main.py:128-136)."""

    name: str
    entries: EntryTable
    store: FeatureStore
    num_ans: int
    label2ans: List[str]
    dictionary: Dictionary
    relation_type: str
    ntoken: int = -1

    def __post_init__(self):
        if self.ntoken < 0:
            self.ntoken = self.dictionary.ntoken

    @property
    def padding_idx(self) -> int:
        return self.ntoken  # == padding_idx at tokenization time

    @property
    def v_dim(self) -> int:
        return self.store.v_dim

    def __len__(self) -> int:
        return len(self.entries)


def load_vqa_dataset(
    name: str,
    dictionary: Dictionary,
    relation_type: str,
    dataroot: str = "data",
    adaptive: bool = False,
    mmap: bool = False,
    store_relation_types=None,
) -> VQADataset:
    """``store_relation_types`` (iterable, default {relation_type}) widens
    which precomputed adjacency tables the store loads — the ensemble needs
    every member's table while the dataset-level relation_type stays the
    top-level config's."""
    assert name in ("train", "val", "test-dev2015", "test2015")
    with open(os.path.join(dataroot, "cache", "trainval_ans2label.pkl"), "rb") as fh:
        ans2label = pickle.load(fh)
    with open(os.path.join(dataroot, "cache", "trainval_label2ans.pkl"), "rb") as fh:
        label2ans = pickle.load(fh)
    img_id2idx = load_imgid2idx(dataroot, name, adaptive)
    store = load_feature_store(
        dataroot, name, adaptive, store_relation_types or relation_type, mmap
    )
    entries = load_entries(dataroot, name, img_id2idx, label2ans, dictionary)
    return VQADataset(
        name=name,
        entries=entries,
        store=store,
        num_ans=len(ans2label),
        label2ans=label2ans,
        dictionary=dictionary,
        relation_type=relation_type,
    )
