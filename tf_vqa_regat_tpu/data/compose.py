"""Dataset composition: VQA-CP v2, train+val concatenation (--use_both), and
Visual Genome augmentation (--use_vg).

The reference accepts all three flags (main.py:41-44, --dataset vqa_cp) but
implements none of them — its VQAFeatureDataset hardcodes the VQA v2 paths and
ignores use_both/use_vg (dataset.py:159-247). These implementations follow the
PyTorch original's layouts (linjieli222/VQA_ReGAT dataset.py /
dataset_cp_v2.py):

  VQA-CP v2:  questions  cp_v2_questions/vqacp_v2_{train,test}_questions.json
              (a flat JSON list, unlike VQA v2's {"questions": [...]}),
              targets    cache/cp_v2_cache/{train,test}_target.pkl,
              features   the COCO train2014+val2014 stores merged (CP re-splits
              across both COCO splits).
  use_both:   concatenate the train and val splits' entries over merged
              feature stores.
  use_vg:     Visual Genome QA pairs over COCO images with in-vocabulary
              answers (score 1.0), reusing the merged feature stores.
"""

from __future__ import annotations

import json
import os
import pickle
import re as _re
from typing import Dict, Tuple

import numpy as np

from tf_vqa_regat_tpu.data.dictionary import Dictionary, encode_question
from tf_vqa_regat_tpu.data.entries import EntryTable
from tf_vqa_regat_tpu.data.features import (
    FeatureStore,
    VQADataset,
    load_feature_store,
    load_imgid2idx,
)


def merge_stores(a: FeatureStore, b: FeatureStore) -> Tuple[FeatureStore, int]:
    """Concatenate two feature stores; returns (merged, image-index offset for
    b's images)."""
    assert a.adaptive == b.adaptive
    # self-enforcing invariant (not just the main.py CLI check): composing a
    # lazy (--mmap_features) store would np.concatenate over the open h5py
    # Dataset — a silent full-table f32 materialization that defeats the
    # mmap RAM ceiling, leaving dangling h5 handles behind
    assert not (a.features_lazy or b.features_lazy), (
        "merge_stores requires materialized stores; reload without "
        "mmap_features to compose splits"
    )
    if a.adaptive:
        box_offset = a.features.shape[0]
        pos_b = b.pos_boxes + box_offset
        merged = FeatureStore(
            adaptive=True,
            features=np.concatenate([a.features, b.features], axis=0),
            normalized_bb=np.concatenate([a.normalized_bb, b.normalized_bb], axis=0),
            bb=np.concatenate([a.bb, b.bb], axis=0),
            pos_boxes=np.concatenate([a.pos_boxes, pos_b], axis=0),
        )
        img_offset = a.pos_boxes.shape[0]
    else:
        merged = FeatureStore(
            adaptive=False,
            features=np.concatenate([a.features, b.features], axis=0),
            normalized_bb=np.concatenate([a.normalized_bb, b.normalized_bb], axis=0),
            bb=np.concatenate([a.bb, b.bb], axis=0),
        )
        img_offset = a.features.shape[0]

    def _cat_adj(x, y):
        if x is None or y is None:
            return None
        return np.concatenate([x, y], axis=0)

    merged.semantic_adj = _cat_adj(a.semantic_adj, b.semantic_adj)
    merged.spatial_adj = _cat_adj(a.spatial_adj, b.spatial_adj)
    return merged, img_offset


def concat_entries(a: EntryTable, b: EntryTable, b_image_offset: int) -> EntryTable:
    return EntryTable(
        question_ids=np.concatenate([a.question_ids, b.question_ids]),
        image_ids=np.concatenate([a.image_ids, b.image_ids]),
        image_index=np.concatenate(
            [a.image_index, b.image_index + b_image_offset]
        ).astype(np.int32),
        q_tokens=np.concatenate([a.q_tokens, b.q_tokens], axis=0),
        label_offsets=np.concatenate(
            [a.label_offsets, a.label_offsets[-1] + b.label_offsets[1:]]
        ),
        labels=np.concatenate([a.labels, b.labels]),
        scores=np.concatenate([a.scores, b.scores]),
        has_answers=a.has_answers and b.has_answers,
    )


def concat_datasets(a: VQADataset, b: VQADataset, name: str) -> VQADataset:
    """--use_both: one dataset spanning both splits' entries and features."""
    store, offset = merge_stores(a.store, b.store)
    entries = concat_entries(a.entries, b.entries, offset)
    return VQADataset(
        name=name,
        entries=entries,
        store=store,
        num_ans=a.num_ans,
        label2ans=a.label2ans,
        dictionary=a.dictionary,
        relation_type=a.relation_type,
        ntoken=a.ntoken,
    )


# ------------------------------------------------------------------ VQA-CP v2
def load_vqa_cp_base(
    dataroot: str, adaptive: bool, relation_types
) -> Dict[str, object]:
    """The split-independent half of VQA-CP loading: merged COCO train+val
    feature store, image-id map, and answer vocab. Build it ONCE and pass it
    to both load_vqa_cp_dataset calls — each call otherwise re-reads and
    re-merges the full train+val tables (~2x the combined features resident,
    ~3x peak during the second merge, at the real adaptive scale tens of GB
    — round-3 review finding)."""
    with open(os.path.join(dataroot, "cache", "trainval_ans2label.pkl"), "rb") as fh:
        ans2label = pickle.load(fh)
    with open(os.path.join(dataroot, "cache", "trainval_label2ans.pkl"), "rb") as fh:
        label2ans = pickle.load(fh)
    store_tr = load_feature_store(dataroot, "train", adaptive, relation_types)
    store_va = load_feature_store(dataroot, "val", adaptive, relation_types)
    store, offset = merge_stores(store_tr, store_va)
    id2idx_tr = load_imgid2idx(dataroot, "train", adaptive)
    id2idx_va = load_imgid2idx(dataroot, "val", adaptive)
    img_id2idx = dict(id2idx_tr)
    for k, v in id2idx_va.items():
        img_id2idx.setdefault(k, v + offset)
    return {
        "store": store,
        "img_id2idx": img_id2idx,
        "ans2label": ans2label,
        "label2ans": label2ans,
    }


def load_vqa_cp_dataset(
    name: str,
    dictionary: Dictionary,
    relation_type: str,
    dataroot: str = "data",
    adaptive: bool = False,
    max_q_len: int = 14,
    store_relation_types=None,
    base: Dict[str, object] = None,
) -> VQADataset:
    """VQA-CP v2 split ('train' | 'test') over merged COCO train+val
    features. ``store_relation_types`` widens the loaded adjacency tables
    (ensemble members — see load_vqa_dataset). ``base`` shares one
    load_vqa_cp_base result (merged store + maps) across splits."""
    assert name in ("train", "test")
    if base is None:
        base = load_vqa_cp_base(
            dataroot, adaptive, store_relation_types or relation_type
        )
    store = base["store"]
    img_id2idx = base["img_id2idx"]
    ans2label = base["ans2label"]
    label2ans = base["label2ans"]

    qpath = os.path.join(
        dataroot, "cp_v2_questions", "vqacp_v2_%s_questions.json" % name
    )
    with open(qpath) as fh:
        raw = json.load(fh)
    questions = raw["questions"] if isinstance(raw, dict) else raw  # CP = flat list
    questions = sorted(questions, key=lambda x: x["question_id"])

    apath = os.path.join(dataroot, "cache", "cp_v2_cache", "%s_target.pkl" % name)
    with open(apath, "rb") as fh:
        answers = sorted(pickle.load(fh), key=lambda x: x["question_id"])
    assert len(questions) == len(answers)

    qids, iids, iidx, toks = [], [], [], []
    label_list, score_list, counts = [], [], []
    for q, a in zip(questions, answers):
        assert q["question_id"] == a["question_id"]
        assert q["image_id"] == a["image_id"]
        qids.append(q["question_id"])
        iids.append(q["image_id"])
        iidx.append(img_id2idx[q["image_id"]])
        toks.append(encode_question(dictionary, q["question"], max_q_len))
        labels = np.asarray(a["labels"], np.int32).ravel()
        scores = np.asarray(a["scores"], np.float32).ravel()
        label_list.append(labels)
        score_list.append(scores)
        counts.append(len(labels))

    offsets = np.zeros(len(qids) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    entries = EntryTable(
        question_ids=np.asarray(qids, np.int64),
        image_ids=np.asarray(iids, np.int64),
        image_index=np.asarray(iidx, np.int32),
        # reshape pins [n, max_q_len] even for an empty split (see
        # entries.load_entries)
        q_tokens=np.asarray(toks, np.int32).reshape(len(qids), max_q_len),
        label_offsets=offsets,
        labels=np.concatenate(label_list) if label_list else np.zeros(0, np.int32),
        scores=np.concatenate(score_list) if score_list else np.zeros(0, np.float32),
        has_answers=True,
    )
    return VQADataset(
        name="cp_" + name,
        entries=entries,
        store=store,
        num_ans=len(ans2label),
        label2ans=label2ans,
        dictionary=dictionary,
        relation_type=relation_type,
    )


# -------------------------------------------------------------- Visual Genome
# Standard VQA answer normalization (the official VQA eval code's rules, used
# by every BUTD-family repo's compute_softscore to build the 3,129-answer
# vocab; the PyTorch original runs it as preprocess_answer on VG answers
# before the vocab lookup). Implemented from the well-known spec — the
# original's file is not vendored here — so a handful of rare contraction
# entries may differ; any divergence only drops an out-of-vocab VG pair
# (score-1.0 augmentation data), never corrupts a kept one. A bare
# lower/strip was measurably wrong the common way: "A dog." / "Two." /
# "11,000" all failed the vocab lookup and were silently dropped
# (review finding).
_VG_ARTICLES = {"a", "an", "the"}
_VG_MANUAL_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
_VG_CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve": "could've",
    "couldnt": "couldn't", "didnt": "didn't", "doesnt": "doesn't",
    "dont": "don't", "hadnt": "hadn't", "hasnt": "hasn't", "havent": "haven't",
    "hed": "he'd", "hes": "he's", "howd": "how'd", "howll": "how'll",
    "hows": "how's", "im": "i'm", "ive": "i've", "isnt": "isn't",
    "itd": "it'd", "itll": "it'll", "lets": "let's", "maam": "ma'am",
    "mightve": "might've", "mustve": "must've", "shant": "shan't",
    "shed": "she'd", "shes": "she's", "shouldve": "should've",
    "shouldnt": "shouldn't", "thats": "that's", "thered": "there'd",
    "therere": "there're", "theres": "there's", "theyd": "they'd",
    "theyll": "they'll", "theyre": "they're", "theyve": "they've",
    "twas": "'twas", "wasnt": "wasn't", "wed": "we'd", "weve": "we've",
    "werent": "weren't", "whatll": "what'll", "whatre": "what're",
    "whats": "what's", "whatve": "what've", "whens": "when's",
    "whered": "where'd", "wheres": "where's", "whereve": "where've",
    "whod": "who'd", "wholl": "who'll", "whos": "who's", "whove": "who've",
    "whyll": "why'll", "whyre": "why're", "whys": "why's", "wont": "won't",
    "wouldve": "would've", "wouldnt": "wouldn't", "yall": "y'all",
    "youd": "you'd", "youll": "you'll", "youre": "you're", "youve": "you've",
}
_VG_PUNCT = [
    ";", "/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\", "_", "-",
    ">", "<", "@", "`", ",", "?", "!",
]
_VG_PERIOD = _re.compile(r"(?!<=\d)(\.)(?!\d)")
_VG_COMMA_DIGITS = _re.compile(r"(\d)(\,)(\d)")


def _vg_process_punctuation(text: str) -> str:
    out = text
    for p in _VG_PUNCT:
        if (p + " " in text or " " + p in text) or (
            _VG_COMMA_DIGITS.search(text) is not None
        ):
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    return _VG_PERIOD.sub("", out)


def _vg_process_digit_article(text: str) -> str:
    words = []
    for word in text.lower().split():
        word = _VG_MANUAL_MAP.get(word, word)
        if word not in _VG_ARTICLES:
            words.append(word)
    return " ".join(_VG_CONTRACTIONS.get(w, w) for w in words)


def preprocess_answer(answer: str) -> str:
    """lowercase, punctuation rules, article/digit-word normalization,
    contractions — then drop remaining commas."""
    answer = _vg_process_digit_article(_vg_process_punctuation(answer.lower()))
    return answer.replace(",", "")


def load_visual_genome_entries(
    dataroot: str,
    dictionary: Dictionary,
    ans2label: Dict[str, int],
    img_id2idx: Dict[int, int],
    max_q_len: int = 14,
) -> EntryTable:
    """--use_vg: VG QA pairs over COCO images present in the feature store,
    with in-vocabulary answers (score 1.0), following the PyTorch original's
    VisualGenomeFeatureDataset."""
    with open(os.path.join(dataroot, "visualGenome", "image_data.json")) as fh:
        image_data = json.load(fh)
    vg_to_coco = {
        img["image_id"]: img["coco_id"]
        for img in image_data
        if img.get("coco_id") is not None
    }
    with open(os.path.join(dataroot, "visualGenome", "question_answers.json")) as fh:
        vgq = json.load(fh)

    qids, iids, iidx, toks = [], [], [], []
    labels, counts = [], []
    for vg in vgq:
        coco_id = vg_to_coco.get(vg["id"] if "id" in vg else vg.get("image_id"))
        if coco_id is None or coco_id not in img_id2idx:
            continue
        for qa in vg["qas"]:
            answer = preprocess_answer(qa["answer"])
            if answer not in ans2label:
                continue
            qids.append(qa["qa_id"])
            iids.append(coco_id)
            iidx.append(img_id2idx[coco_id])
            toks.append(encode_question(dictionary, qa["question"], max_q_len))
            labels.append(ans2label[answer])
            counts.append(1)

    offsets = np.zeros(len(qids) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return EntryTable(
        question_ids=np.asarray(qids, np.int64),
        image_ids=np.asarray(iids, np.int64),
        image_index=np.asarray(iidx, np.int32),
        q_tokens=np.asarray(toks, np.int32).reshape(len(qids), max_q_len),
        label_offsets=offsets,
        labels=np.asarray(labels, np.int32),
        scores=np.ones(len(labels), np.float32),
        has_answers=True,
    )


def append_entries(ds: VQADataset, extra: EntryTable, name: str) -> VQADataset:
    """Append extra entries (already indexed against ds.store) to a dataset."""
    entries = concat_entries(ds.entries, extra, b_image_offset=0)
    return VQADataset(
        name=name,
        entries=entries,
        store=ds.store,
        num_ans=ds.num_ans,
        label2ans=ds.label2ans,
        dictionary=ds.dictionary,
        relation_type=ds.relation_type,
        ntoken=ds.ntoken,
    )
