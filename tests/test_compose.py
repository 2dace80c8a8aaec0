"""Dataset composition: VQA-CP v2, --use_both concatenation, --use_vg
augmentation (net-new — the reference accepts the flags but implements none,
dataset.py:159-247)."""

import numpy as np
import pytest

from tf_vqa_regat_tpu.data.compose import (
    append_entries,
    concat_datasets,
    load_visual_genome_entries,
    load_vqa_cp_dataset,
    merge_stores,
)
from tf_vqa_regat_tpu.data.dictionary import Dictionary
from tf_vqa_regat_tpu.data.features import load_imgid2idx, load_vqa_dataset
from tf_vqa_regat_tpu.data.fixtures import write_cp_vg_fixture, write_fixture
from tf_vqa_regat_tpu.data.loader import BatchLoader


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    write_fixture(root, name="train", num_images=6, num_questions=12, seed=0,
                  first_image_id=1000)
    write_fixture(root, name="val", num_images=4, num_questions=8, seed=1,
                  first_image_id=2000, first_question_id=100)
    write_cp_vg_fixture(root)
    return root


def _dict(root):
    return Dictionary.load_from_file(root + "/glove/dictionary.pkl")


def test_use_both_concat(dataroot):
    d = _dict(dataroot)
    train = load_vqa_dataset("train", d, "implicit", dataroot, adaptive=True)
    val = load_vqa_dataset("val", d, "implicit", dataroot, adaptive=True)
    both = concat_datasets(train, val, "trainval")
    assert len(both) == 20
    # every entry's image slice matches the split it came from
    f_train, _, _ = train.store.image_slice(train.entries.image_index[0])
    f_both, _, _ = both.store.image_slice(both.entries.image_index[0])
    np.testing.assert_array_equal(f_both, f_train)
    f_val, _, _ = val.store.image_slice(val.entries.image_index[0])
    f_both_v, _, _ = both.store.image_slice(both.entries.image_index[12])
    np.testing.assert_array_equal(f_both_v, f_val)
    # batcher works over the concat
    loader = BatchLoader(both, 8, 100, shuffle=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3


def test_vqa_cp_loading(dataroot):
    from tf_vqa_regat_tpu.data.compose import load_vqa_cp_base

    d = _dict(dataroot)
    # main.py builds the merged COCO base ONCE and shares it across splits
    # (each per-split call otherwise re-merges its own full copy)
    base = load_vqa_cp_base(dataroot, True, "implicit")
    cp_train = load_vqa_cp_dataset(
        "train", d, "implicit", dataroot, adaptive=True, base=base
    )
    cp_test = load_vqa_cp_dataset(
        "test", d, "implicit", dataroot, adaptive=True, base=base
    )
    assert cp_train.store is cp_test.store  # one resident merged store
    # and the standalone (no-base) call is equivalent
    solo = load_vqa_cp_dataset("train", d, "implicit", dataroot, adaptive=True)
    np.testing.assert_array_equal(
        solo.entries.q_tokens, cp_train.entries.q_tokens
    )
    np.testing.assert_array_equal(solo.store.features, cp_train.store.features)
    assert len(cp_train) == 10
    assert len(cp_test) == 10
    assert cp_train.num_ans == 13
    # entries reference images across BOTH original splits
    max_train_imgs = 6
    assert cp_train.entries.image_index.max() >= max_train_imgs or \
        cp_test.entries.image_index.max() >= max_train_imgs
    loader = BatchLoader(cp_train, 4, 100, shuffle=False)
    b = next(iter(loader.epoch(0)))
    assert b["features"].shape == (4, 100, 64)
    assert np.isfinite(b["target"]).all()


def test_visual_genome_entries(dataroot):
    import pickle

    d = _dict(dataroot)
    with open(dataroot + "/cache/trainval_ans2label.pkl", "rb") as fh:
        ans2label = pickle.load(fh)
    img_id2idx = load_imgid2idx(dataroot, "train", adaptive=True)
    vg = load_visual_genome_entries(dataroot, d, ans2label, img_id2idx)
    # 4 VG images x 1 in-vocab QA each (the out-of-vocab answers are dropped)
    assert len(vg) == 4
    assert (vg.scores == 1.0).all()
    train = load_vqa_dataset("train", d, "implicit", dataroot, adaptive=True)
    aug = append_entries(train, vg, "train+vg")
    assert len(aug) == len(train) + 4
    loader = BatchLoader(aug, 16, 100, shuffle=False)
    assert len(list(loader.epoch(0))) == 1


def test_main_use_both_use_vg_glue(dataroot):
    """main.py's --use_both + --use_vg composition: the val-offset arithmetic
    (main.py builds img_id2idx for the merged store by offsetting the val map
    past the train tables) must resolve VG QAs over COCO *val* images to the
    val split's features. Would fail if the offset were wrong or val ids
    collided into train rows."""
    import main as entry
    from tf_vqa_regat_tpu.config import Config

    cfg = Config(
        mode="train", data_folder=dataroot, adaptive=True,
        use_both=True, use_vg=True, relation_type="implicit",
    )
    train, val, _, _ = entry.build_datasets(cfg)
    assert train.name == "trainval+vg"
    d = _dict(dataroot)
    plain_train = load_vqa_dataset("train", d, "implicit", dataroot, adaptive=True)
    plain_val = load_vqa_dataset("val", d, "implicit", dataroot, adaptive=True)
    # trainval (12 + 8) + VG: 4 train-mapped + 2 val-mapped in-vocab QAs
    assert len(train) == len(plain_train) + len(plain_val) + 6

    ent = train.entries
    n_vg = 6
    vg_slice = slice(len(train) - n_vg, len(train))
    vg_img_idx = ent.image_index[vg_slice]
    vg_qids = ent.question_ids[vg_slice]
    # val-mapped VG questions (qa_id 98xx) must point past the train images
    # and their features must equal the val split's own slices
    val_map = load_imgid2idx(dataroot, "val", adaptive=True)
    n_train_imgs = 6
    for qid, idx in zip(vg_qids, vg_img_idx):
        if 9800 <= qid < 9900:
            assert idx >= n_train_imgs, (qid, idx)
            got, _, _ = train.store.image_slice(int(idx))
            want, _, _ = plain_val.store.image_slice(int(idx) - n_train_imgs)
            np.testing.assert_array_equal(got, want)
        else:
            assert idx < n_train_imgs, (qid, idx)
            got, _, _ = train.store.image_slice(int(idx))
            want, _, _ = plain_train.store.image_slice(int(idx))
            np.testing.assert_array_equal(got, want)
    assert sum(1 for q in vg_qids if 9800 <= q < 9900) == 2


def test_merge_stores_fixed(tmp_path):
    root = str(tmp_path / "d")
    write_fixture(root, name="train", adaptive=False, num_images=3, num_questions=6)
    write_fixture(root, name="val", adaptive=False, num_images=2, num_questions=4,
                  seed=1, first_image_id=2000, first_question_id=50)
    d = _dict(root)
    a = load_vqa_dataset("train", d, "implicit", root, adaptive=False)
    b = load_vqa_dataset("val", d, "implicit", root, adaptive=False)
    merged, offset = merge_stores(a.store, b.store)
    assert offset == 3
    assert merged.features.shape[0] == 5
    np.testing.assert_array_equal(merged.image_slice(3)[0], b.store.image_slice(0)[0])


def test_main_vqa_cp_glue(dataroot):
    """main.py's --dataset vqa_cp branch: both splits must share ONE merged
    COCO feature store (load_vqa_cp_base built once — round-3 review
    finding: per-split loads doubled the resident tables)."""
    import main as entry
    from tf_vqa_regat_tpu.config import Config

    cfg = Config(
        mode="train", data_folder=dataroot, adaptive=True,
        dataset="vqa_cp", relation_type="implicit",
    )
    train, val, _, _ = entry.build_datasets(cfg)
    assert train.name == "cp_train" and val.name == "cp_test"
    assert train.store is val.store
    assert len(train) == 10 and len(val) == 10


def test_vg_preprocess_answer_normalization():
    """The standard VQA answer normalization applied to VG answers before the
    vocab lookup (compose.py::preprocess_answer — review finding: bare
    lower/strip dropped 'A dog.', 'Two.', '11,000' style answers)."""
    from tf_vqa_regat_tpu.data.compose import preprocess_answer

    cases = {
        "A Dog.": "dog",
        "Two.": "2",
        "two. ": "2",
        "11,000": "11000",
        "the red car": "red car",
        "It's sunny!": "it's sunny",
        "dont": "don't",
        "NONE": "0",
        "blue": "blue",
    }
    for raw, want in cases.items():
        assert preprocess_answer(raw) == want, raw
