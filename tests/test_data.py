"""Data pipeline: tokenizer exactness, fixture round-trip through the real
loading path (adaptive + fixed-36), static-shape batching, loader determinism,
GloVe/TF-IDF init."""

import numpy as np
import pytest

from tf_vqa_regat_tpu.data.dictionary import Dictionary, encode_question
from tf_vqa_regat_tpu.data.fixtures import make_dictionary, synthetic_dataset, write_fixture
from tf_vqa_regat_tpu.data.features import load_vqa_dataset
from tf_vqa_regat_tpu.data.loader import BatchLoader


# ------------------------------------------------------------------- tokenizer
def test_tokenizer_string_ops():
    d = Dictionary()
    for w in ["what", "is", "the", "dog", "'s", "name", "bebe", "x"]:
        d.add_word(w)
    # lowercase, strip ',', '?', split possessive 's (reference dataset.py:63-70)
    toks = d.tokenize("What is the Dog's name?", False)
    assert toks == [d.word2idx[w] for w in ["what", "is", "the", "dog", "'s", "name"]]
    # comma stripped
    assert d.tokenize("the, dog", False) == [d.word2idx["the"], d.word2idx["dog"]]
    # OOV -> padding_idx - 1
    assert d.tokenize("zzz", False) == [d.padding_idx - 1]


def test_tokenizer_add_word_grows_dict():
    d = Dictionary()
    toks = d.tokenize("a b a", True)
    assert toks == [0, 1, 0]
    assert d.ntoken == 2
    assert d.padding_idx == 2


def test_encode_question_pads_back():
    d = make_dictionary()
    toks = encode_question(d, "what is", max_length=5)
    assert len(toks) == 5
    assert toks[2:] == [d.padding_idx] * 3


def test_dictionary_pickle_roundtrip(tmp_path):
    d = make_dictionary()
    p = str(tmp_path / "dict.pkl")
    d.dump_to_file(p)
    d2 = Dictionary.load_from_file(p)
    assert d2.word2idx == d.word2idx
    assert d2.idx2word == d.idx2word


# ------------------------------------------------------- fixture + real loaders
@pytest.mark.parametrize("adaptive", [True, False])
def test_fixture_roundtrip(tmp_path, adaptive):
    root = str(tmp_path / "data")
    write_fixture(root, adaptive=adaptive, num_images=6, num_questions=12)
    d = Dictionary.load_from_file(root + "/glove/dictionary.pkl")
    ds = load_vqa_dataset("train", d, "implicit", root, adaptive=adaptive)
    assert len(ds) == 12
    assert ds.num_ans == 13
    R = 100 if adaptive else 36
    loader = BatchLoader(ds, batch_size=5, num_rois=R, shuffle=False)
    batches = list(loader.epoch(0))
    assert len(batches) == 3  # ceil(12/5), final batch padded
    b0 = batches[0]
    assert b0["features"].shape == (5, R, 64)
    assert b0["question"].shape == (5, 14)
    assert b0["target"].shape == (5, 13)
    assert b0["valid"].all()
    last = batches[-1]
    assert last["valid"].sum() == 2  # 12 = 5 + 5 + 2
    # fixed-36 always has exactly 36 valid boxes; adaptive 10..30 per fixture
    if adaptive:
        assert (b0["num_boxes"] >= 10).all() and (b0["num_boxes"] <= 30).all()
    else:
        assert (b0["num_boxes"] == 36).all()
    # features beyond num_boxes are zero padding
    i = 0
    nb = int(b0["num_boxes"][i])
    assert np.abs(b0["features"][i, nb:]).sum() == 0


def test_loader_epoch_shuffling_deterministic():
    ds = synthetic_dataset(num_images=8, num_questions=64, v_dim=16, num_ans=7)
    l1 = BatchLoader(ds, 16, 36, shuffle=True, seed=3)
    l2 = BatchLoader(ds, 16, 36, shuffle=True, seed=3)
    b1 = next(iter(l1.epoch(5)))
    b2 = next(iter(l2.epoch(5)))
    np.testing.assert_array_equal(b1["question"], b2["question"])
    b3 = next(iter(l1.epoch(6)))
    assert not np.array_equal(b1["question"], b3["question"])


def test_soft_targets_scatter():
    ds = synthetic_dataset(num_images=4, num_questions=8, v_dim=8, num_ans=11)
    loader = BatchLoader(ds, 8, 36, shuffle=False)
    batch = next(iter(loader.epoch(0)))
    ent = ds.entries
    for i in range(8):
        s, e = ent.label_offsets[i], ent.label_offsets[i + 1]
        want = np.zeros(11, np.float32)
        want[ent.labels[s:e]] = ent.scores[s:e]
        np.testing.assert_array_equal(batch["target"][i], want)


def test_semantic_adj_in_batch():
    ds = synthetic_dataset(
        num_images=4, num_questions=8, v_dim=8, num_ans=5, semantic=True
    )
    loader = BatchLoader(ds, 4, 50, shuffle=False, include_adj=True)
    batch = next(iter(loader.epoch(0)))
    assert batch["adj_label"].shape == (4, 50, 50)
    assert batch["adj_label"].max() <= 15


# ------------------------------------------------------------- glove / tfidf
def test_glove_tfidf_init(tmp_path):
    import jax

    from tf_vqa_regat_tpu.data.glove import tfidf_from_questions
    from tf_vqa_regat_tpu.models.language import (
        word_embedding_init,
        word_embedding_load_glove,
    )

    root = str(tmp_path / "data")
    write_fixture(root)
    d = Dictionary.load_from_file(root + "/glove/dictionary.pkl")
    ntoken = d.ntoken
    tfidf, weights = tfidf_from_questions(["train"], d, root, target=["vqa"])
    # fixture tfidf is ntoken x ext identity on base vocab
    assert tfidf.shape[0] == ntoken
    assert tfidf.shape[1] == len(d)
    glove = np.load(root + "/glove/glove6b_init_300d.npy")
    params = word_embedding_init(jax.random.PRNGKey(0), ntoken, 300, "c")
    new, trainable = word_embedding_load_glove(params, glove, "c", tfidf, weights)
    assert trainable
    assert new["emb"]["table"].shape == (ntoken + 1, 300)
    np.testing.assert_allclose(np.asarray(new["emb"]["table"][:ntoken]), glove)
    np.testing.assert_allclose(np.asarray(new["emb"]["table"][ntoken]), 0.0)
    # identity tfidf (over base vocab) -> second table == glove on base rows
    np.testing.assert_allclose(
        np.asarray(new["emb_"]["table"][:ntoken]), glove, rtol=1e-5, atol=1e-6
    )


def test_glove_only_init_keeps_emb2_frozen():
    import jax

    from tf_vqa_regat_tpu.models.language import (
        word_embedding_init,
        word_embedding_load_glove,
    )

    glove = np.random.RandomState(0).randn(10, 300).astype(np.float32)
    params = word_embedding_init(jax.random.PRNGKey(0), 10, 300, "c")
    new, trainable = word_embedding_load_glove(params, glove, "c")
    assert not trainable
    np.testing.assert_allclose(np.asarray(new["emb_"]["table"][:10]), glove)


def test_ntoken_snapshot_survives_dictionary_extension():
    """The TF-IDF init extends the shared dictionary AFTER datasets are
    tokenized (reference builds the model before tfidf_from_questions,
    main.py:128-136); the dataset must keep the tokenization-time vocab size
    or padding ids and embedding sizes diverge (code-review finding)."""
    ds = synthetic_dataset(num_images=4, num_questions=9, v_dim=8, num_ans=5)
    orig_ntoken = ds.ntoken
    assert orig_ntoken == ds.dictionary.ntoken
    # simulate the tfidf side effect
    for w in ["zzz1", "zzz2", "zzz3"]:
        ds.dictionary.add_word(w)
    assert ds.dictionary.ntoken == orig_ntoken + 3
    assert ds.ntoken == orig_ntoken  # snapshot unchanged
    assert ds.padding_idx == orig_ntoken
    loader = BatchLoader(ds, 4, 12, shuffle=False)
    last = list(loader.epoch(0))[-1]  # padded final batch uses the snapshot
    assert (last["question"][last["valid"] == False] == orig_ntoken).all()  # noqa: E712


def _pack_oracle(ds, idx, B, R, include_adj=False):
    """Per-entry reference collation (the pre-vectorization BatchLoader loop,
    itself mirroring reference dataset.py:288-355) — the oracle the one-gather
    vectorized _pack must match exactly."""
    ent, store = ds.entries, ds.store
    features = np.zeros((B, R, store.v_dim), np.float32)
    norm_bb = np.zeros((B, R, store.s_dim), np.float32)
    bb = np.zeros((B, R, 4), np.float32)
    num_boxes = np.zeros((B,), np.int32)
    target = np.zeros((B, ds.num_ans), np.float32)
    valid = np.zeros((B,), bool)
    adj_source = store.semantic_adj if include_adj else None
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
    question = np.full((B, ent.q_tokens.shape[1]), ds.padding_idx, np.int32)
    question[: len(idx)] = ent.q_tokens[idx]
    out = dict(features=features, norm_bb=norm_bb, question=question, bb=bb,
               target=target, num_boxes=num_boxes, valid=valid)
    if adj is not None:
        out["adj_label"] = adj
    return out


@pytest.mark.parametrize("adaptive", [True, False])
def test_vectorized_pack_matches_per_entry_oracle(adaptive):
    """BatchLoader's one-gather pack (table precomputed in
    _ensure_gather_table) must reproduce the per-entry loop bit-exactly,
    including the padded final batch, zeroed pad rois, and ragged soft-target
    scatter."""
    ds = synthetic_dataset(
        num_images=6, num_questions=23, v_dim=12, num_ans=9,
        adaptive=adaptive, semantic=True,
    )
    R = 40 if adaptive else 36
    loader = BatchLoader(ds, 8, R, shuffle=False, include_adj=True)
    order = np.arange(len(ds))
    for start in range(0, len(ds), 8):
        idx = order[start : start + 8]
        got = loader._pack(idx)
        want = _pack_oracle(ds, idx, 8, R, include_adj=True)
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)


def test_pack_bf16_wire_format():
    """feature_dtype='bfloat16' rounds ONLY the features (boxes stay f32 —
    spatial-graph labels are discrete in them) and is pure input rounding."""
    import ml_dtypes

    ds = synthetic_dataset(num_images=4, num_questions=8, v_dim=8, num_ans=5)
    f32 = next(iter(BatchLoader(ds, 8, 36, shuffle=False).epoch(0)))
    b16 = next(
        iter(BatchLoader(ds, 8, 36, shuffle=False, feature_dtype="bfloat16").epoch(0))
    )
    assert b16["features"].dtype == ml_dtypes.bfloat16
    assert b16["bb"].dtype == np.float32 and b16["norm_bb"].dtype == np.float32
    np.testing.assert_array_equal(
        b16["features"].astype(np.float32),
        f32["features"].astype(ml_dtypes.bfloat16).astype(np.float32),
    )
    for k in ("norm_bb", "bb", "target", "question", "num_boxes", "valid"):
        np.testing.assert_array_equal(b16[k], f32[k])


def test_native_gather_matches_numpy_pack(monkeypatch):
    """The C++ threaded gather (native/pack.cc) must produce bit-identical
    batches to the numpy fallback (REGAT_NO_NATIVE=1)."""
    from tf_vqa_regat_tpu import native

    if native.get_lib() is None:
        pytest.skip("no C++ toolchain available")
    ds = synthetic_dataset(num_images=6, num_questions=23, v_dim=12, num_ans=9)
    idx = np.arange(17)
    got_native = BatchLoader(ds, 17, 40, shuffle=False)._pack(idx)
    monkeypatch.setenv("REGAT_NO_NATIVE", "1")
    got_numpy = BatchLoader(ds, 17, 40, shuffle=False)._pack(idx)
    for k in got_numpy:
        np.testing.assert_array_equal(got_native[k], got_numpy[k], err_msg=k)


def test_native_gather_rejects_out_of_range_rows():
    """gather_rows is a raw-memory memcpy in C++: an out-of-range row index
    must be refused (return False -> caller takes the numpy path, which
    raises) instead of reading out of bounds (round-2 advisor finding)."""
    from tf_vqa_regat_tpu import native

    if native.get_lib() is None:
        pytest.skip("no C++ toolchain available")
    tab = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = np.zeros((2, 3), np.float32)
    assert native.gather_rows(tab, np.array([1, 4]), out) is False
    assert native.gather_rows(tab, np.array([1, 3]), out) is True
    np.testing.assert_array_equal(out, tab[[1, 3]])


def test_mmap_feature_loading_matches_materialized(tmp_path):
    """--mmap_features: the h5py-backed lazy store must produce bit-identical
    device tables (f32 AND int8 via the chunked converter) and host batches
    (per-image slice fallback) to the fully-materialized load."""
    from tf_vqa_regat_tpu.data import device_store as dstore
    from tf_vqa_regat_tpu.data.device_store import DeviceStore, build_arrays
    from tf_vqa_regat_tpu.data.dictionary import Dictionary
    from tf_vqa_regat_tpu.data.features import load_vqa_dataset

    root = str(tmp_path)
    write_fixture(root, num_images=10, num_questions=20, v_dim=32, num_ans=9,
                  adaptive=True, name="train")
    d = Dictionary.load_from_file(f"{root}/glove/dictionary.pkl")
    eager = load_vqa_dataset("train", d, "implicit", root, adaptive=True)
    lazy = load_vqa_dataset("train", d, "implicit", root, adaptive=True, mmap=True)
    assert lazy.store.features_lazy and not eager.store.features_lazy

    # chunked conversion (force several chunks) == one-shot, for all dtypes
    old_chunk = dstore.CHUNK_ROWS
    dstore.CHUNK_ROWS = 37
    try:
        for fd in ("float32", "bfloat16", "int8"):
            a_eager = build_arrays(eager, feature_dtype=fd)
            a_lazy = build_arrays(lazy, feature_dtype=fd)
            assert set(a_eager) == set(a_lazy)
            for k in a_eager:
                np.testing.assert_array_equal(
                    np.asarray(a_eager[k]), np.asarray(a_lazy[k]),
                    err_msg=f"{fd}:{k}",
                )
    finally:
        dstore.CHUNK_ROWS = old_chunk

    # host loader: lazy per-image-slice fallback == vectorized pack
    b_eager = next(iter(BatchLoader(eager, 8, 40, shuffle=False).epoch(0)))
    b_lazy = next(iter(BatchLoader(lazy, 8, 40, shuffle=False).epoch(0)))
    for k in b_eager:
        np.testing.assert_array_equal(b_eager[k], b_lazy[k], err_msg=k)

    # device store builds + gathers from the lazy source
    s = DeviceStore(lazy, feature_dtype="int8")
    assert int(s.num_entries) == 20


def test_host_loader_feature_dtype_validation():
    """int8 is a device-store concept: the host loader maps it to the bf16
    wire format; unknown dtypes are rejected."""
    import ml_dtypes

    ds = synthetic_dataset(num_images=4, num_questions=8, v_dim=8, num_ans=5)
    l8 = BatchLoader(ds, 8, 36, shuffle=False, feature_dtype="int8")
    assert l8.feature_dtype == "bfloat16"
    assert next(iter(l8.epoch(0)))["features"].dtype == ml_dtypes.bfloat16
    with pytest.raises(ValueError):
        BatchLoader(ds, 8, 36, shuffle=False, feature_dtype="int4")


def test_fixed36_test_split_fixture_matches_loader_naming(tmp_path):
    """Fixed-layout TEST splits use an underscored '_36' file suffix
    (reference dataset.py:190-192) while train/val use a bare '36';
    write_fixture must emit the names load_feature_store/load_imgid2idx
    look for (round-3 review finding: the test-split fixture was
    unloadable)."""
    from tf_vqa_regat_tpu.data.features import load_feature_store, load_imgid2idx
    from tf_vqa_regat_tpu.data.fixtures import write_fixture

    root = str(tmp_path)
    write_fixture(root, name="test2015", adaptive=False, num_images=3,
                  num_questions=6, v_dim=16, num_ans=5)
    store = load_feature_store(root, "test2015", adaptive=False,
                               relation_type="implicit")
    imgid2idx = load_imgid2idx(root, "test2015", adaptive=False)
    assert store.features.shape[:2] == (3, 36)
    assert len(imgid2idx) == 3


def test_prefetch_producer_exits_when_consumer_abandons():
    """Dropping the prefetch generator mid-epoch (exception in the step
    caught by an outer retry loop) must stop the producer thread instead of
    leaving it blocked on the full queue pinning ~depth device batches
    (round-3 review finding)."""
    import time

    from tf_vqa_regat_tpu.data.loader import prefetch_to_device

    made = []

    def gen():
        for i in range(1000):
            made.append(i)
            yield {"x": np.zeros(4, np.float32)}

    it = prefetch_to_device(gen(), None, depth=2)
    next(it)
    it.close()  # consumer abandons mid-epoch
    time.sleep(1.0)  # > the producer's 0.5 s stop-poll interval
    n1 = len(made)
    time.sleep(1.0)
    assert len(made) == n1, "producer kept drawing batches after close"
    assert n1 < 1000


def test_mmap_compose_guard_is_mode_dependent(tmp_path):
    """--mmap_features + use_both/use_vg only conflict when composition
    actually happens — under --mode train. An eval/predict/serve run whose
    JSON config carries use_both builds the val split alone and must not be
    rejected (round-3 review finding); vqa_cp composes in every mode and is
    always rejected."""
    import pytest

    import main as regat_main
    from tf_vqa_regat_tpu.config import Config

    root = str(tmp_path / "fix")
    write_fixture(root, num_images=6, num_questions=12, v_dim=16, num_ans=7,
                  adaptive=True, name="val")
    base = dict(data_folder=root, adaptive=True, mmap_features=True,
                use_both=True)

    # inference mode: no composition -> loads fine
    train, val, _, _ = regat_main.build_datasets(Config(**base, mode="eval"))
    assert train is None and val is not None and len(val.entries) == 12

    # train mode composes -> loud rejection
    with pytest.raises(ValueError, match="compose"):
        regat_main.build_datasets(Config(**base, mode="train"))

    # vqa_cp merges its base store in every mode -> rejected even for eval
    with pytest.raises(ValueError, match="compose"):
        regat_main.build_datasets(
            Config(data_folder=root, adaptive=True, mmap_features=True,
                   dataset="vqa_cp", mode="eval")
        )


def test_load_entries_empty_split_keeps_2d_q_tokens(tmp_path):
    """A split that yields zero entries must still produce q_tokens with
    shape (0, max_q_len) — np.asarray([]) is 1-D and broke every
    q_tokens.shape[1] consumer far from the cause (round-3 review
    finding)."""
    import json
    import os
    import pickle

    from tf_vqa_regat_tpu.data.entries import load_entries

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "Questions"))
    os.makedirs(os.path.join(root, "cache"))
    with open(
        os.path.join(
            root, "Questions", "v2_OpenEnded_mscoco_val2014_questions.json"
        ), "w",
    ) as fh:
        json.dump({"questions": []}, fh)
    with open(os.path.join(root, "cache", "val_target.pkl"), "wb") as fh:
        pickle.dump([], fh)

    ent = load_entries(root, "val", {}, ["yes"], make_dictionary())
    assert ent.q_tokens.shape == (0, 14)
    assert ent.label_offsets.shape == (1,)


def test_ordering_streams_are_disjoint():
    """The four seeded-stream kinds (epoch perm, batch shuffle, per-shard
    perm, per-shard-per-bucket perm) must never seed identically within one
    run. The previous affine formulas collided across kinds — e.g.
    batch_shuffle(seed, 0) == epoch_perm(seed, 7) and
    shard_perm(seed, 0, s) == epoch_perm(seed, s) — so "distinct" streams
    drew the same permutations (round-3 review finding). Exhaustively checks
    a realistic grid for cross-stream seed collisions."""
    from tf_vqa_regat_tpu.data import ordering as o

    for seed in (0, 1234):
        draws = {}
        def add(kind, rs, *args):
            key = tuple(int(x) for x in rs.randint(0, 2**31, size=3))
            prev = draws.get(key)
            assert prev is None, f"stream collision: {(kind, *args)} == {prev}"
            draws[key] = (kind, *args)

        for epoch in range(10):
            add("epoch_perm", o.epoch_perm_rng(seed, epoch), epoch)
            add("batch_shuffle", o.batch_shuffle_rng(seed, epoch), epoch)
            for shard in range(8):
                add("shard_perm", o.shard_perm_rng(seed, epoch, shard),
                    epoch, shard)
                for bucket in range(3):
                    add("shard_bucket",
                        o.shard_bucket_perm_rng(seed, epoch, shard, bucket),
                        epoch, shard, bucket)


def test_load_tfidf_bounds_check(tmp_path):
    """load_tfidf raises a named error when the precomputed indices span
    more columns than the extended dictionary — the usual cause being a
    missing visualGenome/question_answers.json during the dictionary
    extension pass (which the reference crashes on, dataset.py:396-398, and
    we deliberately warn-and-skip)."""
    import pytest

    import os

    from tf_vqa_regat_tpu.data.glove import load_tfidf

    os.makedirs(str(tmp_path / "tfidf"))
    inds = np.array([[0, 0], [1, 5]], np.int64)  # column 5
    np.save(str(tmp_path / "tfidf" / "indices.npy"), inds)
    np.save(str(tmp_path / "tfidf" / "values.npy"),
            np.ones(2, np.float32))
    with pytest.raises(ValueError, match="extended dictionary"):
        load_tfidf(str(tmp_path), ntoken=3, ext_ntoken=4)
    mat = load_tfidf(str(tmp_path), ntoken=3, ext_ntoken=6)
    assert mat.shape == (3, 6)


def test_tfidf_is_train_only(tmp_path, monkeypatch):
    """--tfidf feeds only the embedding INIT (the model is sized by the
    pre-extension ntoken snapshot and serve's _encode remap makes the
    dictionary extension an inference no-op), so build_datasets runs it only
    under --mode train — the reference does the same (main.py:122,136), and
    running it in eval/predict/serve burned minutes tokenizing ~1.1M
    questions and required train-side files eval-only data folders lack
    (round-3 review finding)."""
    import main as regat_main
    from tf_vqa_regat_tpu.config import Config

    root = str(tmp_path / "fix")
    write_fixture(root, num_images=6, num_questions=12, v_dim=16, num_ans=7,
                  adaptive=True, name="val")
    calls = []
    monkeypatch.setattr(
        regat_main, "tfidf_from_questions",
        lambda names, d, folder: (calls.append(names) or ("TFIDF", "W")),
    )
    base = dict(data_folder=root, adaptive=True, tfidf=True)
    _, _, tfidf, weights = regat_main.build_datasets(Config(**base, mode="eval"))
    assert not calls and tfidf is None and weights is None

    write_fixture(root, num_images=6, num_questions=12, v_dim=16, num_ans=7,
                  adaptive=True, name="train")
    _, _, tfidf, weights = regat_main.build_datasets(Config(**base, mode="train"))
    assert calls == [["train", "val", "test2015"]]
    assert tfidf == "TFIDF" and weights == "W"
