"""Device-resident data path: the on-device gather must produce exactly the
same batches as the host-streaming packer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_vqa_regat_tpu.data.device_store import DeviceStore, build_arrays, gather_batch
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.data.loader import BatchLoader


@pytest.mark.parametrize("adaptive", [True, False])
def test_gather_matches_host_packer(adaptive):
    ds = synthetic_dataset(
        num_images=6, num_questions=20, v_dim=16, num_ans=11, adaptive=adaptive
    )
    R = 40 if adaptive else 36
    store = DeviceStore(ds)
    loader = BatchLoader(ds, batch_size=7, num_rois=R, shuffle=False)

    host_batches = list(loader.epoch(0))
    idx_batches = list(store.epoch_indices(0, 7, shuffle=False, seed=0))
    assert len(host_batches) == len(idx_batches)
    for hb, idx in zip(host_batches, idx_batches):
        db = jax.device_get(
            gather_batch(store.arrays, jnp.asarray(idx), R, 11, store.padding_idx)
        )
        for k in ["features", "norm_bb", "bb", "question", "target"]:
            np.testing.assert_allclose(db[k], hb[k], rtol=1e-6, atol=1e-6, err_msg=k)
        np.testing.assert_array_equal(db["num_boxes"], hb["num_boxes"])
        np.testing.assert_array_equal(db["valid"], hb["valid"])


def test_gather_semantic_adj():
    ds = synthetic_dataset(
        num_images=4, num_questions=8, v_dim=8, num_ans=5, semantic=True
    )
    R = 30
    store = DeviceStore(ds, include_adj=True)
    loader = BatchLoader(ds, 4, R, shuffle=False, include_adj=True)
    hb = next(iter(loader.epoch(0)))
    idx = next(iter(store.epoch_indices(0, 4, False, 0)))
    db = jax.device_get(
        gather_batch(store.arrays, jnp.asarray(idx), R, 5, store.padding_idx)
    )
    np.testing.assert_array_equal(db["adj_label"], hb["adj_label"])


def test_gather_semantic_adj_partial_batch_matches_host():
    """Padded rows of a partial final batch must carry ALL-ZERO adjacency
    like the host packer, not image 0's real labels (safe_idx=0 artifact —
    review finding; the original parity fixture had no partial batch)."""
    ds = synthetic_dataset(
        num_images=4, num_questions=10, v_dim=8, num_ans=5, semantic=True
    )
    R = 30
    store = DeviceStore(ds, include_adj=True)
    loader = BatchLoader(ds, 4, R, shuffle=False, include_adj=True)
    hbs = list(loader.epoch(0))
    idxs = list(store.epoch_indices(0, 4, False, 0))
    assert (idxs[-1] == -1).sum() == 2  # 10 = 4 + 4 + 2: real partial batch
    for hb, idx in zip(hbs, idxs):
        db = jax.device_get(
            gather_batch(store.arrays, jnp.asarray(idx), R, 5, store.padding_idx)
        )
        np.testing.assert_array_equal(db["adj_label"], hb["adj_label"])
    assert np.abs(db["adj_label"][-2:]).sum() == 0  # the padded rows


def test_epoch_indices_shuffle_matches_loader():
    ds = synthetic_dataset(num_images=4, num_questions=33, v_dim=8, num_ans=5)
    store = DeviceStore(ds)
    loader = BatchLoader(ds, 8, 20, shuffle=True, seed=7)
    hb = list(loader.epoch(3))
    idxs = list(store.epoch_indices(3, 8, shuffle=True, seed=7))
    # same permutation stream (shared seeding scheme)
    db = jax.device_get(
        gather_batch(store.arrays, jnp.asarray(idxs[0]), 20, 5, store.padding_idx)
    )
    np.testing.assert_array_equal(db["question"], hb[0]["question"])
    # final partial batch: -1 padding and valid mask
    assert (idxs[-1] == -1).sum() == 8 - 33 % 8
    db_last = jax.device_get(
        gather_batch(store.arrays, jnp.asarray(idxs[-1]), 20, 5, store.padding_idx)
    )
    np.testing.assert_array_equal(db_last["valid"], hb[-1]["valid"])


def test_build_arrays_sizes():
    ds = synthetic_dataset(num_images=4, num_questions=8, v_dim=8, num_ans=5)
    arrays = build_arrays(ds)
    assert arrays["features"].ndim == 2
    assert arrays["questions"].shape == (8, 14)
    assert arrays["labels"].shape[0] == 8


def test_bf16_feature_tables_close_to_f32():
    ds = synthetic_dataset(num_images=4, num_questions=8, v_dim=16, num_ans=5)
    R = 30
    s32 = DeviceStore(ds)
    s16 = DeviceStore(ds, feature_dtype="bfloat16")
    idx = jnp.asarray(next(iter(s32.epoch_indices(0, 8, False, 0))))
    b32 = jax.device_get(gather_batch(s32.arrays, idx, R, 5, s32.padding_idx))
    b16 = jax.device_get(gather_batch(s16.arrays, idx, R, 5, s16.padding_idx))
    assert b16["features"].dtype == np.float32  # re-widened at gather
    np.testing.assert_allclose(b16["features"], b32["features"], rtol=1e-2, atol=1e-2)
    # Boxes must be BIT-exact: they feed the discrete spatial-graph
    # thresholds, where bf16 rounding could flip edge labels.
    np.testing.assert_array_equal(b16["bb"], b32["bb"])
    np.testing.assert_array_equal(b16["norm_bb"], b32["norm_bb"])
    np.testing.assert_array_equal(b16["question"], b32["question"])
    np.testing.assert_array_equal(b16["target"], b32["target"])


def test_bucketed_epoch_coverage_and_homogeneity():
    ds = synthetic_dataset(num_images=16, num_questions=60, v_dim=8, num_ans=5)
    store = DeviceStore(ds)
    buckets = [36, 64, 100]
    seen = []
    for R, idx in store.epoch_indices_bucketed(0, 8, buckets, shuffle=True, seed=1):
        real = idx[idx >= 0]
        seen.extend(real.tolist())
        # homogeneity: every entry's image fits (or truncates into) its bucket
        nb = store.entry_nbox[real]
        assert (nb <= R).all() or R == buckets[-1]
        smaller = [b for b in buckets if b < R]
        if smaller:
            assert (nb > smaller[-1]).all()  # not placeable in a smaller bucket
    assert sorted(seen) == list(range(60))  # exactly once per epoch
    n_steps = store.bucketed_steps_per_epoch(8, buckets)
    assert n_steps == sum(
        1 for _ in store.epoch_indices_bucketed(0, 8, buckets, True, 1)
    )


def test_bucketed_training_runs(tmp_path):
    import jax

    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.train.loop import run_training

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6, imp_pos_emb_dim=16,
        fusion="butd", relation_type="implicit", residual_connection=True,
        epochs=1, batch_size=16, print_freq=100, adaptive=True,
        data_mode="device", roi_buckets="36,64,100",
        output=str(tmp_path) + "/", save_every_epoch=False,
    )
    train = synthetic_dataset(num_images=16, num_questions=64, v_dim=24, num_ans=7)
    val = synthetic_dataset(num_images=8, num_questions=32, v_dim=24, num_ans=7, seed=1)
    params, best = run_training(cfg, train, val)
    assert np.isfinite(best)


def test_blocked_eval_matches_per_batch():
    """build_store_eval_block (one lax.scan program over K index batches,
    tail padded with -1 batches) must produce exactly the metrics of the
    per-batch eval step stream — including a non-multiple-of-K tail."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.models.regat import init_regat
    from tf_vqa_regat_tpu.parallel.mesh import make_mesh
    from tf_vqa_regat_tpu.train.loop import _block_batches
    from tf_vqa_regat_tpu.train.step import (
        build_store_eval_block,
        build_store_eval_step,
    )

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        batch_size=8, adaptive=True, num_rois=40,
    )
    ds = synthetic_dataset(num_images=8, num_questions=43, v_dim=24, num_ans=7)
    store = DeviceStore(ds)
    mesh = make_mesh()
    params = init_regat(jax.random.PRNGKey(0), cfg, ds.ntoken, 24, 7)

    batches = list(store.epoch_indices(0, 8, shuffle=False, seed=0))
    assert len(batches) % 4 != 0  # force a padded tail at K=4

    per_batch = build_store_eval_step(cfg, ds.ntoken, mesh, "jnp", 7, store.padding_idx)
    want = {"loss_sum": 0.0, "score": 0.0, "n": 0.0}
    for idx in batches:
        m = jax.device_get(per_batch(params, store.arrays, jnp.asarray(idx)))
        want["loss_sum"] += float(m["loss"]) * float(m["n"])
        want["score"] += float(m["score"])
        want["n"] += float(m["n"])

    K = 4
    blocked = build_store_eval_block(cfg, ds.ntoken, mesh, "jnp", 7, store.padding_idx, K)
    got = {"loss_sum": 0.0, "score": 0.0, "n": 0.0}
    items = list(_block_batches(((40, b) for b in batches), K, 8))
    assert len(items) == -(-len(batches) // K)
    for R, blk in items:
        assert blk.shape == (K, 8)
        m = jax.device_get(blocked(params, store.arrays, jnp.asarray(blk)))
        got["loss_sum"] += float(m["loss"]) * float(m["n"])
        got["score"] += float(m["score"])
        got["n"] += float(m["n"])

    assert got["n"] == want["n"] == 43
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-6)
    np.testing.assert_allclose(got["loss_sum"], want["loss_sum"], rtol=1e-5)


def test_int8_feature_tables():
    """int8 per-row quantization: gathered features must match f32 within
    the quantization bound (rowmax/254 per element), pads stay exactly zero,
    everything else in the batch is bit-identical, and training runs finite
    on both the replicated and sharded stores."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.device_store import estimate_nbytes, gather_batch

    ds = synthetic_dataset(num_images=8, num_questions=32, v_dim=24, num_ans=7)
    s32 = DeviceStore(ds)
    s8 = DeviceStore(ds, feature_dtype="int8")
    idx = jnp.asarray(np.array([0, 5, 31, -1], np.int32))
    b32 = jax.device_get(gather_batch(s32.arrays, idx, 40, 7, ds.padding_idx))
    b8 = jax.device_get(gather_batch(s8.arrays, idx, 40, 7, ds.padding_idx))
    # quantization bound: |err| <= scale/2 = rowmax/254 per element
    rowmax = np.abs(b32["features"]).max(axis=-1, keepdims=True)
    assert np.all(np.abs(b8["features"] - b32["features"]) <= rowmax / 254 + 1e-7)
    pad = np.arange(40)[None, :] >= b32["num_boxes"][:, None]
    assert (b8["features"][pad] == 0).all()
    for k in ("norm_bb", "bb", "question", "target", "num_boxes", "valid"):
        np.testing.assert_array_equal(b8[k], b32[k], err_msg=k)
    # footprint estimate reflects the 4x feature shrink (+ scale vector)
    est8 = estimate_nbytes(ds, feature_dtype="int8")
    est32 = estimate_nbytes(ds, feature_dtype="float32")
    feat = ds.store.features
    assert est32 - est8 == feat.nbytes - feat.nbytes // 4 - 4 * feat.shape[0]

    # end-to-end: short trainings run finite on device and sharded paths
    from tf_vqa_regat_tpu.train.loop import run_training

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        batch_size=16, adaptive=True, num_rois=40, epochs=1,
        feature_dtype="int8", output="", save_every_epoch=False,
        synthetic=True,
    )
    val = synthetic_dataset(num_images=8, num_questions=16, v_dim=24, num_ans=7, seed=1)
    for mode in ("device", "sharded"):
        params, best = run_training(cfg.replace(data_mode=mode), ds, val)
        assert np.isfinite(best)


@pytest.mark.parametrize("feature_dtype", ["float32", "bfloat16", "int8"])
def test_packed_cache_roundtrip(tmp_path, feature_dtype):
    """--packed_cache: the first build writes the converted table to .npy;
    a second build memory-maps it (no HDF5 read / reconversion) and must
    produce byte-identical tables; a changed source signature rebuilds."""
    import json

    ds = synthetic_dataset(num_images=6, num_questions=24, v_dim=16, num_ans=7)
    cache = str(tmp_path / "pack")

    direct = build_arrays(ds, feature_dtype=feature_dtype)
    first = build_arrays(ds, feature_dtype=feature_dtype, cache_dir=cache)
    files = sorted(p.name for p in (tmp_path / "pack").iterdir())
    assert any(n.endswith(".features.npy") for n in files), files
    assert any(n.endswith(".meta.json") for n in files), files
    assert (feature_dtype == "int8") == any(
        n.endswith(".scale.npy") for n in files
    ), files

    hit = build_arrays(ds, feature_dtype=feature_dtype, cache_dir=cache)
    for k in direct:
        np.testing.assert_array_equal(
            np.asarray(direct[k]), np.asarray(hit[k]), err_msg=k
        )
        np.testing.assert_array_equal(
            np.asarray(first[k]), np.asarray(hit[k]), err_msg=k
        )
    # mmap actually used on hit (not a rebuilt in-RAM copy)
    assert isinstance(np.asarray(hit["features"]).base, np.memmap) or isinstance(
        hit["features"].base, np.memmap
    ) or isinstance(hit["features"], np.memmap)

    # stale meta -> rebuild (not a crash, not a stale read)
    meta = next(p for p in (tmp_path / "pack").iterdir() if p.name.endswith(".meta.json"))
    sig = json.loads(meta.read_text())
    sig["src_shape"] = [999, 1]
    meta.write_text(json.dumps(sig))
    rebuilt = build_arrays(ds, feature_dtype=feature_dtype, cache_dir=cache)
    np.testing.assert_array_equal(
        np.asarray(rebuilt["features"]), np.asarray(direct["features"])
    )
    assert json.loads(meta.read_text())["src_shape"] != [999, 1]


def test_packed_cache_device_store_end_to_end(tmp_path):
    """DeviceStore built from a cache hit gathers identically."""
    ds = synthetic_dataset(num_images=6, num_questions=24, v_dim=16, num_ans=7)
    cache = str(tmp_path / "pack")
    s1 = DeviceStore(ds, feature_dtype="bfloat16", cache_dir=cache)
    s2 = DeviceStore(ds, feature_dtype="bfloat16", cache_dir=cache)
    idx = jnp.asarray(np.arange(8, dtype=np.int32))
    b1 = gather_batch(s1.arrays, idx, 12, ds.num_ans, ds.padding_idx)
    b2 = gather_batch(s2.arrays, idx, 12, ds.num_ans, ds.padding_idx)
    for k in b1:
        np.testing.assert_array_equal(np.asarray(b1[k]), np.asarray(b2[k]), err_msg=k)


def test_packed_cache_detects_content_change(tmp_path):
    """Same-shape, different-content source must MISS the cache (the meta
    fingerprint samples rows, not just the shape) — shape-only matching
    would silently serve stale features after a re-extraction."""
    cache = str(tmp_path / "pack")
    ds_a = synthetic_dataset(
        num_images=6, num_questions=24, v_dim=16, num_ans=7, adaptive=False,
        seed=0,
    )
    ds_b = synthetic_dataset(
        num_images=6, num_questions=24, v_dim=16, num_ans=7, adaptive=False,
        seed=1,
    )
    assert ds_a.store.features.shape == ds_b.store.features.shape
    a = build_arrays(ds_a, cache_dir=cache)
    b = build_arrays(ds_b, cache_dir=cache)
    np.testing.assert_array_equal(
        np.asarray(b["features"]),
        np.asarray(build_arrays(ds_b)["features"]),
    )
    assert not np.array_equal(np.asarray(a["features"]), np.asarray(b["features"]))


def test_duplicate_labels_rejected_loudly():
    """Round-3 review: duplicated answer labels within one entry would make
    the device add-scatter and the host assign-scatter diverge — both paths
    must refuse the corrupt targets instead (reference pickles are
    duplicate-free by construction)."""
    import dataclasses

    from tf_vqa_regat_tpu.data.device_store import pack_soft_targets
    from tf_vqa_regat_tpu.data.loader import BatchLoader

    ds = synthetic_dataset(num_images=4, num_questions=10, v_dim=8, num_ans=7)
    ent = ds.entries
    # corrupt entry 0: duplicate its first label
    labels = ent.labels.copy()
    s = int(ent.label_offsets[0])
    e = int(ent.label_offsets[1])
    assert e - s >= 2, "fixture entry 0 needs >=2 labels for this test"
    labels[s + 1] = labels[s]
    bad = dataclasses.replace(ent, labels=labels)
    with pytest.raises(ValueError, match="duplicate answer labels"):
        pack_soft_targets(bad, ds.num_ans)
    bad_ds = dataclasses.replace(ds, entries=bad)
    with pytest.raises(ValueError, match="duplicate answer labels"):
        BatchLoader(bad_ds, 4, 40, shuffle=False)
    # the clean table passes and matches the dense oracle
    lab, sco = pack_soft_targets(ent, ds.num_ans)
    for i in range(len(ent)):
        t = np.zeros(ds.num_ans, np.float32)
        ok = lab[i] >= 0
        t[lab[i][ok]] = sco[i][ok]
        np.testing.assert_array_equal(t, ent.dense_target(i, ds.num_ans))


def test_shared_store_datasets_share_device_tables():
    """Two datasets over ONE FeatureStore (the VQA-CP shape: train/test on
    the merged COCO table) must share a single upload of the image-level
    tables — same jax array objects, no second conversion (review finding:
    2x startup + 2x HBM) — while entry-level tables stay per-split."""
    ds_a = synthetic_dataset(
        num_images=4, num_questions=8, v_dim=8, num_ans=5, semantic=True
    )
    ds_b = synthetic_dataset(
        num_images=4, num_questions=6, v_dim=8, num_ans=5, semantic=True, seed=1
    )
    ds_b.store = ds_a.store  # the CP sharing pattern (load_vqa_cp_base)
    sa = DeviceStore(ds_a, include_adj=True)
    sb = DeviceStore(ds_b, include_adj=True)
    for k in ("features", "norm_bb", "bb", "img_start", "img_len", "adj"):
        assert sa.arrays[k] is sb.arrays[k], k
    assert sa.arrays["questions"] is not sb.arrays["questions"]
    assert sb.arrays["questions"].shape[0] == 6

    # a different dtype must NOT hit the memo
    sc = DeviceStore(ds_b, include_adj=True, feature_dtype="int8")
    assert sc.arrays["features"] is not sa.arrays["features"]

    # batches from the shared tables still match the host packer
    loader = BatchLoader(ds_b, 4, 20, shuffle=False, include_adj=True)
    hb = next(iter(loader.epoch(0)))
    idx = next(iter(sb.epoch_indices(0, 4, False, 0)))
    db = jax.device_get(
        gather_batch(sb.arrays, jnp.asarray(idx), 20, 5, sb.padding_idx)
    )
    for k in ("features", "target", "question", "adj_label", "num_boxes"):
        np.testing.assert_allclose(db[k], hb[k], err_msg=k)
