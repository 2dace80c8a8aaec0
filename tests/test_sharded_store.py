"""Data-axis-sharded device store on the virtual 8-device mesh: coverage,
gather correctness, and a training step over purely-local gathers."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.data.sharded_store import (
    ShardedDeviceStore,
    _assign_images,
    build_sharded_gather,
)
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import (
    build_sharded_store_train_step,
    init_train_state,
)

R = 40
NUM_ANS = 11


def _mesh():
    return make_mesh(dp_size=8, tp_size=1)


def test_assign_images_balanced():
    counts = np.array([100, 90, 80, 10, 10, 10, 10, 10, 5, 5])
    buckets = _assign_images(counts, 4)
    loads = sorted(int(counts[b].sum()) for b in buckets)
    assert loads[-1] - loads[0] <= 100  # bounded imbalance
    all_imgs = sorted(int(i) for b in buckets for i in b)
    assert all_imgs == list(range(10))


def test_epoch_covers_every_entry_once_with_correct_data():
    ds = synthetic_dataset(num_images=12, num_questions=50, v_dim=16, num_ans=NUM_ANS)
    mesh = _mesh()
    store = ShardedDeviceStore(ds, mesh)
    gather = jax.jit(build_sharded_gather(mesh, R, NUM_ANS, store.padding_idx))
    bspec = batch_sharding(mesh)

    seen_targets = []
    feat_sum = 0.0
    n_seen = 0
    for idx in store.epoch_indices(0, batch_size=16, shuffle=True, seed=3):
        b = jax.device_get(gather(store.arrays, jax.device_put(idx, bspec)))
        v = b["valid"]
        n_seen += int(v.sum())
        seen_targets.append(b["target"][v])
        feat_sum += float(b["features"][v].sum())
    assert n_seen == 50

    # permutation-invariant checksum: per-entry target sums match the dataset
    got = np.sort(np.concatenate(seen_targets).sum(axis=1))
    want = []
    ent = ds.entries
    for i in range(50):
        s, e = ent.label_offsets[i], ent.label_offsets[i + 1]
        want.append(ent.scores[s:e].sum())
    np.testing.assert_allclose(got, np.sort(np.asarray(want)), rtol=1e-5)

    # feature checksum: every entry contributes its image's (clipped) features
    want_feat = 0.0
    for i in range(50):
        f, _, _ = ds.store.image_slice(ent.image_index[i])
        want_feat += float(f[:R].sum())
    np.testing.assert_allclose(feat_sum, want_feat, rtol=1e-4)


def test_sharded_train_step_runs_and_is_finite():
    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6, imp_pos_emb_dim=16,
        fusion="butd", relation_type="implicit", residual_connection=True,
        num_rois=R,
    )
    ds = synthetic_dataset(num_images=12, num_questions=64, v_dim=32, num_ans=NUM_ANS)
    mesh = _mesh()
    store = ShardedDeviceStore(ds, mesh)
    ntoken = ds.dictionary.ntoken
    params = init_regat(jax.random.PRNGKey(0), cfg, ntoken, 32, NUM_ANS)
    opt = make_optimizer(1e-3, 0.25, 4, 0.75, 2, trainable_mask(params, False))
    state = init_train_state(params, opt, mesh)
    step = build_sharded_store_train_step(
        cfg, ntoken, opt, mesh, "jnp", params, NUM_ANS, store.padding_idx
    )
    bspec = batch_sharding(mesh)
    losses = []
    for epoch in range(2):
        for idx in store.epoch_indices(epoch, 16, shuffle=True, seed=0):
            state, m = step(
                state, store.arrays, jax.device_put(idx, bspec), jax.random.PRNGKey(1)
            )
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert step._cache_size() == 1


def test_sharded_blocked_eval_matches_per_batch():
    """build_sharded_store_eval_block (one lax.scan program over K index
    batches gathered via shard_map) must reproduce the per-batch sharded
    eval stream exactly, including the -1-padded tail block."""
    from tf_vqa_regat_tpu.train.loop import _block_batches
    from tf_vqa_regat_tpu.train.step import (
        build_sharded_store_eval_block,
        build_sharded_store_eval_step,
    )

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        batch_size=8, adaptive=True, num_rois=R,
    )
    ds = synthetic_dataset(num_images=8, num_questions=43, v_dim=24, num_ans=NUM_ANS)
    mesh = _mesh()
    store = ShardedDeviceStore(ds, mesh)
    params = init_regat(jax.random.PRNGKey(0), cfg, ds.ntoken, 24, NUM_ANS)

    batches = list(store.epoch_indices(0, 8, shuffle=False, seed=0))
    K = 4
    assert len(batches) % K != 0  # force a padded tail

    per_batch = build_sharded_store_eval_step(
        cfg, ds.ntoken, mesh, "jnp", NUM_ANS, store.padding_idx
    )
    want = {"loss_sum": 0.0, "score": 0.0, "n": 0.0}
    for idx in batches:
        m = jax.device_get(per_batch(params, store.arrays, jnp.asarray(idx)))
        want["loss_sum"] += float(m["loss"]) * float(m["n"])
        want["score"] += float(m["score"])
        want["n"] += float(m["n"])

    blocked = build_sharded_store_eval_block(
        cfg, ds.ntoken, mesh, "jnp", NUM_ANS, store.padding_idx, K
    )
    got = {"loss_sum": 0.0, "score": 0.0, "n": 0.0}
    for _, blk in _block_batches(((R, b) for b in batches), K, 8):
        m = jax.device_get(blocked(params, store.arrays, jnp.asarray(blk)))
        got["loss_sum"] += float(m["loss"]) * float(m["n"])
        got["score"] += float(m["score"])
        got["n"] += float(m["n"])

    assert got["n"] == want["n"] == 43
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-6)
    np.testing.assert_allclose(got["loss_sum"], want["loss_sum"], rtol=1e-5)


def test_sharded_bucketed_coverage_and_homogeneity():
    """epoch_indices_bucketed: every entry exactly once per epoch, each batch
    homogeneous in its bucket (valid entries' box counts <= R, and > the
    previous bucket unless clamped), SPMD-consistent [dp, per] segments."""
    ds = synthetic_dataset(num_images=12, num_questions=50, v_dim=16, num_ans=NUM_ANS)
    mesh = _mesh()
    store = ShardedDeviceStore(ds, mesh)
    buckets = [36, 64, 100]
    dp, batch = 8, 16
    per = batch // dp
    seen = []
    for R, idx in store.epoch_indices_bucketed(0, batch, buckets, True, seed=3):
        assert R in buckets
        blk = idx.reshape(dp, per)
        for s in range(dp):
            for local in blk[s]:
                if local < 0:
                    continue
                g = int(store.local_to_global[s, local])
                assert g >= 0
                seen.append(g)
                nb = int(store._local_entry_nbox[s][local])
                assert min(nb, max(buckets)) <= R  # fits (oversize clamps)
    assert sorted(seen) == list(range(50))
    # schedule length matches the advertised step count
    n_jobs = len(list(store.epoch_indices_bucketed(0, batch, buckets, True, 3)))
    assert n_jobs == store.bucketed_steps_per_epoch(batch, buckets)


def test_sharded_bucketed_eval_matches_unbucketed(tmp_path):
    """run_evaluation with --data_mode sharded --roi_buckets must reproduce
    the unbucketed sharded eval exactly: eval metrics are additive over
    entries and per-entry outputs are invariant to padding depth (tested
    property), so only the batch composition changes."""
    from tf_vqa_regat_tpu.train.logging import Logger
    from tf_vqa_regat_tpu.train.loop import run_evaluation

    ds = synthetic_dataset(
        num_images=10, num_questions=40, v_dim=16, num_ans=NUM_ANS, name="val"
    )
    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, batch_size=16, adaptive=True,
        data_mode="sharded", eval_batch=16, eval_block=2,
    )
    params = init_regat(jax.random.PRNGKey(0), cfg, ds.ntoken, 16, NUM_ANS)
    logger = Logger(str(tmp_path / "log.txt"))
    score0, loss0, _ = run_evaluation(cfg, ds, params, logger)
    score1, loss1, _ = run_evaluation(
        cfg.replace(roi_buckets="36,100"), ds, params, logger
    )
    np.testing.assert_allclose(score1, score0, rtol=1e-5)
    np.testing.assert_allclose(loss1, loss0, rtol=1e-5)


def test_sharded_bucketed_training_runs(tmp_path):
    """Two bucketed sharded train epochs through the production _DataPath:
    finite metrics, every entry visited once per epoch."""
    from tf_vqa_regat_tpu.data.loader import BatchLoader
    from tf_vqa_regat_tpu.parallel.mesh import batch_sharding as bs
    from tf_vqa_regat_tpu.train.loop import _DataPath

    ds = synthetic_dataset(num_images=10, num_questions=40, v_dim=16, num_ans=NUM_ANS)
    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, batch_size=16, adaptive=True,
        data_mode="sharded", roi_buckets="36,100", eval_batch=16,
    )
    mesh = _mesh()
    train_loader = BatchLoader(ds, cfg.batch_size, 100, shuffle=True)
    eval_loader = BatchLoader(ds, 16, 100, shuffle=False)
    data = _DataPath(cfg, ds, ds, train_loader, eval_loader, mesh, bs(mesh))
    params = init_regat(jax.random.PRNGKey(0), cfg, ds.ntoken, 16, NUM_ANS)
    opt = make_optimizer(
        cfg.base_lr, cfg.grad_clip, data.steps_per_epoch, 0.75, 2,
        trainable_mask(params, False),
    )
    state = init_train_state(params, opt, mesh)
    data.build_steps(ds.ntoken, opt, params, "jnp")
    rng = jax.random.PRNGKey(1)
    # the production dispatch stream (train_stream, not the raw train_iter):
    # under the auto --train_block default this is the BLOCKED sharded path
    # (build_sharded_store_train_block's lax.cond-around-shard_map-gather
    # tail skip — round-3 advisor finding: previously untested), and nsteps
    # accounts the real batches per dispatched block
    for epoch in range(2):
        n, steps = 0.0, 0
        for nsteps, item in data.train_stream(epoch):
            state, m = data.train_call(state, item, rng)
            m = jax.device_get(m)
            assert np.isfinite(m["loss"])
            n += float(m["n"])
            steps += nsteps
        assert n == 40  # every entry exactly once per epoch
        assert steps == data.steps_per_epoch == 4


def test_sharded_semantic_adjacency_matches_device(tmp_path):
    """Semantic relations at sharded scale: the per-shard adjacency table
    (ordered by local image slot) must reproduce the replicated device-store
    eval exactly — same entries, same per-entry edge labels, additive
    metrics."""
    from tf_vqa_regat_tpu.train.logging import Logger
    from tf_vqa_regat_tpu.train.loop import run_evaluation

    ds = synthetic_dataset(
        num_images=10, num_questions=40, v_dim=16, num_ans=NUM_ANS,
        semantic=True, name="val",
    )
    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        fusion="butd", relation_type="semantic", residual_connection=True,
        batch_size=16, adaptive=True, eval_batch=16, eval_block=2,
        num_rois=40,
    )
    params = init_regat(jax.random.PRNGKey(0), cfg, ds.ntoken, 16, NUM_ANS)
    logger = Logger(str(tmp_path / "log.txt"))
    score_dev, loss_dev, _ = run_evaluation(
        cfg.replace(data_mode="device"), ds, params, logger
    )
    score_sh, loss_sh, _ = run_evaluation(
        cfg.replace(data_mode="sharded"), ds, params, logger
    )
    np.testing.assert_allclose(score_sh, score_dev, rtol=1e-5)
    np.testing.assert_allclose(loss_sh, loss_dev, rtol=1e-5)


def test_estimate_sharded_nbytes_matches_built_store():
    """The metadata-only sizing function must reproduce the ACTUAL per-shard
    footprint of a constructed store exactly (same greedy assignment, same
    pad-to-max layout) — it is what resolve_data_mode trusts to promote
    'auto' onto the sharded path before anything is built."""
    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes

    ds = synthetic_dataset(
        num_images=12, num_questions=50, v_dim=16, num_ans=NUM_ANS, seed=5
    )
    mesh = _mesh()
    for dtype in ("float32", "bfloat16", "int8"):
        store = ShardedDeviceStore(ds, mesh, False, dtype)
        actual = sum(int(a.nbytes) for a in store.arrays.values()) // 8
        est = estimate_sharded_nbytes(ds, False, dtype, 8)
        assert est == actual, (dtype, est, actual)


def test_estimate_sharded_nbytes_counts_adjacency_both_families():
    """include_adj sizing must match the constructor flag-for-flag for BOTH
    adjacency families. (The production resolve path passes include_adj only
    for semantic — build_store never ships spatial adjacency to the sharded
    store — but a direct construction with include_adj=True must still size
    exactly; see test_resolve_spatial_sharded_skips_phantom_adjacency for
    the production-policy side.)"""
    import dataclasses

    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes

    ds = synthetic_dataset(
        num_images=12, num_questions=50, v_dim=16, num_ans=NUM_ANS, seed=5,
        semantic=True,
    )
    mesh = _mesh()
    spatial_ds = dataclasses.replace(ds, relation_type="spatial")
    spatial_ds.store.spatial_adj = ds.store.semantic_adj  # any [n,100,100] int8
    for case in (ds, spatial_ds):
        store = ShardedDeviceStore(case, mesh, True, "float32")
        assert store.has_adj, case.relation_type
        actual = sum(int(a.nbytes) for a in store.arrays.values()) // 8
        est = estimate_sharded_nbytes(case, True, "float32", 8)
        assert est == actual, (case.relation_type, est, actual)


def test_resolve_data_mode_matrix():
    """Round-2 verdict #1: the 'auto' policy resolution matrix. Budgets are
    derived from the dataset's own estimates so the test pins the POLICY,
    not fixture-size magic numbers: small -> device; too big to replicate
    but per-shard fits at dp=8 -> sharded; dp=1 -> host (sharding can't
    help); the same dp=1 split at int8 (4x smaller) -> device; too big even
    per shard -> host; forced modes always win."""
    from tf_vqa_regat_tpu.data.device_store import estimate_nbytes
    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes
    from tf_vqa_regat_tpu.train.loop import resolve_data_mode

    ds = synthetic_dataset(
        num_images=16, num_questions=64, v_dim=32, num_ans=NUM_ANS, seed=2
    )
    e_dev = {
        dt: estimate_nbytes(ds, False, dt) for dt in ("float32", "int8")
    }
    e_sh8 = estimate_sharded_nbytes(ds, False, "float32", 8)
    assert e_sh8 < e_dev["float32"]  # sharding actually shrinks the slice

    def cfg(budget_bytes, **kw):
        return Config(batch_size=8, adaptive=True,
                      device_store_budget_gb=budget_bytes / 1e9, **kw)

    # generous budget: replicate
    c = cfg(e_dev["float32"] + 1)
    assert resolve_data_mode(c, ds, None, False, dp=8) == "device"
    # too big to replicate, per-shard slice fits, dp=8: sharded
    c = cfg((e_sh8 + e_dev["float32"]) // 2)
    assert resolve_data_mode(c, ds, None, False, dp=8) == "sharded"
    # same budget at dp=1: sharding unavailable -> host
    assert resolve_data_mode(c, ds, None, False, dp=1) == "host"
    # ... but int8 shrinks the replicated table 4x under the same budget
    assert e_dev["int8"] < (e_sh8 + e_dev["float32"]) // 2
    c8 = cfg((e_sh8 + e_dev["float32"]) // 2, feature_dtype="int8")
    assert resolve_data_mode(c8, ds, None, False, dp=1) == "device"
    # too big even per shard -> host
    c = cfg(e_sh8 // 2)
    assert resolve_data_mode(c, ds, None, False, dp=8) == "host"
    # train_ds present halves the per-store budget: device flips to sharded
    c = cfg(2 * ((e_sh8 + e_dev["float32"]) // 2))
    assert resolve_data_mode(c, ds, None, False, dp=8) == "device"
    assert resolve_data_mode(c, ds, ds, False, dp=8) == "sharded"
    # forced modes bypass the estimates entirely
    for forced in ("device", "sharded", "host"):
        c = cfg(1, data_mode=forced)
        assert resolve_data_mode(c, ds, None, False, dp=8) == forced
    # extra_bytes (ensemble adjacency) can push device over the edge
    c = cfg(e_dev["float32"] + 1)
    assert (
        resolve_data_mode(c, ds, None, False, dp=8, extra_bytes=10**6)
        == "sharded"
    )
    # ... and the sharded check sizes extras by the caller's PER-SHARD
    # figure when given (padded-per-image tables are bigger than total/dp):
    # an extra that fits at total/dp but not at its true padded size must
    # demote sharded -> host
    room = (e_sh8 + e_dev["float32"]) // 2 - e_sh8  # sharded headroom
    assert (
        resolve_data_mode(
            c.replace(device_store_budget_gb=((e_sh8 + e_dev["float32"]) // 2) / 1e9),
            ds, None, False, dp=8,
            extra_bytes=room, extra_bytes_sharded=room + 1,
        )
        == "host"
    )


def test_resolve_spatial_sharded_skips_phantom_adjacency():
    """A SPATIAL split must be sized for what build_store actually ships to
    the sharded store — features only (spatial adjacency builds in-jit from
    boxes, train/loop.py build_store) — not charged a phantom per-shard
    adjacency table. Budget sits between the features-only slice and the
    adjacency-inflated figure: before the resolve fix this demoted to
    'host'; the correct resolution is 'sharded'."""
    import dataclasses

    from tf_vqa_regat_tpu.data.device_store import estimate_nbytes
    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes
    from tf_vqa_regat_tpu.train.loop import resolve_data_mode

    base = synthetic_dataset(
        num_images=12, num_questions=50, v_dim=16, num_ans=NUM_ANS, seed=7,
        semantic=True,
    )
    ds = dataclasses.replace(base, relation_type="spatial")
    ds.store.spatial_adj = base.store.semantic_adj  # any [n,100,100] int8

    e_dev = estimate_nbytes(ds, True, "float32")  # replicated, incl. adj
    e_feat = estimate_sharded_nbytes(ds, False, "float32", 8)  # shipped
    e_adj = estimate_sharded_nbytes(ds, True, "float32", 8)  # phantom
    assert e_feat < e_adj < e_dev  # adjacency dominates at these dims

    budget = (e_feat + e_adj) // 2
    cfg = Config(batch_size=8, adaptive=True, relation_type="spatial",
                 device_store_budget_gb=budget / 1e9)
    assert resolve_data_mode(cfg, ds, None, True, dp=8) == "sharded"
    # dp=1 cannot shard: falls to host as before
    assert resolve_data_mode(cfg, ds, None, True, dp=1) == "host"


def test_sharded_packed_cache_roundtrip(tmp_path):
    """--packed_cache for the SHARDED store (where real training lands):
    first build writes the per-shard feature table, a rebuild memory-maps
    it with byte-identical device arrays for every dtype, the key includes
    dp, and a stale signature rebuilds instead of serving old bytes."""
    import json

    ds = synthetic_dataset(
        num_images=12, num_questions=50, v_dim=16, num_ans=NUM_ANS, seed=4
    )
    mesh = _mesh()
    cache = str(tmp_path / "pack")
    for dtype in ("float32", "bfloat16", "int8"):
        direct = ShardedDeviceStore(ds, mesh, False, dtype)
        miss = ShardedDeviceStore(ds, mesh, False, dtype, cache)
        hit = ShardedDeviceStore(ds, mesh, False, dtype, cache)
        for k in direct.arrays:
            a = np.asarray(jax.device_get(direct.arrays[k]))
            np.testing.assert_array_equal(
                a, np.asarray(jax.device_get(miss.arrays[k])), err_msg=k
            )
            np.testing.assert_array_equal(
                a, np.asarray(jax.device_get(hit.arrays[k])), err_msg=k
            )
    names = sorted(p.name for p in (tmp_path / "pack").iterdir())
    assert any("sharded8" in n and n.endswith(".features.npy") for n in names), names
    assert any(n.endswith(".scale.npy") for n in names), names  # int8 run

    # stale meta (e.g. re-extracted features) -> rebuild, then re-cache
    meta = next(
        p for p in (tmp_path / "pack").iterdir()
        if "float32" in p.name and p.name.endswith(".meta.json")
    )
    sig = json.loads(meta.read_text())
    sig["src_sha1"] = "0" * 40
    meta.write_text(json.dumps(sig))
    rebuilt = ShardedDeviceStore(ds, mesh, False, "float32", cache)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(rebuilt.arrays["features"])),
        np.asarray(jax.device_get(ShardedDeviceStore(ds, mesh, False, "float32").arrays["features"])),
    )
    assert json.loads(meta.read_text())["src_sha1"] != "0" * 40


def test_sharded_store_from_mmap_matches_materialized(tmp_path):
    """--mmap_features + --data_mode sharded: the per-image fill reads
    contiguous slices from the live h5py dataset and must produce the exact
    tables the fully-materialized load produces (the realistic big-split
    configuration: lazy HDF5 -> per-shard bf16 tables)."""
    from tf_vqa_regat_tpu.data.features import load_vqa_dataset
    from tf_vqa_regat_tpu.data.fixtures import make_dictionary, write_fixture

    root = str(tmp_path / "fix")
    write_fixture(root, num_images=10, num_questions=30, v_dim=16,
                  num_ans=NUM_ANS, adaptive=True, name="train", seed=6)
    d = make_dictionary()
    ds_mat = load_vqa_dataset("train", d, "implicit", root, adaptive=True)
    ds_mm = load_vqa_dataset(
        "train", d, "implicit", root, adaptive=True, mmap=True
    )
    assert ds_mm.store.features_lazy and not ds_mat.store.features_lazy
    mesh = _mesh()
    for dtype in ("float32", "bfloat16"):
        a = ShardedDeviceStore(ds_mat, mesh, False, dtype).arrays
        b = ShardedDeviceStore(ds_mm, mesh, False, dtype).arrays
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(jax.device_get(a[k])),
                np.asarray(jax.device_get(b[k])), err_msg=(dtype, k),
            )


def _real_scale_split(name, rows, n_img, n_entries):
    """Metadata-only dataset at the REAL adaptive split's scale (REALDATA.md
    memory table): broadcast views give the estimators true .nbytes/.shape
    without allocating the ~58 GB; pos_boxes/entries are real (tiny)."""
    from tf_vqa_regat_tpu.data.dictionary import Dictionary
    from tf_vqa_regat_tpu.data.entries import EntryTable
    from tf_vqa_regat_tpu.data.features import FeatureStore, VQADataset

    z32 = np.zeros((), np.float32)
    bounds = np.linspace(0, rows, n_img + 1).astype(np.int64)
    store = FeatureStore(
        adaptive=True,
        features=np.broadcast_to(z32, (rows, 2048)),
        normalized_bb=np.broadcast_to(z32, (rows, 6)),
        bb=np.broadcast_to(z32, (rows, 4)),
        pos_boxes=np.stack([bounds[:-1], bounds[1:]], 1),
    )
    ent = EntryTable(
        question_ids=np.zeros(n_entries, np.int64),
        image_ids=np.zeros(n_entries, np.int64),
        image_index=(np.arange(n_entries) % n_img).astype(np.int32),
        q_tokens=np.broadcast_to(np.int32(0), (n_entries, 14)),
        label_offsets=np.zeros(n_entries + 1, np.int64),
        labels=np.zeros(0, np.int32),
        scores=np.zeros(0, np.float32),
        has_answers=True,
    )
    return VQADataset(
        name=name, entries=ent, store=store, num_ans=3129, label2ans=[],
        dictionary=Dictionary(), relation_type="implicit", ntoken=19901,
    )


def test_resolve_data_mode_at_real_dataset_scale():
    """REALDATA.md's production promises, pinned against the REAL estimators
    at the documented scale (train ~7.1M rows / 82,783 images / 443,757
    entries; val ~3.4M / 40,504 / 214,354): the memory table's GB figures,
    bf16 auto->sharded on v5e-8 at the default budget, the documented f32
    default-budget trap (host) and its two remedies, and int8 single-chip
    (serve capacity claim)."""
    from tf_vqa_regat_tpu.data.device_store import estimate_nbytes
    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes
    from tf_vqa_regat_tpu.train.loop import resolve_data_mode

    train = _real_scale_split("train", 7_080_000, 82_783, 443_757)
    val = _real_scale_split("val", 3_420_000, 40_504, 214_354)

    # the REALDATA memory table (feature-dominated; meta adds <0.5 GB)
    np.testing.assert_allclose(
        estimate_nbytes(train, False, "float32"), 58e9, rtol=0.02
    )
    np.testing.assert_allclose(
        estimate_nbytes(train, False, "bfloat16"), 29e9, rtol=0.03
    )
    np.testing.assert_allclose(
        estimate_nbytes(train, False, "int8"), 14.7e9, rtol=0.03
    )
    np.testing.assert_allclose(
        estimate_nbytes(val, False, "float32"), 28e9, rtol=0.02
    )
    np.testing.assert_allclose(  # bf16 per-shard ~3.6 GB at dp=8
        estimate_sharded_nbytes(train, False, "bfloat16", 8), 3.66e9, rtol=0.02
    )

    def cfg(dtype, budget=8.0):
        return Config(
            batch_size=256, adaptive=True, feature_dtype=dtype,
            device_store_budget_gb=budget,
        )

    # run 2 (bf16) on v5e-8 at the DEFAULT budget: auto -> sharded
    assert resolve_data_mode(cfg("bfloat16"), val, train, False, dp=8) == "sharded"
    # run 1 (f32): per-shard ~7.3 GB exceeds the halved default budget ->
    # host (the documented trap; --roi_buckets then rejects it loudly) ...
    assert resolve_data_mode(cfg("float32"), val, train, False, dp=8) == "host"
    # ... remedied by the playbook's --device_store_budget_gb 15
    assert (
        resolve_data_mode(cfg("float32", 15.0), val, train, False, dp=8)
        == "sharded"
    )
    # ... or by forcing --data_mode sharded outright
    forced = Config(
        batch_size=256, adaptive=True, feature_dtype="float32",
        data_mode="sharded",
    )
    assert resolve_data_mode(forced, val, train, False, dp=8) == "sharded"
    # int8 on ONE chip, eval-only (serve): ~14.8 GB fits a raised 16 GB
    # budget (REALDATA: "raise --device_store_budget_gb deliberately")
    assert resolve_data_mode(cfg("int8", 16.0), train, None, False, dp=1) == "device"
    assert resolve_data_mode(cfg("int8"), train, None, False, dp=1) == "host"
