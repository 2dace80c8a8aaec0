"""Checkpoint/resume: roundtrip equality and the fault-injection contract —
killing training between epochs and resuming must reproduce the uninterrupted
run's numbers (SURVEY §5 failure-detection row)."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.data.loader import BatchLoader
from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
from tf_vqa_regat_tpu.train import checkpoint as ckpt
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import build_train_step, init_train_state

CFG = Config(
    num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6, imp_pos_emb_dim=16,
    fusion="butd", relation_type="implicit", residual_connection=True,
    base_lr=5e-3,
)


def _setup():
    ds = synthetic_dataset(num_images=8, num_questions=64, v_dim=32, num_ans=9)
    ntoken = ds.dictionary.ntoken
    mesh = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
    params = init_regat(jax.random.PRNGKey(0), CFG, ntoken, 32, 9)
    mask = trainable_mask(params, False)
    opt = make_optimizer(CFG.base_lr, CFG.grad_clip, 4, 0.75, 2, mask)
    state = init_train_state(params, opt, mesh)
    step = build_train_step(CFG, ntoken, opt, mesh, "jnp", params)
    loader = BatchLoader(ds, 16, 12, shuffle=False)
    return mesh, state, step, loader


def test_checkpoint_roundtrip(tmp_path):
    out = str(tmp_path / "run") + "/"
    mesh, state, step, loader = _setup()
    batch = jax.device_put(next(iter(loader.epoch(0))), batch_sharding(mesh))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    ckpt.save_checkpoint(out, state, epoch=0, best_score=1.5, is_best=True)

    _, fresh, _, _ = _setup()
    latest = ckpt.latest_checkpoint(out)
    assert latest is not None and latest.endswith("epoch_0000")
    restored = ckpt.restore_checkpoint(latest, fresh)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state),
        jax.device_get(restored),
    )
    epoch, best = ckpt.restore_meta(out)
    assert epoch == 0 and best == 1.5


def test_kill_and_resume_reproduces_uninterrupted_run(tmp_path):
    out = str(tmp_path / "run") + "/"
    rng = jax.random.PRNGKey(1)

    # Uninterrupted: 4 steps.
    mesh, state, step, loader = _setup()
    batches = [
        jax.device_put(b, batch_sharding(mesh)) for b in list(loader.epoch(0))
    ]
    losses_full = []
    for b in batches:
        state, m = step(state, b, rng)
        losses_full.append(float(m["loss"]))
    params_full = jax.device_get(state["params"])

    # Interrupted: 2 steps, save, "crash", restore, 2 more steps.
    mesh, state, step, loader = _setup()
    for b in batches[:2]:
        state, m = step(state, b, rng)
    ckpt.save_checkpoint(out, state, epoch=0, best_score=0.0, is_best=False)
    del state

    _, fresh, step2, _ = _setup()
    state2 = ckpt.restore_checkpoint(ckpt.latest_checkpoint(out), fresh)
    losses_resumed = []
    for b in batches[2:]:
        state2, m = step2(state2, b, rng)
        losses_resumed.append(float(m["loss"]))
    np.testing.assert_allclose(losses_resumed, losses_full[2:], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        params_full,
        jax.device_get(state2["params"]),
    )


def _run_cfg(out_dir, **kw):
    base = dict(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, epochs=2, batch_size=16, print_freq=100,
        base_lr=5e-3, output=str(out_dir) + "/",
    )
    base.update(kw)
    return Config(**base)


def _datasets():
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset

    train = synthetic_dataset(num_images=8, num_questions=64, v_dim=24, num_ans=7)
    val = synthetic_dataset(num_images=4, num_questions=16, v_dim=24, num_ans=7, seed=1)
    return train, val


def _read_metrics(out):
    import json
    import os

    with open(os.path.join(out, "metrics.jsonl")) as fh:
        return {rec["epoch"]: rec for rec in map(json.loads, fh)}


def test_mid_epoch_preempt_and_resume_reproduces_uninterrupted_run(
    tmp_path, monkeypatch
):
    """Fault injection mid-epoch: a simulated preemption at global step 6
    (epoch 1, step 2 of 4) saves a step checkpoint; resuming reproduces the
    uninterrupted run's parameters and per-epoch metrics exactly — data order
    (seeded permutation skip), dropout stream (state step counter) and the
    epoch metric accumulators all restore."""
    import os

    import pytest

    from tf_vqa_regat_tpu.train.loop import Preempted, run_training

    train, val = _datasets()

    # train_block=1 pins PER-STEP dispatch: this test's contract is a save
    # at an arbitrary step (2 of 4) — under the auto-blocked default the
    # whole 4-step epoch is one dispatch and the only boundary is the epoch
    # end (the block-granularity variant is tested separately below).
    cfg_a = _run_cfg(tmp_path / "a", train_block=1)
    params_a, best_a = run_training(cfg_a, train, val)
    metrics_a = _read_metrics(cfg_a.output)

    # no ckpt yet: fresh start
    cfg_b = _run_cfg(tmp_path / "b", resume=True, train_block=1)
    monkeypatch.setenv("REGAT_FAULT_PREEMPT_STEP", "6")
    with pytest.raises(Preempted):
        run_training(cfg_b, train, val)
    meta = ckpt.restore_meta_full(cfg_b.output)
    assert meta["epoch"] == 1 and meta["step_in_epoch"] == 2
    assert "_step_" in meta["dir"]
    assert set(meta["acc"]) == {"score", "loss_sum", "n"}

    monkeypatch.delenv("REGAT_FAULT_PREEMPT_STEP")
    params_b, best_b = run_training(cfg_b, train, val)

    assert best_b == best_a
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        jax.device_get(params_a),
        jax.device_get(params_b),
    )
    metrics_b = _read_metrics(cfg_b.output)
    for epoch in (0, 1):
        for key in ("train_loss", "train_score", "eval_score", "eval_loss"):
            np.testing.assert_allclose(
                metrics_b[epoch][key], metrics_a[epoch][key], rtol=1e-6,
                err_msg=f"epoch {epoch} {key}",
            )
    # the final epoch save supersedes (prunes) every step checkpoint
    root = os.path.join(cfg_b.output, "checkpoints")
    assert not [d for d in os.listdir(root) if "_step_" in d]
    assert ckpt.latest_checkpoint(cfg_b.output).endswith("epoch_0001")


def test_blocked_preempt_and_resume_reproduces_uninterrupted_run(
    tmp_path, monkeypatch
):
    """Blocked training's preemption contract: dispatch boundaries are BLOCK
    boundaries, so a fault injected INSIDE a block (global step 5, mid-block
    under --train_block 2 at 4 steps/epoch) fires at the next boundary
    (step 6 = epoch 1, block 1) and saves there; resuming consumes the skip
    in whole blocks and reproduces the uninterrupted blocked run exactly."""
    import os

    import pytest

    from tf_vqa_regat_tpu.train.loop import Preempted, run_training

    train, val = _datasets()

    cfg_a = _run_cfg(tmp_path / "a", train_block=2)
    params_a, best_a = run_training(cfg_a, train, val)
    metrics_a = _read_metrics(cfg_a.output)

    cfg_b = _run_cfg(tmp_path / "b", resume=True, train_block=2)
    monkeypatch.setenv("REGAT_FAULT_PREEMPT_STEP", "5")
    with pytest.raises(Preempted):
        run_training(cfg_b, train, val)
    meta = ckpt.restore_meta_full(cfg_b.output)
    # fired at the first BLOCK boundary at/after step 5: epoch 1, step 2
    assert meta["epoch"] == 1 and meta["step_in_epoch"] == 2
    assert "_step_" in meta["dir"]
    assert meta["run"]["train_block"] == 2

    monkeypatch.delenv("REGAT_FAULT_PREEMPT_STEP")
    params_b, best_b = run_training(cfg_b, train, val)

    assert best_b == best_a
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        jax.device_get(params_a),
        jax.device_get(params_b),
    )
    metrics_b = _read_metrics(cfg_b.output)
    for epoch in (0, 1):
        for key in ("train_loss", "train_score", "eval_score", "eval_loss"):
            np.testing.assert_allclose(
                metrics_b[epoch][key], metrics_a[epoch][key], rtol=1e-6,
                err_msg=f"epoch {epoch} {key}",
            )
    root = os.path.join(cfg_b.output, "checkpoints")
    assert not [d for d in os.listdir(root) if "_step_" in d]


def test_checkpoint_every_steps_saves_and_prunes(tmp_path):
    """--checkpoint_every_steps: periodic mid-epoch saves land (observable as
    the meta sidecar pointing at a step dir mid-run is superseded) and each
    newer save prunes the older step dirs — disk stays bounded."""
    import os

    from tf_vqa_regat_tpu.train.loop import run_training

    train, val = _datasets()
    # print_freq=0 = silence step lines; also regression-covers the guard
    # against using it as a modulus (ZeroDivisionError at step 1)
    cfg = _run_cfg(tmp_path / "c", epochs=1, checkpoint_every_steps=2, print_freq=0)
    run_training(cfg, train, val)
    root = os.path.join(cfg.output, "checkpoints")
    # step-2 save happened (pruned by the epoch save), epoch save is final
    assert not [d for d in os.listdir(root) if "_step_" in d]
    meta = ckpt.restore_meta_full(cfg.output)
    assert meta["dir"] == "epoch_0000" and "step_in_epoch" not in meta


def test_async_checkpoint_equals_blocking(tmp_path):
    """--async_checkpoint (default): saves run on a background writer thread
    overlapped with training; on run_training return every write has joined
    and the resulting checkpoints/meta are identical to blocking saves."""
    import os

    from tf_vqa_regat_tpu.train.loop import run_training

    train, val = _datasets()
    cfg_a = _run_cfg(tmp_path / "async", epochs=2)  # async is the default
    assert cfg_a.async_checkpoint
    run_training(cfg_a, train, val)
    cfg_b = _run_cfg(tmp_path / "block", epochs=2, async_checkpoint=False)
    run_training(cfg_b, train, val)

    for out in (cfg_a.output, cfg_b.output):
        root = os.path.join(out, "checkpoints")
        assert sorted(os.listdir(root)) == [
            "best", "epoch_0000", "epoch_0001", "meta.json"
        ], os.listdir(root)
    assert ckpt.restore_meta_full(cfg_a.output) == ckpt.restore_meta_full(
        cfg_b.output
    )
    # identical training trajectories (saves don't perturb the run) ...
    ma, mb = _read_metrics(cfg_a.output), _read_metrics(cfg_b.output)
    for epoch in (0, 1):
        for key in ("train_loss", "train_score", "eval_score", "eval_loss", "lr"):
            assert ma[epoch][key] == mb[epoch][key], (epoch, key)
    # ... and bit-identical checkpoint contents (targetless raw restore)
    a = ckpt.ocp.StandardCheckpointer().restore(
        ckpt.latest_checkpoint(cfg_a.output)
    )
    b = ckpt.ocp.StandardCheckpointer().restore(
        ckpt.latest_checkpoint(cfg_b.output)
    )
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )


def test_wait_pending_reraises_write_errors(tmp_path, monkeypatch):
    """A failed async write must not vanish: wait_pending re-raises it."""
    import pytest

    mesh, state, _, _ = _setup()
    out = str(tmp_path / "w") + "/"

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt.ocp.StandardCheckpointer, "save", boom)
    ckpt.save_checkpoint(out, state, 0, -1.0, False, block=False)
    with pytest.raises(OSError, match="disk full"):
        ckpt.wait_pending()


def test_pending_joined_keeps_async_write_durable_across_exception(tmp_path):
    """An exception raised while an async write is in flight (debug_nans,
    eval OOM, Ctrl-C) must not abandon the write: pending_joined joins it on
    the exception path, so the issued checkpoint is complete on disk; and a
    secondary write error never masks the primary exception."""
    import pytest

    mesh, state, _, _ = _setup()
    out = str(tmp_path / "j") + "/"
    with pytest.raises(FloatingPointError, match="primary"):
        with ckpt.pending_joined():
            ckpt.save_checkpoint(out, state, 0, 0.5, False, block=False)
            raise FloatingPointError("primary")
    # write joined and completed despite the exception
    latest = ckpt.latest_checkpoint(out)
    assert latest is not None and latest.endswith("epoch_0000")
    _, fresh, _, _ = _setup()
    ckpt.restore_checkpoint(latest, fresh)  # fully readable
    assert ckpt.restore_meta(out) == (0, 0.5)
    # a FAILED write on the exception path stays silent (primary wins) ...
    orig_save = ckpt.ocp.StandardCheckpointer.save
    ckpt.ocp.StandardCheckpointer.save = lambda *a, **k: (_ for _ in ()).throw(
        OSError("disk full")
    )
    try:
        with pytest.raises(FloatingPointError, match="primary"):
            with ckpt.pending_joined():
                ckpt.save_checkpoint(out, state, 1, 0.5, False, block=False)
                raise FloatingPointError("primary")
        # ... but on the clean path it surfaces
        with pytest.raises(OSError, match="disk full"):
            with ckpt.pending_joined():
                ckpt.save_checkpoint(out, state, 1, 0.5, False, block=False)
    finally:
        ckpt.ocp.StandardCheckpointer.save = orig_save


def test_resume_ignores_stale_step_meta(tmp_path):
    """If meta.json names a step checkpoint that is gone from disk (partial
    copy / manual cleanup), latest_checkpoint falls back to the newest
    COMPLETED epoch dir — and resume must NOT apply meta's step skip to
    params that never took those steps: it reruns the epoch in full,
    reproducing the uninterrupted trajectory."""
    import json
    import os

    from tf_vqa_regat_tpu.train.loop import run_training

    train, val = _datasets()
    cfg_a = _run_cfg(tmp_path / "a", epochs=2)
    run_training(cfg_a, train, val)
    metrics_a = _read_metrics(cfg_a.output)

    cfg_b = _run_cfg(tmp_path / "b", epochs=1)
    run_training(cfg_b, train, val)
    # craft a stale meta: a step save of epoch 1 whose dir never made it
    root = os.path.join(cfg_b.output, "checkpoints")
    with open(os.path.join(root, "meta.json")) as fh:
        meta = json.load(fh)
    meta.update(
        dir="epoch_0001_step_00000002", epoch=1, step_in_epoch=2,
        acc={"score": 999.0, "loss_sum": 999.0, "n": 32.0},
    )
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)

    cfg_b2 = _run_cfg(tmp_path / "b", epochs=2, resume=True)
    run_training(cfg_b2, train, val)
    metrics_b = _read_metrics(cfg_b2.output)
    # epoch 1 ran in full from the epoch-0 state (no phantom 2-step skip,
    # no poisoned accumulators)
    for key in ("train_loss", "train_score", "eval_score", "eval_loss"):
        np.testing.assert_allclose(
            metrics_b[1][key], metrics_a[1][key], rtol=1e-6, err_msg=key
        )


def test_mid_epoch_resume_refuses_changed_data_order(tmp_path, monkeypatch):
    """A step checkpoint pins the run's data-order signature (batch_size,
    seed, steps_per_epoch, roi_buckets); resuming mid-epoch under a different
    signature would replay a RESHUFFLED remainder (repeating/skipping
    examples), so run_training refuses loudly instead."""
    import pytest

    from tf_vqa_regat_tpu.train.loop import Preempted, run_training

    train, val = _datasets()
    # per-step dispatch: the fault must land MID-epoch (step 2 of 4); the
    # auto-blocked default's only boundary on this tiny epoch is its end
    cfg = _run_cfg(tmp_path / "g", train_block=1)
    monkeypatch.setenv("REGAT_FAULT_PREEMPT_STEP", "2")
    with pytest.raises(Preempted):
        run_training(cfg, train, val)
    assert "run" in ckpt.restore_meta_full(cfg.output)
    monkeypatch.delenv("REGAT_FAULT_PREEMPT_STEP")

    cfg2 = _run_cfg(tmp_path / "g", resume=True, batch_size=8, train_block=1)
    with pytest.raises(ValueError, match="mid-epoch resume"):
        run_training(cfg2, train, val)
    cfg3 = _run_cfg(tmp_path / "g", resume=True, seed=7777, train_block=1)
    with pytest.raises(ValueError, match="batch partitioning|mid-epoch resume"):
        run_training(cfg3, train, val)
    # a data-path flip also reshuffles the order (sharded permutations are
    # per-shard; device/host are global) — the signature pins the RESOLVED
    # mode, so forcing a different one refuses too
    cfg4 = _run_cfg(tmp_path / "g", resume=True, data_mode="host", train_block=1)
    with pytest.raises(ValueError, match="mid-epoch resume"):
        run_training(cfg4, train, val)
    # a train_block flip alone reorders the bucketless stream's dispatch
    # grouping too — the signature pins the EFFECTIVE K, so the auto
    # default (K=8 on the device store) refuses against a per-step save
    cfg5 = _run_cfg(tmp_path / "g", resume=True)
    with pytest.raises(ValueError, match="mid-epoch resume"):
        run_training(cfg5, train, val)
    # the matching config still resumes fine
    run_training(_run_cfg(tmp_path / "g", resume=True, train_block=1), train, val)


def test_run_signature_normalizes_roi_buckets():
    """The signature pins the PARSED bucket list: '100,64' and '64, 100'
    yield the same sorted buckets, hence the same seeded epoch order — they
    must not spuriously refuse a mid-epoch resume."""
    from tf_vqa_regat_tpu.train.loop import _run_signature

    a = _run_signature(_run_cfg("x", roi_buckets="100,64"), 4, "device", 1)
    b = _run_signature(_run_cfg("x", roi_buckets="64, 100"), 4, "device", 1)
    assert a == b and a["roi_buckets"] == [64, 100]
    c = _run_signature(_run_cfg("x", roi_buckets="64"), 4, "device", 1)
    assert a != c


def test_legacy_run_sig_string_buckets_still_resume():
    """Step checkpoints written by builds that stored roi_buckets as the raw
    flag string must still compare equal after the parsed-list change — a
    preempted run's partial epoch must survive the upgrade."""
    from tf_vqa_regat_tpu.train.loop import (
        _normalize_legacy_run_sig,
        _run_signature,
    )

    now = _run_signature(_run_cfg("x", roi_buckets="100,64"), 4, "device", 1)
    legacy = dict(now, roi_buckets="64, 100")  # pre-change on-disk form
    assert _normalize_legacy_run_sig(legacy) == now
    legacy_empty = dict(now, roi_buckets="")
    now_empty = _run_signature(_run_cfg("x"), 4, "device", 1)
    assert _normalize_legacy_run_sig(legacy_empty) == now_empty
    # current-form signatures pass through untouched (incl. None)
    assert _normalize_legacy_run_sig(dict(now)) == now
    assert _normalize_legacy_run_sig(None) is None


def test_preempt_watcher_probes_sync_service_once(monkeypatch):
    """Multi-process poll with no preemption sync service on the cluster:
    probed ONCE (not a swallowed raise per step) and warns loudly that
    SIGTERM handling is inert."""
    import warnings

    from jax.experimental import multihost_utils

    from tf_vqa_regat_tpu.train.loop import _PreemptWatcher

    calls = []

    def raising(step):
        calls.append(step)
        raise RuntimeError("preemption sync manager is not initialized")

    monkeypatch.setattr(
        multihost_utils, "reached_preemption_sync_point", raising
    )
    w = _PreemptWatcher()
    w._multi = True  # simulate process_count > 1
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert w.poll(1) is False
        assert w.poll(2) is False
        assert w.poll(3) is False
    assert len(calls) == 1, "service must be probed exactly once"
    inert = [r for r in rec if "NOT trigger" in str(r.message)]
    assert len(inert) == 1, "exactly one loud inert-preemption warning"


def test_sigterm_watcher_flag_and_handler_restore():
    """The real-signal path: SIGTERM to this process sets the watcher flag
    (poll -> True at the next step boundary) and the previous handler is
    restored on exit."""
    import os
    import signal

    from tf_vqa_regat_tpu.train.loop import _PreemptWatcher

    prev = signal.getsignal(signal.SIGTERM)
    with _PreemptWatcher() as w:
        assert not w.poll(1)
        os.kill(os.getpid(), signal.SIGTERM)
        assert w.poll(2)
    assert signal.getsignal(signal.SIGTERM) == prev


def test_params_only_artifact(tmp_path):
    out = str(tmp_path / "m") + "/"
    mesh, state, _, _ = _setup()
    path = ckpt.save_params_only(out, "implicit", "butd", state["params"])
    assert "implicit-butd-pretrained_model" in path
    restored = ckpt.load_params(path, jax.device_get(state["params"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state["params"]),
        restored,
    )


def test_keep_ckpts_retention(tmp_path):
    """--keep_ckpts N: only the newest N epoch dirs survive; "best" and the
    meta-referenced dir are kept, and resume still restores the newest."""
    out = str(tmp_path / "run") + "/"
    state = {"w": jnp.arange(4.0)}
    for epoch in range(5):
        state = {"w": state["w"] + 1.0}
        ckpt.save_checkpoint(
            out, state, epoch=epoch, best_score=2.0, is_best=(epoch == 1),
            block=(epoch % 2 == 0), retain=2,
        )
    ckpt.wait_pending()
    root = tmp_path / "run" / "checkpoints"
    dirs = sorted(d.name for d in root.iterdir() if d.is_dir())
    assert dirs == ["best", "epoch_0003", "epoch_0004"]
    latest = ckpt.latest_checkpoint(out)
    assert latest is not None and latest.endswith("epoch_0004")
    restored = ckpt.restore_checkpoint(latest, {"w": jnp.zeros(4)})
    np.testing.assert_array_equal(
        np.asarray(restored["w"]), np.arange(4.0) + 5.0
    )
    # best (saved at epoch 1, since pruned as an epoch dir) is intact
    best = ckpt.restore_checkpoint(str(root / "best"), {"w": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(best["w"]), np.arange(4.0) + 2.0)


def test_save_reports_backpressure_wait(tmp_path, monkeypatch):
    """A save issued while the previous async write is still running
    returns the seconds it blocked (loop.py logs it as back-pressure)."""
    import time as _time

    slow = ckpt._to_host_leafwise

    def slow_fetch(state):
        _time.sleep(2.5)
        return slow(state)

    monkeypatch.setattr(ckpt, "_to_host_leafwise", slow_fetch)
    out = str(tmp_path / "run") + "/"
    state = {"w": jnp.arange(4.0)}
    w1 = ckpt.save_checkpoint(out, state, 0, 0.0, False, block=False)
    assert w1 == 0.0  # nothing pending
    w2 = ckpt.save_checkpoint(out, state, 1, 0.0, False, block=False)
    # generous margin: the sleep is 2.5 s, so even ~2 s of scheduling noise
    # between thread start and join leaves a positive wait
    assert w2 > 0.5  # joined the slow in-flight write
    ckpt.wait_pending()


def test_keep_ckpts_never_deletes_fresh_save_over_stale_dirs(tmp_path):
    """Retention prunes only dirs BELOW the just-written one: stale
    higher-numbered epoch dirs from a previous run in the same output (and
    Orbax tmp dirs) cannot displace the fresh, meta-referenced checkpoint."""
    out = str(tmp_path / "run") + "/"
    root = tmp_path / "run" / "checkpoints"
    root.mkdir(parents=True)
    for stale in ["epoch_0009", "epoch_0010", "epoch_0003.orbax-checkpoint-tmp-7"]:
        (root / stale).mkdir()
    ckpt.save_checkpoint(
        out, {"w": jnp.arange(3.0)}, epoch=0, best_score=0.0, is_best=False,
        block=True, retain=2,
    )
    dirs = sorted(d.name for d in root.iterdir() if d.is_dir())
    assert dirs == [
        "epoch_0000", "epoch_0003.orbax-checkpoint-tmp-7",
        "epoch_0009", "epoch_0010",
    ]
    latest = ckpt.latest_checkpoint(out)
    assert latest is not None and latest.endswith("epoch_0000")


def test_keep_ckpts_step_saves_do_not_consume_epoch_slots(tmp_path):
    """Step checkpoints never count against --keep_ckpts: even at
    keep_ckpts=1 a mid-epoch save leaves the last epoch-boundary
    checkpoint intact (the fallback a refused mid-epoch resume needs)."""
    out = str(tmp_path / "run") + "/"
    state = {"w": jnp.arange(2.0)}
    ckpt.save_checkpoint(out, state, 0, 0.0, False, block=True, retain=1)
    ckpt.save_checkpoint(
        out, state, 1, 0.0, False, step_in_epoch=5, acc={}, block=True,
        retain=1,
    )
    root = tmp_path / "run" / "checkpoints"
    dirs = sorted(d.name for d in root.iterdir() if d.is_dir())
    assert dirs == ["epoch_0000", "epoch_0001_step_00000005"]


def test_latest_checkpoint_fallback_ignores_orbax_tmp_dirs(tmp_path):
    """Without meta, the fallback picks the newest COMPLETE epoch dir —
    an incomplete 'epoch_NNNN.orbax-checkpoint-tmp-*' (crash mid-save)
    sorts after the real dirs and must not be selected."""
    out = str(tmp_path / "run") + "/"
    ckpt.save_checkpoint(out, {"w": jnp.arange(2.0)}, 2, 0.0, False, block=True)
    root = tmp_path / "run" / "checkpoints"
    (root / "epoch_0005.orbax-checkpoint-tmp-3").mkdir()
    (root / "meta.json").unlink()  # force the legacy fallback
    latest = ckpt.latest_checkpoint(out)
    assert latest is not None and latest.endswith("epoch_0002")


def test_legacy_run_sig_without_data_mode_and_dp_still_resumes(tmp_path):
    """Step checkpoints from builds BEFORE the data_mode/dp signature keys
    must still mid-epoch-resume under the unchanged configuration: the
    comparison covers only the keys the saving build recorded (keys it
    never stored cannot be checked) — previously the missing keys were
    treated as a mismatch and every legacy step checkpoint was refused
    after an upgrade (round-3 review finding). A key the writer DID record
    still refuses on change."""
    import json
    import os

    import pytest

    from tf_vqa_regat_tpu.train.loop import Preempted, run_training

    # per-step dispatch so the fault lands mid-epoch (see the preempt test)
    cfg = _run_cfg(tmp_path, epochs=1, train_block=1)
    train, val = _datasets()

    os.environ["REGAT_FAULT_PREEMPT_STEP"] = "2"
    try:
        with pytest.raises(Preempted):
            run_training(cfg, train, val)
    finally:
        del os.environ["REGAT_FAULT_PREEMPT_STEP"]

    meta_path = tmp_path / "checkpoints" / "meta.json"
    meta = json.loads(meta_path.read_text())
    assert "step_in_epoch" in meta and "run" in meta
    # strip the new keys, emulating a pre-data_mode/dp on-disk signature
    legacy_run = {k: v for k, v in meta["run"].items()
                  if k not in ("data_mode", "dp")}

    # a key the legacy sig DID record still refuses on change (checked
    # first: a successful resume completes the epoch and prunes the step
    # checkpoint)
    meta["run"] = dict(legacy_run, batch_size=999)
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="mid-epoch resume"):
        run_training(cfg.replace(resume=True), train, val)

    # unchanged configuration: resume must be ACCEPTED and complete
    meta["run"] = legacy_run
    meta_path.write_text(json.dumps(meta))
    params, best = run_training(cfg.replace(resume=True), train, val)
    assert np.isfinite(best)


def test_epoch_boundary_resume_refuses_changed_steps_per_epoch(tmp_path):
    """The count-keyed LR schedule derives the epoch as
    count // steps_per_epoch: an epoch-boundary resume with a changed
    batch_size would silently train at a misaligned LR while the banner
    prints the right one (review finding) — refuse loudly, like the
    mid-epoch guard. A matched config still resumes."""
    import pytest

    from tf_vqa_regat_tpu.train.loop import run_training

    train, val = _datasets()
    run_training(_run_cfg(tmp_path / "e", epochs=1), train, val)

    with pytest.raises(ValueError, match="steps_per_epoch"):
        run_training(
            _run_cfg(tmp_path / "e", epochs=2, resume=True, batch_size=8),
            train, val,
        )
    # the matching config resumes and continues to epoch 1
    run_training(_run_cfg(tmp_path / "e", epochs=2, resume=True), train, val)
    assert 1 in _read_metrics(str(tmp_path / "e") + "/")


def test_mid_epoch_resume_refuses_changed_order_version(tmp_path, monkeypatch):
    """The seeded-stream formulas (data/ordering.py) define what "skip N
    batches" reproduces; a step checkpoint therefore pins ORDER_VERSION, and
    a resume under a DIFFERENT formula version refuses — including the
    legacy case where the writer predates the field (the other
    legacy-missing keys are skipped as unverifiable, but an order change
    makes the skip genuinely wrong)."""
    import json

    import pytest

    from tf_vqa_regat_tpu.train.loop import Preempted, run_training

    train, val = _datasets()
    # per-step dispatch so the fault lands mid-epoch (see the preempt test)
    cfg = _run_cfg(tmp_path / "ov", train_block=1)
    monkeypatch.setenv("REGAT_FAULT_PREEMPT_STEP", "2")
    with pytest.raises(Preempted):
        run_training(cfg, train, val)
    monkeypatch.delenv("REGAT_FAULT_PREEMPT_STEP")

    meta_path = tmp_path / "ov" / "checkpoints" / "meta.json"
    meta = json.loads(meta_path.read_text())
    saved_order = meta["run"].pop("order")  # simulate a legacy writer
    meta_path.write_text(json.dumps(meta))
    cfg2 = _run_cfg(tmp_path / "ov", resume=True, train_block=1)
    with pytest.raises(ValueError, match="order"):
        run_training(cfg2, train, val)

    meta["run"]["order"] = saved_order + 1  # future formula version
    meta_path.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="order"):
        run_training(cfg2, train, val)

    meta["run"]["order"] = saved_order  # restored -> resumes fine
    meta_path.write_text(json.dumps(meta))
    run_training(cfg2, train, val)
