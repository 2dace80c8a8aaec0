"""Observability flags: profiling traces and NaN debugging (SURVEY §5
tracing/NaN rows; round-1 verdict asked for both to be exercised)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.train.loop import run_training
from tf_vqa_regat_tpu.train.profiling import annotate, trace_epoch


def _tree_files(root):
    return [
        os.path.join(d, f) for d, _, fs in os.walk(root) for f in fs
    ]


def test_trace_epoch_writes_nonempty_trace(tmp_path):
    with trace_epoch(str(tmp_path), 3):
        with annotate("smoke"):
            jax.block_until_ready(jax.jit(lambda x: x @ x)(jnp.ones((8, 8))))
    files = _tree_files(str(tmp_path / "epoch_0003"))
    assert files, "no trace files written"
    assert any(os.path.getsize(f) > 0 for f in files)


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6, imp_pos_emb_dim=16,
        fusion="butd", relation_type="implicit", residual_connection=True,
        epochs=1, batch_size=16, print_freq=100,
        output=str(tmp_path) + "/", save_every_epoch=False,
    )
    base.update(kw)
    return Config(**base)


def test_profile_dir_flag_traces_training_epoch(tmp_path):
    """--profile_dir wiring: run_training writes a per-epoch trace."""
    cfg = _tiny_cfg(tmp_path, profile_dir=str(tmp_path / "traces"))
    train = synthetic_dataset(num_images=8, num_questions=32, v_dim=24, num_ans=7)
    val = synthetic_dataset(num_images=4, num_questions=16, v_dim=24, num_ans=7, seed=1)
    params, best = run_training(cfg, train, val)
    assert np.isfinite(best)
    files = _tree_files(str(tmp_path / "traces" / "epoch_0000"))
    assert files and any(os.path.getsize(f) > 0 for f in files)


def test_debug_nans_flag_raises_on_injected_nan(tmp_path):
    """--debug_nans wiring: poisoned input features must raise instead of
    silently training on NaNs."""
    cfg = _tiny_cfg(tmp_path, debug_nans=True)
    train = synthetic_dataset(num_images=8, num_questions=32, v_dim=24, num_ans=7)
    val = synthetic_dataset(num_images=4, num_questions=16, v_dim=24, num_ans=7, seed=1)
    train.store.features[:] = np.nan  # poison every region feature
    try:
        with pytest.raises(FloatingPointError):
            run_training(cfg, train, val)
    finally:
        jax.config.update("jax_debug_nans", False)  # global flag; undo


def test_shared_output_files_gate_to_primary_process(tmp_path, monkeypatch, capsys):
    """Multi-process runs share one output dir: only process 0 may open
    log.txt / metrics.jsonl / the prediction JSON (N concurrent writers
    interleave into a corrupt file — same gating as checkpoint meta.json).
    Non-primary Loggers still print to stdout."""
    from tf_vqa_regat_tpu.train import logging as tlog

    monkeypatch.setattr(tlog, "is_primary_process", lambda: False)
    log = tlog.Logger(str(tmp_path / "log.txt"))
    log.write("hello from p1")
    assert not os.path.exists(tmp_path / "log.txt")
    assert "hello from p1" in capsys.readouterr().out

    mw = tlog.MetricsWriter(str(tmp_path / "metrics.jsonl"))
    mw.write({"epoch": 0})
    assert not os.path.exists(tmp_path / "metrics.jsonl")

    monkeypatch.setattr(tlog, "is_primary_process", lambda: True)
    log0 = tlog.Logger(str(tmp_path / "log.txt"))
    log0.write("hello from p0")
    assert "hello from p0" in open(tmp_path / "log.txt").read()


def test_training_epoch_leaks_no_tracers(tmp_path):
    """jax.checking_leaks over a full tiny training run (SURVEY §5 race-
    detection row): any tracer escaping a jitted step (the classic functional-
    transform bug class) raises instead of silently capturing stale state."""
    cfg = _tiny_cfg(tmp_path)
    train = synthetic_dataset(num_images=8, num_questions=32, v_dim=24, num_ans=7)
    val = synthetic_dataset(num_images=4, num_questions=16, v_dim=24, num_ans=7, seed=1)
    with jax.checking_leaks():
        params, best = run_training(cfg, train, val)
    assert np.isfinite(best)
