"""REALDATA.md rehearsals: the playbook's documented command lines must
execute end-to-end against the code as written.

The flagship run-1 command (§4) already drifted from the code once — the
f32 sharded-store budget interaction, fixed by hand in round 3 (commit
da47a4a) — so the commands are extracted from the playbook text itself and
driven through main.main() on the virtual 8-device CPU mesh with synthetic
data: doc drift now fails a test instead of a bring-up run (round-3
verdict item 8). Model dims / split sizes / epochs are scaled down via
appended CLI flags (CLI-wins is the config contract, so the documented
flags keep their exact semantics: sharded data mode, f32 tables, roi
buckets, rbg PRNG, mmap + packed cache)."""

import os
import re
import shlex

import jax
import pytest


def _doc_blocks():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    doc = open(os.path.join(repo, "REALDATA.md")).read()
    return repo, re.findall(r"```bash\n(.*?)```", doc, re.S)


def _tokens(block):
    return shlex.split(block.replace("\\\n", " "), comments=True)


def test_realdata_run1_command_runs(tmp_path, monkeypatch):
    """§4's run-1 command (f32 tables, forced sharded store, roi buckets,
    mmap, packed cache, rbg) trains one scaled-down epoch end-to-end."""
    import main as regat_main

    repo, blocks = _doc_blocks()
    run1 = [b for b in blocks if "--data_mode sharded" in b]
    assert len(run1) == 1, "REALDATA.md §4 must document ONE run-1 command"
    tokens = _tokens(run1[0])

    # pin the documented command's shape — §3's whole point is that run 1
    # must FORCE the sharded mode (auto would fall to host streaming and
    # the roi_buckets flag rejects that loudly)
    assert tokens[:2] == ["python", "main.py"]
    assert tokens[tokens.index("--config") + 1] == "configs/butd_vqa.json"
    assert tokens[tokens.index("--feature_dtype") + 1] == "float32"
    assert tokens[tokens.index("--data_mode") + 1] == "sharded"
    assert tokens[tokens.index("--roi_buckets") + 1] == "36,64,100"
    assert "--mmap_features" in tokens and "--packed_cache" in tokens

    # relative paths (./data, ./data/packed) land in tmp, not the repo
    monkeypatch.chdir(tmp_path)
    os.makedirs("data", exist_ok=True)
    argv = tokens[2:]
    argv[argv.index("--config") + 1] = os.path.join(repo, "configs/butd_vqa.json")
    argv += [
        "--synthetic", "--synthetic_train_size", "128",
        "--synthetic_val_size", "64",
        "--epochs", "1", "--batch_size", "16", "--eval_batch", "16",
        "--num_hid", "24", "--relation_dim", "32", "--num_heads", "4",
        "--nongt_dim", "5", "--imp_pos_emb_dim", "16",
        # scaled synthetic boxes still span 10..100, so the documented
        # buckets stay exercised (3 compiled programs per step type)
        "--output", str(tmp_path / "out"),
    ]

    prng_before = jax.config.jax_default_prng_impl
    try:
        regat_main.main(argv)
    finally:
        # the command sets --prng_impl rbg process-globally; restore for
        # the rest of the suite
        jax.config.update("jax_default_prng_impl", prng_before)

    log = (tmp_path / "out" / "log.txt").read_text()
    assert "Epoch" in log and "eval_score" in log
    # the packed cache the command asks for was actually written
    assert os.path.isdir("data/packed") and os.listdir("data/packed")


def test_realdata_run1_without_forced_sharded_fails_loudly():
    """§3's run-1 footnote — f32 under `auto` falls to host streaming and
    `--roi_buckets` rejects it with a loud error — is the exact interaction
    that drifted in round 3 (fixed by hand in da47a4a). Reproduce it at
    fixture scale: a budget sized so f32 resolves to host makes the run-1
    flag set (minus the forced mode) raise, and adding `--data_mode
    sharded` — the documented fix — resolves it."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.train.loop import (
        check_roi_buckets_mode,
        resolve_data_mode,
    )

    train = synthetic_dataset(num_images=16, num_questions=128, v_dim=64,
                              num_ans=13, adaptive=True, seed=0)
    val = synthetic_dataset(num_images=8, num_questions=64, v_dim=64,
                            num_ans=13, adaptive=True, seed=1, name="val")
    # budget between the per-shard slice (fits nothing) and zero: force the
    # auto -> host leg the playbook warns about
    base = dict(adaptive=True, feature_dtype="float32",
                roi_buckets="36,64,100", device_store_budget_gb=1e-9)
    auto = resolve_data_mode(Config(**base, data_mode="auto"), val, train,
                             False, dp=8)
    assert auto == "host"
    with pytest.raises(ValueError, match="roi_buckets"):
        check_roi_buckets_mode(Config(**base, data_mode="auto"), auto)
    # the documented remedy
    forced = Config(**base, data_mode="sharded")
    check_roi_buckets_mode(forced, resolve_data_mode(forced, val, train,
                                                     False, dp=8))
