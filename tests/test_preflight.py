"""tools/preflight.py — the runnable REALDATA.md bring-up checklist: file
inventory, per-dtype capacity estimates + auto-mode resolution, and the
int8 quantization sanity check, all against the on-disk fixture layout."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tf_vqa_regat_tpu.data.fixtures import write_fixture

_TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "preflight.py",
)


def _run(*args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, _TOOL, *args],
        capture_output=True, text=True, env=env, timeout=300,
    )


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pf"))
    write_fixture(root, num_images=10, num_questions=40, v_dim=64,
                  num_ans=13, adaptive=True, name="train", seed=0)
    write_fixture(root, num_images=8, num_questions=30, v_dim=64,
                  num_ans=13, adaptive=True, name="val", seed=1)
    return root


def test_preflight_json_report(dataroot):
    r = _run("--data_folder", dataroot, "--adaptive", "--dp", "8",
             "--budget_gb", "0.00005", "--json")
    assert r.returncode == 0, r.stdout + r.stderr
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["ok"]
    for split in ("train", "val"):
        s = rep["splits"][split]
        assert s["missing"] == []
        est = {e["feature_dtype"]: e for e in s["estimates"]}
        # monotone footprints and a real mode per dtype
        assert (
            est["int8"]["replicated_bytes"]
            < est["bfloat16"]["replicated_bytes"]
            < est["float32"]["replicated_bytes"]
        )
        for e in est.values():
            assert e["per_shard_bytes"] < e["replicated_bytes"]
            assert e["auto_mode"] in ("device", "sharded", "host")
        # at the 50 KB budget the f32 train tables (~70 KB) cannot
        # replicate but the per-shard slice fits -> sharded
        assert est["float32"]["auto_mode"] != "device" or split == "val"
        chk = s["int8_check"]
        assert 0 < chk["rel_err_mean"] < 0.05  # Gaussian fixture: benign
        assert chk["n_sampled"] > 0


def test_preflight_flags_missing_files(dataroot, tmp_path):
    # an empty folder: everything missing, nonzero exit, loud markers
    r = _run("--data_folder", str(tmp_path), "--adaptive", "--splits", "train")
    assert r.returncode == 1
    assert "MISSING" in r.stdout
    assert "fix the inventory" in r.stdout
