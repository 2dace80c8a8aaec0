"""Multi-process data feeding: a 2-process jax.distributed CPU run (4+4
virtual devices) must produce the same training/eval metrics as the
single-process 8-device run — the SPMD program is identical; only the
host-side placement differs (parallel/distributed.py::put_global assembles
global arrays from per-process local shards).

Covers SURVEY §2.5 DP row ("per-host data feeding") and the round-1
verdict's multi-host gap. Both runs execute in subprocesses so each gets a
fresh JAX runtime with its own device topology. Launch harness shared with
test_mp_checkpoint.py via tests/mp_util.py.
"""

import os

import numpy as np

from mp_util import run_drivers

_HERE = os.path.dirname(os.path.abspath(__file__))
_DRIVER = os.path.join(_HERE, "mp_driver.py")
_MAIN_DRIVER = os.path.join(_HERE, "mp_main_driver.py")


def _run(nproc: int, tmpdir: str) -> dict:
    return run_drivers(_DRIVER, nproc, os.path.join(tmpdir, f"mp_{nproc}.json"))


def test_two_process_run_matches_single_process(tmp_path):
    single = _run(1, str(tmp_path))
    multi = _run(2, str(tmp_path))
    assert single["devices"] == 8
    assert multi["devices"] == 8  # 2 processes x 4 local devices, one mesh
    np.testing.assert_allclose(
        multi["losses"], single["losses"], rtol=1e-6,
        err_msg="per-step train losses diverge between 1- and 2-process runs",
    )
    np.testing.assert_allclose(multi["eval_loss"], single["eval_loss"], rtol=1e-6)
    np.testing.assert_allclose(multi["eval_score"], single["eval_score"], rtol=1e-6)
    # blocked-eval scan program + predict labels (replicated-output fetch)
    np.testing.assert_allclose(
        multi["blocked_eval_loss"], single["blocked_eval_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        multi["blocked_eval_score"], single["blocked_eval_score"], rtol=1e-6
    )
    assert multi["pred"] == single["pred"]
    assert len(single["pred"]) == 64  # every entry predicted exactly once
    # host-streaming predict (replicated-label jit): same answers in both
    # topologies, and consistent with the device-store predict blocks
    assert multi["host_pred"] == single["host_pred"]
    assert len(single["host_pred"]) == 64
    assert single["host_pred"] == [l for _, l in single["pred"]]
    # sharded store (where real multi-host training lands per
    # resolve_data_mode): partitioned-table placement, shard_map gather,
    # SPMD bucketed schedule, blocked eval, and the local->global predict
    # translation are all topology-invariant
    np.testing.assert_allclose(
        multi["sharded_losses"], single["sharded_losses"], rtol=1e-6,
        err_msg="sharded-store train losses diverge between 1- and 2-process runs",
    )
    np.testing.assert_allclose(
        multi["sharded_eval_loss"], single["sharded_eval_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        multi["sharded_eval_score"], single["sharded_eval_score"], rtol=1e-6
    )
    assert multi["sharded_pred"] == single["sharded_pred"]
    assert len(single["sharded_pred"]) == 64  # every entry exactly once


def test_two_process_full_cli_matches_single_process(tmp_path):
    """The PRODUCTION entrypoint end-to-end under jax.distributed: main.main()
    with --synthetic --data_mode sharded runs the top-level loop (sharded
    _DataPath, process-0-gated output files, collective per-epoch Orbax
    saves, eval, final artifact) in both topologies; per-epoch metrics.jsonl
    rows must match."""
    single = run_drivers(
        _MAIN_DRIVER, 1, os.path.join(str(tmp_path), "cli_1.json"),
        os.path.join(str(tmp_path), "out_1"),
    )
    multi = run_drivers(
        _MAIN_DRIVER, 2, os.path.join(str(tmp_path), "cli_2.json"),
        os.path.join(str(tmp_path), "out_2"),
    )
    assert single["final_artifact"] and multi["final_artifact"]
    # ensemble_eval (sharded, 2 members over the trained artifact) too
    assert multi["ensemble_score"] == single["ensemble_score"]
    assert len(single["metrics"]) == 2  # one row per epoch
    assert [r["epoch"] for r in multi["metrics"]] == [0, 1]
    for ms, mm in zip(single["metrics"], multi["metrics"]):
        assert set(ms) == set(mm)
        for k in ms:
            np.testing.assert_allclose(
                mm[k], ms[k], rtol=1e-6,
                err_msg=f"metrics.jsonl field {k!r} diverges across topologies",
            )
