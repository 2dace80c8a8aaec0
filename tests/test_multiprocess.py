"""Multi-process data feeding: a 2-process jax.distributed CPU run (4+4
virtual devices) must produce the same training/eval metrics as the
single-process 8-device run — the SPMD program is identical; only the
host-side placement differs (parallel/distributed.py::put_global assembles
global arrays from per-process local shards).

Covers SURVEY §2.5 DP row ("per-host data feeding") and the round-1
verdict's multi-host gap. Both runs execute in subprocesses so each gets a
fresh JAX runtime with its own device topology.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_DRIVER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_driver.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES"):
        env.pop(k, None)
    return env


def _run(nproc: int, tmpdir: str) -> dict:
    port = _free_port()
    out = os.path.join(tmpdir, f"mp_{nproc}.json")
    procs = [
        subprocess.Popen(
            [sys.executable, _DRIVER, out, str(pid), str(nproc), str(port)],
            env=_clean_env(),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"driver failed (nproc={nproc}):\n{log[-4000:]}"
    with open(out) as f:
        return json.load(f)


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
