"""Test-side harness for launching the multi-process gloo drivers — one
copy of the port allocation, env scrubbing, and Popen orchestration shared
by test_multiprocess.py and test_mp_checkpoint.py (round-3 review
finding)."""
import json
import os
import socket
import subprocess
import sys


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def clean_env():
    """Drop the host session's JAX/XLA pins so the driver controls its own
    device topology."""
    env = dict(os.environ)
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES"):
        env.pop(k, None)
    return env


def run_drivers(driver: str, nproc: int, out_json: str, *extra_args: str) -> dict:
    """Launch `nproc` copies of `driver` (argv: out_json pid nproc port
    *extra_args), wait, assert success, and return process 0's JSON.

    The gloo rendezvous has a fixed ~30s KV-store deadline inside XLA; under
    CPU contention (e.g. another pytest half running) it can time out before
    all processes reach initialize. That exact signature gets ONE retry on a
    fresh port — any other failure, or a second timeout, still raises."""
    for attempt in (0, 1):
        port = free_port()
        procs = [
            subprocess.Popen(
                [
                    sys.executable, driver, out_json, str(pid), str(nproc),
                    str(port), *extra_args,
                ],
                env=clean_env(),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
            for pid in range(nproc)
        ]
        logs = [p.communicate(timeout=900)[0].decode() for p in procs]
        rendezvous_flake = any(
            p.returncode != 0
            and "Gloo context initialization failed" in log
            and "DEADLINE_EXCEEDED" in log
            for p, log in zip(procs, logs)
        )
        if rendezvous_flake and attempt == 0:
            continue
        for p, log in zip(procs, logs):
            assert p.returncode == 0, (
                f"driver {os.path.basename(driver)} failed "
                f"(nproc={nproc}, args={extra_args}):\n{log[-4000:]}"
            )
        break
    with open(out_json) as f:
        return json.load(f)
