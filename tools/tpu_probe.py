"""Is the TPU tunnel reachable? Exit 0 = a real accelerator answered.

A tunnel outage makes JAX backend init BLOCK indefinitely at ~0% CPU with
no error (PERF_NOTES.md, observed 2026-08-18) — and the environment's
platform pin falls back to CPU on a fast failure, so a bare
`jax.devices()` probe can both hang forever and false-positive. This
wraps the probe with a hard timeout (subprocess; SIGKILL on expiry) and a
non-CPU platform check:

    python tools/tpu_probe.py [--timeout 90]
    # exit 0: prints the device (tunnel up)
    # exit 1: init failed fast or only CPU answered
    # exit 2: init still blocked at the timeout (the outage signature)

Useful before benchmarking (bench.py would otherwise sit in its init
watchdog) and in watch loops:

    while ! python tools/tpu_probe.py; do sleep 300; done && python bench.py
"""

from __future__ import annotations

import argparse
import subprocess
import sys

_CHILD = """
import jax
ds = jax.devices()
real = [d for d in ds if d.platform != "cpu"]
assert real, f"only CPU devices answered: {ds}"
print(real[0])
"""


def probe(timeout_s: float) -> int:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _CHILD],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        print(
            f"TPU probe: backend init still blocked after {timeout_s:.0f}s "
            "— tunnel outage signature (PERF_NOTES.md)",
            file=sys.stderr,
        )
        return 2
    if r.returncode == 0:
        print(f"TPU probe: up — {r.stdout.strip().splitlines()[-1]}")
        return 0
    tail = (r.stderr or r.stdout).strip().splitlines()
    print(
        "TPU probe: init failed or CPU-only"
        + (f" — {tail[-1]}" if tail else ""),
        file=sys.stderr,
    )
    return 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--timeout", type=float, default=90.0)
    raise SystemExit(probe(ap.parse_args().timeout))
