"""Text logging in the reference's exact format (the committed notebook log is
the de-facto contract — SURVEY §5 metrics row): `Logger` appends to
`{output}/log.txt` + stdout, `AverageMeter` running loss, `timeSince` ETA
strings (reference utils.py:23-91). A JSONL metrics writer is added alongside."""

from __future__ import annotations

import json
import math
import os
import time
from typing import Optional


def as_minutes(s: float) -> str:
    m = math.floor(s / 60)
    return "%dm %ds" % (m, s - m * 60)


def time_since(since: float, percent: float) -> str:
    s = time.time() - since
    es = s / max(percent, 1e-9)
    return "%s (remain %s)" % (as_minutes(s), as_minutes(es - s))


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def is_primary_process() -> bool:
    """True on the process that owns shared output files. Multi-process runs
    share one output dir (checkpoints assume it — meta.json is written only
    by process 0, checkpoint.py), so log.txt / metrics.jsonl / prediction
    JSON writes are gated the same way: N processes appending to one file
    interleave and corrupt it."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # jax not initialized yet — single-process by definition
        return True


class Logger:
    """File log on process 0 only; stdout everywhere (per-process prefixed
    console visibility is useful, one shared file of interleaved duplicate
    lines is not)."""

    def __init__(self, output_name: str, reset: bool = False):
        self.log_file = None
        if is_primary_process():
            dirname = os.path.dirname(output_name)
            if dirname and not os.path.exists(dirname):
                os.makedirs(dirname, exist_ok=True)
            mode = "a" if (os.path.exists(output_name) and not reset) else "w"
            self.log_file = open(output_name, mode)

    def write(self, msg: str) -> None:
        if self.log_file is not None:
            self.log_file.write(msg + "\n")
            self.log_file.flush()
        print(msg)


class MetricsWriter:
    """Structured JSONL metrics alongside the text log (process 0 only —
    metrics are computed from replicated on-device accumulators, so every
    process holds the same values and one writer suffices)."""

    def __init__(self, path: Optional[str]):
        self.fh = open(path, "a") if (path and is_primary_process()) else None

    def write(self, record: dict) -> None:
        if self.fh is None:
            return
        record = dict(record, ts=time.time())
        self.fh.write(json.dumps(record) + "\n")
        self.fh.flush()
