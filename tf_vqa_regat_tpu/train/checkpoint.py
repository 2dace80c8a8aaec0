"""Orbax checkpointing: full TrainState (params + Adamax state + step) plus
metadata (epoch, best eval score, PRNG seed) saved every epoch, with
resume-from-latest and best-model tracking.

The reference saved weights-only once after the final epoch and supported no
resume (main.py:145,155; SURVEY §2.4-T7 / §5 failure-recovery row). The
`--checkpoint` eval flag loads either a full state dir or a params-only dir.

Mid-epoch (step) checkpoints: `save_checkpoint(..., step_in_epoch=i, acc=...)`
writes `epoch_EEEE_step_SSSSSSSS` plus the epoch's metric accumulators in the
meta sidecar, so `--resume` restarts INSIDE the interrupted epoch: the data
order is re-derived from the seeded epoch permutation, the dropout stream from
the step counter inside the state (train/step.py folds base_rng by
state["step"]), and the epoch metrics from `acc` — the resumed run reproduces
the uninterrupted run exactly (tests/test_checkpoint.py). meta.json names the
authoritative checkpoint via its "dir" key and is written LAST, so a crash
mid-save leaves meta pointing at the previous complete checkpoint. Older step
checkpoints are pruned once a newer save lands (disk stays bounded at one
step dir + the epoch dirs).

Multi-process contract (tests/test_mp_checkpoint.py): every process calls
save/restore (Orbax saves are collective — they barrier internally), only
process 0 writes the meta sidecar, and a barrier keeps any process from
racing ahead of an incomplete checkpoint. State is saved in its HOST
(replicated-numpy) representation, which makes checkpoints PROCESS-COUNT
PORTABLE: a run saved with N processes restores under M (the resume test
does 2 -> 1 and 2 -> 2). The trade-off: leaves must be fully replicated or
at least fully addressable per process — true for the dp-over-devices
production state; a tp-sharded multi-HOST state would need the
jax.Array-native Orbax path and is guarded with a loud error below.
"""

from __future__ import annotations

import contextlib
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _ckpt_dir(output: str) -> str:
    return os.path.abspath(os.path.join(output, "checkpoints"))


def _sync(tag: str) -> None:
    """Barrier across processes (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def _to_host(state: Dict[str, Any]) -> Dict[str, Any]:
    """device_get with a loud error for state this path cannot save."""
    bad = [
        type(x)
        for x in jax.tree.leaves(state)
        if isinstance(x, jax.Array) and not x.is_fully_addressable
        and not x.is_fully_replicated
    ]
    if bad:
        raise ValueError(
            "checkpoint state has leaves sharded across processes (e.g. "
            "tensor-parallel params on a multi-host mesh); the portable "
            "host-numpy checkpoint format requires fully replicated or "
            "fully addressable leaves"
        )
    return jax.device_get(state)


_pending_writer: Optional[Any] = None  # at most one async write in flight


def _device_snapshot(state: Dict[str, Any]) -> Dict[str, Any]:
    """Copy the state into FRESH device buffers (one jitted program, ~ms of
    HBM bandwidth) so the donated training step can keep overwriting the
    live buffers while a background thread fetches the snapshot to host.

    Measured motivation (tools/ckpt_overlap_bench.py, v5e over the tunnel):
    the host fetch of the 416 MB flagship TrainState takes ~10-13 s — with a
    synchronous fetch that stall lands inside the training loop even when
    the disk write is async. jnp.copy under jit with no donation cannot be
    aliased to the inputs, so the outputs are guaranteed distinct buffers.
    Costs one extra transient state copy of HBM until the fetch completes."""
    leaves, treedef = jax.tree.flatten(state)
    arr = [x for x in leaves if isinstance(x, jax.Array)]
    copied = iter(_jit_copy(arr))
    return jax.tree.unflatten(
        treedef,
        [next(copied) if isinstance(x, jax.Array) else x for x in leaves],
    )


@jax.jit
def _jit_copy(xs):
    return [jnp.copy(x) for x in xs]


def _to_host_leafwise(state: Dict[str, Any]) -> Dict[str, Any]:
    """Background-thread host fetch, one leaf at a time. jax.device_get
    enqueues every leaf's transfer at once, which parks the training loop's
    tiny dispatch messages behind ~400 MB of bulk data on the single-stream
    tunnel runtime; fetching leaf-by-leaf leaves a gap after each leaf for
    queued step dispatches to slip through (tools/ckpt_overlap_bench.py
    measures the difference)."""
    import numpy as np

    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, state
    )


def wait_pending() -> float:
    """Join the in-flight async checkpoint write (no-op if none). Re-raises
    a failed write's exception so save errors are never silently dropped.
    Returns the seconds actually spent waiting for a still-running write
    (0.0 if none was pending or it had already finished) — the save path
    uses this to report back-pressure from a too-fast checkpoint cadence."""
    import time

    global _pending_writer
    waited = 0.0
    if _pending_writer is not None:
        t, _pending_writer = _pending_writer, None
        if t.is_alive():
            t0 = time.time()
            t.join()
            waited = time.time() - t0
        else:
            t.join()
        if t.error is not None:
            raise t.error
    return waited


@contextlib.contextmanager
def pending_joined() -> Any:
    """Scope an async-saving region: on normal exit, join the in-flight write
    (re-raising its error); on an exception, still join — an already-issued
    checkpoint stays durable instead of the daemon writer dying mid-write at
    process exit — but suppress any secondary write error so the primary
    failure is never masked."""
    try:
        yield
    except BaseException:
        try:
            wait_pending()
        except Exception:
            pass  # the in-flight exception is the one to surface
        raise
    else:
        wait_pending()


def save_checkpoint(
    output: str,
    state: Dict[str, Any],
    epoch: int,
    best_score: float,
    is_best: bool,
    step_in_epoch: Optional[int] = None,
    acc: Optional[Dict[str, float]] = None,
    block: bool = True,
    run_sig: Optional[Dict[str, Any]] = None,
    retain: int = 0,
) -> float:
    """Epoch checkpoint (step_in_epoch None: `epoch` is COMPLETED) or
    mid-epoch step checkpoint (`epoch` in progress, `step_in_epoch` optimizer
    steps of it done, `acc` = host values of the epoch metric accumulators).

    `run_sig`: the data-order signature of the saving run
    (batch_size, seed, steps_per_epoch, roi_buckets). A mid-epoch resume is
    only exact when the seeded epoch permutation and its batch partitioning
    are recreated identically, so run_training refuses to apply the step
    skip under a different signature (loop.py resume guard) instead of
    silently training on a reshuffled remainder.

    block=False (single-process only — collective Orbax saves and the
    cross-process barrier must run on every process in lockstep, so
    multi-process forces a blocking save) snapshots the state into fresh
    device buffers (one jitted copy, ~ms — required before returning: the
    training step donates the live buffers) and moves the HOST FETCH + disk
    write + meta + prune to a background thread; training overlaps both the
    ~10-13 s flagship-state fetch and the write
    (tools/ckpt_overlap_bench.py). At most one write is in flight — a newer
    save joins the older one first, preserving the meta-last crash-safety
    ordering — so at most one snapshot copy of the state occupies HBM at a
    time. Call wait_pending() before reading checkpoints back or exiting.

    retain>0 (--keep_ckpts) keeps only the newest `retain` per-epoch
    checkpoint dirs; "best" and step checkpoints are exempt, and pruning
    runs after meta lands (a crash mid-save never leaves meta pointing at a
    pruned dir).

    Returns the seconds this call spent blocked on the PREVIOUS async
    write (back-pressure: the checkpoint cadence is faster than the
    background fetch+write — the caller should log it and the user raise
    --checkpoint_every_steps)."""
    global _pending_writer
    root = _ckpt_dir(output)
    os.makedirs(root, exist_ok=True)
    if step_in_epoch is None:
        name = f"epoch_{epoch:04d}"
    else:
        name = f"epoch_{epoch:04d}_step_{step_in_epoch:08d}"
    path = os.path.join(root, name)
    # order writes; keeps at most one state copy alive (back-pressure wait)
    waited = wait_pending()
    do_async = not block and jax.process_count() == 1
    if do_async:
        # Donation-safe on-device snapshot (~ms); the 10-13 s host fetch of
        # the flagship state moves into the background thread with the write
        # (tools/ckpt_overlap_bench.py). Blocking saves fetch inline.
        src = _device_snapshot(state)
    else:
        src = _to_host(state)

    def _write() -> None:
        nonlocal src
        hs = _to_host_leafwise(src) if do_async else src
        # release the device snapshot now — the Orbax write below can take
        # 15-82 s and must not pin an extra full-state copy of HBM
        src = None
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, hs, force=True)
        ckptr.wait_until_finished()
        if is_best:
            best = os.path.join(root, "best")
            ckptr2 = ocp.StandardCheckpointer()
            ckptr2.save(best, hs, force=True)
            ckptr2.wait_until_finished()
        # meta last: a crash before this line leaves meta at the previous
        # complete checkpoint (resume-from-older is always safe)
        if jax.process_index() == 0:
            meta: Dict[str, Any] = {
                "epoch": epoch, "best_score": best_score, "dir": name,
            }
            if step_in_epoch is not None:
                meta["step_in_epoch"] = step_in_epoch
                meta["acc"] = acc or {}
            # epoch saves carry it too: epoch-boundary resume checks
            # steps_per_epoch against it (count-keyed LR alignment)
            if run_sig:
                meta["run"] = run_sig
            tmp = os.path.join(root, "meta.json.tmp")
            with open(tmp, "w") as fh:
                json.dump(meta, fh)
            os.replace(tmp, os.path.join(root, "meta.json"))
        # no process may see a checkpoint whose meta/best is still being
        # written
        _sync(f"regat_ckpt_{name}")
        if jax.process_index() == 0:
            _prune_step_checkpoints(root, keep=name)
            if retain > 0:
                _prune_epoch_checkpoints(root, retain, newest=name)

    if not do_async:
        _write()
        return waited

    import threading

    class _Writer(threading.Thread):
        error: Optional[BaseException] = None

        def run(self) -> None:
            try:
                _write()
            except BaseException as e:  # surfaced by wait_pending()
                self.error = e

    _pending_writer = _Writer(daemon=True)
    _pending_writer.start()
    return waited


def _prune_step_checkpoints(root: str, keep: str) -> None:
    """Drop step checkpoints superseded by `keep` (a newer step save within
    the same epoch, or the epoch save that completes them)."""
    import shutil

    for d in os.listdir(root):
        if "_step_" not in d or d == keep:
            continue
        if not os.path.isdir(os.path.join(root, d)):
            continue
        # an older step dir is superseded by any same/later-epoch save
        if d < keep or keep == d.split("_step_")[0]:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def _prune_epoch_checkpoints(root: str, retain: int, newest: str) -> None:
    """Retention (--keep_ckpts): keep `retain` epoch-dir slots. When
    `newest` is itself an epoch dir it fills one slot, leaving retain-1 for
    older dirs; when it is a mid-epoch STEP dir it fills none (step
    checkpoints never count against --keep_ckpts, so the last
    epoch-boundary fallback survives even at keep_ckpts=1 — a refused
    mid-epoch resume can still fall back to it). "best", step dirs, Orbax
    tmp dirs, and anything sorting >= `newest` (stale leftovers of a
    previous, longer run in the same output dir — this run never wrote
    them, so it never deletes them) are untouched."""
    import re
    import shutil

    slots = retain - 1 if re.fullmatch(r"epoch_\d{4}", newest) else retain
    epochs = sorted(
        d for d in os.listdir(root)
        if re.fullmatch(r"epoch_\d{4}", d) and d < newest
        and os.path.isdir(os.path.join(root, d))
    )
    for d in epochs[:-slots] if slots > 0 else epochs:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)


def latest_checkpoint(output: str) -> Optional[str]:
    """Path of the authoritative resume checkpoint: meta.json's "dir" when
    present (written last, so always complete), else the newest epoch dir
    (legacy layout; step dirs are excluded — without meta their accumulator
    sidecar is gone, so the last COMPLETED epoch is the safe resume point)."""
    root = _ckpt_dir(output)
    if not os.path.isdir(root):
        return None
    meta = restore_meta_full(output)
    if meta is not None and "dir" in meta:
        path = os.path.join(root, meta["dir"])
        if os.path.isdir(path):
            return path
    import re

    # strict epoch-dir match: a crash mid-save can leave an incomplete
    # 'epoch_NNNN.orbax-checkpoint-tmp-*' dir, which sorts AFTER the real
    # epoch dirs and must never be selected as the resume point
    epochs = [
        d for d in os.listdir(root)
        if re.fullmatch(r"epoch_\d{4}", d)
        and os.path.isdir(os.path.join(root, d))
    ]
    if not epochs:
        return None
    return os.path.join(root, sorted(epochs)[-1])


def restore_checkpoint(
    path: str, abstract_state: Dict[str, Any]
) -> Dict[str, Any]:
    """Restore against an abstract (shape/dtype/sharding) target state.

    Values come back as host numpy; leaves whose abstract counterpart is a
    sharded jax.Array are re-placed onto that sharding via put_global —
    required under multi-process (a later jit could not device_put host
    arrays onto a sharding spanning non-addressable devices), and a no-op
    placement change single-process."""
    from tf_vqa_regat_tpu.parallel.distributed import put_global

    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape")
        else x,
        abstract_state,
    )
    restored = ckptr.restore(path, target)
    return jax.tree.map(
        lambda r, a: put_global(r, a.sharding)
        if isinstance(a, jax.Array)
        else r,
        restored,
        abstract_state,
    )


def restore_meta(output: str) -> Tuple[int, float]:
    meta = restore_meta_full(output)
    if meta is None:
        return -1, -1.0
    return int(meta["epoch"]), float(meta["best_score"])


def restore_meta_full(output: str) -> Optional[Dict[str, Any]]:
    """The raw meta sidecar: {"epoch", "best_score", "dir", and for step
    checkpoints "step_in_epoch" + "acc"} — or None if no checkpoint meta."""
    meta_path = os.path.join(_ckpt_dir(output), "meta.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as fh:
        return json.load(fh)


def save_params_only(output: str, relation_type: str, fusion: str, params: Any) -> str:
    """The reference's final artifact
    ('{output}{relation_type}-{fusion}-pretrained_model.h5', main.py:145) —
    same naming contract, orbax format."""
    path = os.path.abspath(
        os.path.join(output, f"{relation_type}-{fusion}-pretrained_model")
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(params), force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path: str, abstract_params: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), abstract_params
    )
    restored = ckptr.restore(os.path.abspath(path), target)
    return restored
