"""Measure what --async_checkpoint actually hides at flagship scale.

A mid-epoch checkpoint (`--checkpoint_every_steps`, train/checkpoint.py)
has two cost components:
  1. the synchronous host fetch (`_to_host` / jax.device_get of the full
     TrainState — required either way: the train step donates the device
     buffers, so the state must be copied out before the next step), and
  2. the Orbax write + meta + prune — this is the part `block=False`
     moves to a background thread and overlaps with training.

This tool times, at the bench's flagship configuration (implicit+BUTD,
butd_vqa dims, batch 256, R=100, bf16 compute, real chip over the tunnel):
  - the components of one blocking save (fetch vs write),
  - a K-step training window with no checkpointing (baseline),
  - the same window with one blocking save in the middle,
  - the same window with one async save in the middle (joined after the
    timed region so only the non-hidden portion lands inside it).

Timing protocol per PERF_NOTES.md: every timed region ends with a
device_get of the last step's metrics, which chain through the donated
state — block_until_ready on independent programs can return early under
the tunnel runtime.

Result recorded in PERF_NOTES.md (async-checkpoint section). Run:
    python tools/ckpt_overlap_bench.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))


from bench import BATCH, NTOKEN, NUM_ANS, V_DIM, flagship_cfg
from tf_vqa_regat_tpu.data.device_store import DeviceStore
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.models.regat import init_regat, resolve_impl, trainable_mask
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from tf_vqa_regat_tpu.train import checkpoint as ckpt
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import build_store_train_step, init_train_state

R = 100
WINDOW = 40  # steps per timed window; one save in the middle


def _run_window(train_step, state, arrays, batches, base_rng, save_at=None,
                save_fn=None):
    """Run WINDOW steps; optionally call save_fn(state) after step save_at.
    Returns (elapsed_s, new_state)."""
    m = None
    t0 = time.time()
    for i, idx in enumerate(batches):
        state, m = train_step(state, arrays, idx, base_rng)
        if save_at is not None and i == save_at:
            ts = time.time()
            save_fn(state)
            print(f"    save_fn call: {(time.time()-ts)*1e3:.0f} ms", flush=True)
    jax.device_get(m["loss"])  # chains through every donated step
    return time.time() - t0, state


def main() -> None:
    cfg = flagship_cfg()
    mesh = make_mesh()
    impl = resolve_impl(cfg)
    bspec = batch_sharding(mesh)
    ds = synthetic_dataset(
        num_images=512, num_questions=8192, v_dim=V_DIM, num_ans=NUM_ANS,
        adaptive=True, seed=0,
    )
    store = DeviceStore(ds, sharding=replicated(mesh), feature_dtype="bfloat16")
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
    mask = trainable_mask(params, emb2_trainable=True)
    steps_per_epoch = (len(ds) + BATCH - 1) // BATCH
    optimizer = make_optimizer(
        cfg.base_lr, cfg.grad_clip, steps_per_epoch, cfg.lr_decay_rate,
        cfg.lr_decay_step, mask,
    )
    state = init_train_state(params, optimizer, mesh)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(state) if hasattr(x, "nbytes"))
    print(f"state size: {nbytes / 1e6:.0f} MB "
          f"({sum(x.size for x in jax.tree.leaves(state) if hasattr(x, 'size')) / 1e6:.1f}M elements)")

    train_step = build_store_train_step(
        cfg.replace(num_rois=R), NTOKEN, optimizer, mesh, impl, params,
        NUM_ANS, store.padding_idx,
    )
    base_rng = jax.random.PRNGKey(1)

    all_idx = []
    epoch = 0
    while len(all_idx) < WINDOW + 4:
        all_idx += [
            jax.device_put(idx, bspec)
            for _, idx in store.epoch_indices_bucketed(epoch, BATCH, [R], True, 0)
        ]
        epoch += 1

    out = tempfile.mkdtemp(prefix="ckpt_bench_")
    try:
        # warmup: compile + pipeline
        _, state = _run_window(train_step, state, store.arrays, all_idx[:4], base_rng)

        # --- component timings of one blocking save ---
        t0 = time.time()
        host_state = jax.device_get(state)
        t_fetch = time.time() - t0
        t0 = time.time()
        ckpt.save_checkpoint(out, host_state, 0, 0.0, False,
                             step_in_epoch=4, acc={}, block=True)
        t_write = time.time() - t0
        print(f"fetch-to-host: {t_fetch*1e3:.0f} ms   write(meta+prune): {t_write*1e3:.0f} ms")

        batches = all_idx[4:4 + WINDOW]

        def blocking_save(s):
            ckpt.save_checkpoint(out, s, 0, 0.0, False, step_in_epoch=20,
                                 acc={}, block=True)

        def async_save(s):
            ckpt.save_checkpoint(out, s, 0, 0.0, False, step_in_epoch=20,
                                 acc={}, block=False)

        results = {}
        for name, save_fn in [("baseline", None), ("blocking", blocking_save),
                              ("async", async_save)]:
            ts = []
            for _ in range(2):
                el, state = _run_window(
                    train_step, state, store.arrays, batches, base_rng,
                    save_at=None if save_fn is None else WINDOW // 2,
                    save_fn=save_fn,
                )
                ckpt.wait_pending()
                ts.append(el)
            results[name] = min(ts)
            qps = WINDOW * BATCH / results[name]
            print(f"{name:9s}: {results[name]*1e3:7.0f} ms / {WINDOW} steps "
                  f"({results[name]/WINDOW*1e3:.1f} ms/step, {qps:,.0f} q/s)")

        base = results["baseline"]
        print(f"save overhead inside the window: blocking "
              f"+{(results['blocking']-base)*1e3:.0f} ms, async "
              f"+{(results['async']-base)*1e3:.0f} ms "
              f"(hidden: {(results['blocking']-results['async'])*1e3:.0f} ms/save)")
    finally:
        ckpt.wait_pending()
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
