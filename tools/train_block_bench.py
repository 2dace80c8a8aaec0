"""Experiment: does scanning K train steps into ONE dispatched program beat
the per-step donated chain on the tunneled v5e?

Motivation: bench train shows ~25.7% padded MFU while the profiled step is
~31.6% device-busy MFU — ~19% of wall time the device sits idle between
chained steps. Blocked eval reclaimed the same class of gap (+16%,
step.py::build_store_eval_block). Train steps chain through the donated
state, which serializes *execution*, but each step is still a separate
program dispatch over the ~27 ms-RTT tunnel; this measures whether a
lax.scan block (K steps, one dispatch) recovers the idle time.

Measures the PRODUCTION builder (train/step.py::build_store_train_block —
lax.cond tail-skip, block-accumulated metrics), not a local replica, in two
regimes:
  * single bucket R=100 (isolates dispatch from the bucket mix);
  * --mix: the full roi-bucket epoch (36/64/100, the bench configuration),
    per-step chain vs blocked via the production stream grouping
    (train/loop.py::_block_batches_counted).

Protocol follows PERF_NOTES.md: warm every program (incl. the trivial
accumulator add), chain through donated state, and end every timed region
with a device_get of a value that transitively depends on every step.

Usage:  python tools/train_block_bench.py [--steps 64] [--ks 4,8,16] [--mix]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax
import numpy as np

from bench import BATCH, BUCKETS, NTOKEN, NUM_ANS, V_DIM, flagship_cfg
from tf_vqa_regat_tpu.data.device_store import DeviceStore
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.models.regat import init_regat, resolve_impl, trainable_mask
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from tf_vqa_regat_tpu.train.loop import _block_batches_counted
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import (
    build_store_train_block,
    build_store_train_step,
    init_train_state,
)


def _blkspec(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P(None, "data"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64,
                    help="single-bucket R=100 chain length")
    ap.add_argument("--ks", default="8")
    ap.add_argument("--mix", action="store_true",
                    help="also measure the full roi-bucket epoch (36/64/100)")
    ap.add_argument("--mix_steps", type=int, default=192,
                    help="approx. optimizer steps in the bucket-mix epoch")
    args = ap.parse_args()
    ks = [int(k) for k in args.ks.split(",")]

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(_HERE), ".jax_cache"),
    )
    cfg = flagship_cfg()
    mesh = make_mesh()
    impl = resolve_impl(cfg)
    bspec = batch_sharding(mesh)
    blkspec = _blkspec(mesh)

    nq = max(args.steps, args.mix_steps if args.mix else 0) * BATCH
    ds = synthetic_dataset(
        num_images=512, num_questions=nq, v_dim=V_DIM,
        num_ans=NUM_ANS, adaptive=True, seed=0,
    )
    store = DeviceStore(ds, sharding=replicated(mesh), feature_dtype="bfloat16")
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
    mask = trainable_mask(params, emb2_trainable=True)
    optimizer = make_optimizer(
        cfg.base_lr, cfg.grad_clip, args.steps, cfg.lr_decay_rate,
        cfg.lr_decay_step, mask,
    )
    rng = jax.random.PRNGKey(1)

    # ONE state threaded through every phase: the donated step deletes its
    # input buffers (init_train_state may alias the original params), so
    # re-initializing between phases would touch deleted arrays; the state's
    # numeric content is irrelevant to timing.
    state = init_train_state(params, optimizer, mesh)

    def build_step(R):
        return build_store_train_step(
            cfg.replace(num_rois=R), NTOKEN, optimizer, mesh, impl, params,
            NUM_ANS, store.padding_idx,
        )

    def build_block(R, K):
        return build_store_train_block(
            cfg.replace(num_rois=R), NTOKEN, optimizer, mesh, impl, params,
            NUM_ANS, store.padding_idx, block=K,
        )

    # ---------- single bucket R=100 (dispatch isolated from the mix) ----------
    R = 100
    step_fn = build_step(R)
    order = np.arange(args.steps * BATCH, dtype=np.int32)
    idxs = [
        jax.device_put(order[i * BATCH:(i + 1) * BATCH], bspec)
        for i in range(args.steps)
    ]
    for i in (0, 1, 2):  # compile + pipeline warm
        state, m = step_fn(state, store.arrays, idxs[i], rng)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for idx in idxs:
        state, m = step_fn(state, store.arrays, idx, rng)
    jax.device_get(m["loss"])
    per_step = (time.perf_counter() - t0) / args.steps
    print(f"[R=100] per-step chain: {per_step * 1e3:8.2f} ms/step  "
          f"{BATCH / per_step:8.0f} q/s", flush=True)

    for K in ks:
        nblocks = args.steps // K
        block_fn = build_block(R, K)
        blocks = [
            jax.device_put(order[b * K * BATCH:(b + 1) * K * BATCH]
                           .reshape(K, BATCH), blkspec)
            for b in range(nblocks)
        ]
        state, m = block_fn(state, store.arrays, blocks[0], rng)  # compile
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for blk in blocks:
            state, m = block_fn(state, store.arrays, blk, rng)
        jax.device_get(m["loss"])
        # nblocks * K executed steps, NOT args.steps: for K not dividing
        # --steps the remainder never ran (advisor finding, round 3)
        per = (time.perf_counter() - t0) / (nblocks * K)
        print(f"[R=100] block K={K:<3d}:    {per * 1e3:8.2f} ms/step  "
              f"{BATCH / per:8.0f} q/s   ({per_step / per:.3f}x per-step)",
              flush=True)

    if not args.mix:
        return

    # ---------- full bucket-mix epoch (the bench configuration) ----------
    # Same protocol as bench.py's train phase: one full bucketed epoch so the
    # bucket mix is unbiased; q/s counts REAL questions (idx >= 0) so tail
    # padding cannot inflate it. Blocked grouping is the production
    # _block_batches_counted — K same-size batches per block, tails padded
    # with -1 batches the lax.cond skips.
    raw = [
        (Rb, idx)
        for Rb, idx in store.epoch_indices_bucketed(0, BATCH, BUCKETS, True, 0)
    ]
    nreal_q = int(sum((idx >= 0).sum() for _, idx in raw))
    step_fns = {Rb: build_step(Rb) for Rb in BUCKETS}
    placed = [(Rb, jax.device_put(idx, bspec)) for Rb, idx in raw]

    warm = {}
    for Rb, idx in placed:
        warm.setdefault(Rb, idx)
    for Rb, idx in list(warm.items()) + [p for p in placed[:2]]:
        state, m = step_fns[Rb](state, store.arrays, idx, rng)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for Rb, idx in placed:
        state, m = step_fns[Rb](state, store.arrays, idx, rng)
    jax.device_get(m["loss"])
    mix_per_step_t = time.perf_counter() - t0
    print(f"[mix]   per-step chain: {mix_per_step_t / len(placed) * 1e3:8.2f}"
          f" ms/step  {nreal_q / mix_per_step_t:8.0f} q/s "
          f"({len(placed)} steps)", flush=True)

    for K in ks:
        block_fns = {Rb: build_block(Rb, K) for Rb in BUCKETS}
        blocks = [
            (Rb, jax.device_put(blk, blkspec), nr)
            for Rb, blk, nr in _block_batches_counted(iter(raw), K, BATCH)
        ]
        nsteps = sum(nr for _, _, nr in blocks)
        warm = {}
        for Rb, blk, _ in blocks:
            warm.setdefault(Rb, blk)
        for Rb, blk in warm.items():  # compile each bucket's block program
            state, m = block_fns[Rb](state, store.arrays, blk, rng)
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for Rb, blk, _ in blocks:
            state, m = block_fns[Rb](state, store.arrays, blk, rng)
        jax.device_get(m["loss"])
        t = time.perf_counter() - t0
        tail = sum(K - nr for _, _, nr in blocks)
        print(f"[mix]   block K={K:<3d}:    {t / nsteps * 1e3:8.2f} ms/step  "
              f"{nreal_q / t:8.0f} q/s   "
              f"({mix_per_step_t / t:.3f}x per-step; {len(blocks)} blocks, "
              f"{tail} padded tail slots)", flush=True)


if __name__ == "__main__":
    main()
