"""Experiment: does scanning K train steps into ONE dispatched program beat
the per-step donated chain on the tunneled v5e?

Motivation: bench train shows ~25.7% padded MFU while the profiled step is
~31.6% device-busy MFU — ~19% of wall time the device sits idle between
chained steps. Blocked eval reclaimed the same class of gap (+16%,
step.py::build_store_eval_block). Train steps chain through the donated
state, which serializes *execution*, but each step is still a separate
program dispatch over the ~27 ms-RTT tunnel; this measures whether a
lax.scan block (K steps, one dispatch) recovers the idle time.

Protocol follows PERF_NOTES.md: warm every program (incl. the trivial
accumulator add), chain through donated state, and end every timed region
with a device_get of a value that transitively depends on every step.

Usage:  python tools/train_block_bench.py [--steps 64] [--ks 4,8,16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax
import jax.numpy as jnp
import numpy as np

from bench import BATCH, NTOKEN, NUM_ANS, V_DIM, flagship_cfg
from tf_vqa_regat_tpu.data.device_store import DeviceStore
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.models.regat import init_regat, resolve_impl, trainable_mask
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import (
    _block_sharding,
    _store_gather,
    _train_core,
    build_store_train_step,
    init_train_state,
)
from tf_vqa_regat_tpu.parallel.mesh import train_state_shardings


def build_train_block(cfg, ntoken, optimizer, mesh, impl, params, num_ans,
                      padding_idx, block):
    """K train steps in one program: lax.scan carries the donated state."""
    state_sh = train_state_shardings(params, optimizer, mesh)
    gather, arrays_sh = _store_gather(cfg, mesh, num_ans, padding_idx, False)
    sp_mesh = mesh if cfg.sp_rois else None

    def train_block(state, arrays, idx_block, base_rng):
        def body(st, idx):
            st, m = _train_core(
                st, gather(arrays, idx), base_rng, cfg, ntoken, optimizer,
                impl, sp_mesh,
            )
            return st, m["loss"]

        state, losses = jax.lax.scan(body, state, idx_block)
        return state, {"loss": losses[-1]}

    rep = replicated(mesh)
    return jax.jit(
        train_block,
        donate_argnums=(0,),
        in_shardings=(state_sh, arrays_sh, _block_sharding(mesh), rep),
        out_shardings=(state_sh, rep),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--ks", default="8")
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

    ds = synthetic_dataset(
        num_images=512, num_questions=args.steps * BATCH, v_dim=V_DIM,
        num_ans=NUM_ANS, adaptive=True, seed=0,
    )
    store = DeviceStore(ds, sharding=replicated(mesh), feature_dtype="bfloat16")
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
    mask = trainable_mask(params, emb2_trainable=True)
    optimizer = make_optimizer(
        cfg.base_lr, cfg.grad_clip, args.steps, cfg.lr_decay_rate,
        cfg.lr_decay_step, mask,
    )
    # single bucket R=100 isolates dispatch from the bucket mix
    R = 100
    ccfg = cfg.replace(num_rois=R)
    step_fn = build_store_train_step(
        ccfg, NTOKEN, optimizer, mesh, impl, params, NUM_ANS,
        store.padding_idx,
    )
    rng = jax.random.PRNGKey(1)

    order = np.arange(args.steps * BATCH, dtype=np.int32)
    idxs = [
        jax.device_put(order[i * BATCH:(i + 1) * BATCH], bspec)
        for i in range(args.steps)
    ]

    # --- per-step chained baseline ---
    # ONE state threaded through every phase: the donated step deletes its
    # input buffers (init_train_state may alias the original params), so
    # re-initializing between phases would touch deleted arrays; the state's
    # numeric content is irrelevant to timing.
    state = init_train_state(params, optimizer, mesh)
    for i in (0, 1, 2):  # compile + pipeline warm
        state, m = step_fn(state, store.arrays, idxs[i], rng)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    for idx in idxs:
        state, m = step_fn(state, store.arrays, idx, rng)
    jax.device_get(m["loss"])
    per_step = (time.perf_counter() - t0) / args.steps
    print(f"per-step chain: {per_step * 1e3:8.2f} ms/step  "
          f"{BATCH / per_step:8.0f} q/s")

    from jax.sharding import NamedSharding, PartitionSpec as P
    blkspec = NamedSharding(mesh, P(None, "data"))
    for K in ks:
        nblocks = args.steps // K
        block_fn = build_train_block(
            ccfg, NTOKEN, optimizer, mesh, impl, params, NUM_ANS,
            store.padding_idx, K,
        )
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
        per = (time.perf_counter() - t0) / args.steps
        print(f"block K={K:<3d}:    {per * 1e3:8.2f} ms/step  "
              f"{BATCH / per:8.0f} q/s   ({per_step / per:.3f}x per-step)")


if __name__ == "__main__":
    main()
