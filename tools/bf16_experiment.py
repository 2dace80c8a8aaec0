"""bf16 end-to-end experiment on the real TPU (round-1 verdict item 7).

Two questions, answered on hardware at flagship dims and recorded in
PERF_NOTES.md:

1. Throughput: does bf16 buy anything on top of the defaults? Variants:
     f32            — baseline (f32 tables, f32 activations)
     bf16-tables    — DeviceStore feature_dtype=bfloat16 (halved gather
                      traffic; gather casts back to f32)
     bf16-compute   — compute_dtype=bfloat16 (bf16 activations through the
                      model; params/optimizer stay f32)
     bf16-both      — both of the above
   Context: v5e default-precision f32 matmuls already run the MXU at
   near-bf16 rate (PERF_NOTES device ground truth), so the headroom is HBM
   traffic, not FLOPs.

2. Training dynamics: does bf16-compute still learn? 100-step overfit
   (dropout 0) on 16 examples, f32 vs bf16 final loss/score.

Usage: python tools/bf16_experiment.py   (on the axon TPU chip)
"""
import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache"))

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.data.device_store import DeviceStore
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.data.loader import BatchLoader
from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import (
    build_store_train_step,
    build_train_step,
    init_train_state,
)

from bench import BATCH, NTOKEN, NUM_ANS, V_DIM, flagship_cfg as _bench_flagship


def flagship_cfg(**kw):
    """bench.py's flagship dims (single source — a dim change there must not
    silently desynchronize this tool's recorded numbers), pinned to the
    single R=100 bucket this experiment measures. LR/compute fields reset to
    Config defaults: this tool predates bench's bf16/LR pinning and its
    recorded overfit curves were run with the defaults — each variant passes
    compute_dtype explicitly anyway."""
    d = Config()
    base = _bench_flagship().replace(
        num_rois=100, compute_dtype=d.compute_dtype, base_lr=d.base_lr,
        lr_decay_rate=d.lr_decay_rate, lr_decay_step=d.lr_decay_step,
    )
    return base.replace(**kw) if kw else base


def throughput(name, feature_dtype, compute_dtype):
    cfg = flagship_cfg(compute_dtype=compute_dtype)
    mesh = make_mesh()
    ds = synthetic_dataset(
        num_images=256, num_questions=4096, v_dim=V_DIM, num_ans=NUM_ANS,
        adaptive=True, seed=0,
    )
    store = DeviceStore(ds, sharding=replicated(mesh), feature_dtype=feature_dtype)
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
    opt = make_optimizer(
        cfg.base_lr, cfg.grad_clip, 16, cfg.lr_decay_rate, cfg.lr_decay_step,
        trainable_mask(params, True),
    )
    state = init_train_state(params, opt, mesh)
    step = build_store_train_step(
        cfg, NTOKEN, opt, mesh, "jnp", params, NUM_ANS, store.padding_idx
    )
    bspec = batch_sharding(mesh)
    rng = jax.random.PRNGKey(1)
    idxs = [
        jax.device_put(i, bspec)
        for i in store.epoch_indices(0, BATCH, shuffle=True, seed=0)
    ]
    for idx in idxs[:3]:  # compile + pipeline warmup
        state, m = step(state, store.arrays, idx, rng)
    jax.block_until_ready(m)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for idx in idxs:
            state, m = step(state, store.arrays, idx, rng)
        jax.block_until_ready(m)
        best = max(best, len(idxs) * BATCH / (time.perf_counter() - t0))
    print(f"throughput {name:13s}: {best:9.1f} train q/s", flush=True)
    return best


def overfit(compute_dtype):
    cfg = flagship_cfg(
        num_hid=64, relation_dim=96, nongt_dim=10, imp_pos_emb_dim=16,
        num_heads=4, batch_size=16, dropout=0.0, base_lr=1e-2,
        compute_dtype=compute_dtype,
    )
    ds = synthetic_dataset(num_images=4, num_questions=16, v_dim=24, num_ans=9)
    ntoken = ds.dictionary.ntoken
    mesh = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
    params = init_regat(jax.random.PRNGKey(0), cfg, ntoken, 24, 9)
    opt = make_optimizer(1e-2, cfg.grad_clip, 10000, 0.75, 2, trainable_mask(params, False))
    state = init_train_state(params, opt, mesh)
    step = build_train_step(cfg, ntoken, opt, mesh, "jnp", params)
    batch = jax.device_put(
        next(iter(BatchLoader(ds, 16, 12, shuffle=False).epoch(0))),
        batch_sharding(mesh),
    )
    rng = jax.random.PRNGKey(1)
    hist = []
    for i in range(100):
        state, m = step(state, batch, rng)
        if i % 10 == 0 or i == 99:
            hist.append(float(m["loss"]))
    last = jax.device_get(m)
    score = float(last["score"]) / float(last["n"])
    print(f"overfit {compute_dtype}: loss {hist[0]:.2f} -> {hist[-1]:.4f}, "
          f"score {score:.4f}", flush=True)
    return {"loss_curve": hist, "final_score": score}


def main():
    assert jax.default_backend() == "tpu", "run on the TPU chip"
    res = {"overfit": {}, "throughput": {}}
    res["overfit"]["float32"] = overfit("float32")
    res["overfit"]["bfloat16"] = overfit("bfloat16")
    res["throughput"]["f32"] = throughput("f32", "float32", "float32")
    res["throughput"]["bf16-tables"] = throughput("bf16-tables", "bfloat16", "float32")
    res["throughput"]["bf16-compute"] = throughput("bf16-compute", "float32", "bfloat16")
    res["throughput"]["bf16-both"] = throughput("bf16-both", "bfloat16", "bfloat16")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
