"""Grad-accumulation overhead at flagship shapes (PERF_NOTES.md table).

Measures chained device-store train q/s for --grad_accum k in {1,2,4}
(implicit+BUTD butd_vqa.json dims, bf16 tables+activations, single bucket
R=100). Protocol per PERF_NOTES: warm every program, chain through donated
state, end the timed region with a device_get.

Run ALONE on the attached TPU chip: python tools/grad_accum_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

from tf_vqa_regat_tpu.data.device_store import DeviceStore
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import build_store_train_step, init_train_state

import bench as B


def main():
    cfg0 = B.flagship_cfg().replace(num_rois=100)
    mesh = make_mesh()
    bspec = batch_sharding(mesh)
    ds = synthetic_dataset(
        num_images=512, num_questions=8192, v_dim=B.V_DIM, num_ans=B.NUM_ANS,
        adaptive=True, seed=0,
    )
    store = DeviceStore(ds, sharding=replicated(mesh), feature_dtype="bfloat16")
    params = init_regat(jax.random.PRNGKey(0), cfg0, B.NTOKEN, B.V_DIM, B.NUM_ANS)
    mask = trainable_mask(params, emb2_trainable=True)
    # host copy: init_train_state device_puts params into the (donated) state;
    # reusing device-resident arrays across variants would hit deleted buffers
    params = jax.device_get(params)
    opt = make_optimizer(cfg0.base_lr, cfg0.grad_clip, 32, 0.75, 2, mask)
    rng = jax.random.PRNGKey(1)
    idxs = [jax.device_put(i, bspec) for i in store.epoch_indices(0, B.BATCH, True, 0)]

    for accum in (1, 2, 4):
        cfg = cfg0.replace(grad_accum=accum)
        state = init_train_state(params, opt, mesh)
        step = build_store_train_step(
            cfg, B.NTOKEN, opt, mesh, "jnp", params, B.NUM_ANS, store.padding_idx
        )
        for idx in idxs[:3]:
            state, m = step(state, store.arrays, idx, rng)
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for _ in range(2):
            for idx in idxs:
                state, m = step(state, store.arrays, idx, rng)
        jax.device_get(m["loss"])
        dt = time.perf_counter() - t0
        print(
            f"grad_accum={accum}: {2 * len(ds) / dt:,.0f} q/s "
            f"({dt / (2 * len(idxs)) * 1e3:.2f} ms/step)",
            flush=True,
        )


if __name__ == "__main__":
    main()
