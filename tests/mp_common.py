"""Shared bootstrap for the multi-process subprocess drivers
(mp_driver.py, mp_ckpt_driver.py) — one copy of the JAX/distributed
runtime setup and of the tiny synthetic DeviceStore training rig, so the
data-feeding and checkpointing tests cannot drift apart (round-3 review
finding).

Call init_runtime() BEFORE importing jax anywhere else in the process
(XLA_FLAGS must be set pre-import); build_tiny_training() then constructs
the rig. Total global devices are fixed at 8 (nproc local processes with
8/nproc virtual CPU devices each), so the SPMD program is identical across
topologies and metrics must match bit-for-bit.
"""
import os
import sys
from types import SimpleNamespace

NTOKEN, V_DIM, NUM_ANS, BATCH = 40, 48, 11, 16


def init_runtime(nproc: int, pid: int, port: int):
    """Set XLA_FLAGS, force CPU, and (nproc>1) join the gloo coordination
    service. Must run before any other jax import in the process."""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
        )
    return jax


def build_tiny_training() -> SimpleNamespace:
    """The tiny flagship-shaped training rig both drivers run: synthetic
    adaptive dataset, replicated DeviceStore, jnp train/eval store steps.
    Deterministic (fixed seeds) so every topology produces the same
    metrics."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax

    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.device_store import DeviceStore
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
    from tf_vqa_regat_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated,
    )
    from tf_vqa_regat_tpu.train.optim import make_optimizer
    from tf_vqa_regat_tpu.train.step import (
        build_store_eval_step, build_store_train_step, init_train_state,
    )

    cfg = Config(
        batch_size=BATCH, num_hid=32, relation_dim=48, num_heads=4,
        nongt_dim=6, imp_pos_emb_dim=16, dir_num=2, num_steps=1,
        residual_connection=True, label_bias=False, dropout=0.2,
        fusion="butd", relation_type="implicit", num_rois=10, adaptive=True,
    )
    ds = synthetic_dataset(
        num_images=24, num_questions=64, v_dim=V_DIM, num_ans=NUM_ANS,
        adaptive=True, seed=0,
    )
    mesh = make_mesh()
    store = DeviceStore(ds, sharding=replicated(mesh))
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
    mask = trainable_mask(params, emb2_trainable=True)
    steps_per_epoch = (len(ds) + BATCH - 1) // BATCH
    optimizer = make_optimizer(
        cfg.base_lr, cfg.grad_clip, steps_per_epoch, cfg.lr_decay_rate,
        cfg.lr_decay_step, mask,
    )
    state = init_train_state(params, optimizer, mesh)
    train_step = build_store_train_step(
        cfg, NTOKEN, optimizer, mesh, "jnp", params, NUM_ANS,
        store.padding_idx,
    )
    eval_step = build_store_eval_step(
        cfg, NTOKEN, mesh, "jnp", NUM_ANS, store.padding_idx
    )
    return SimpleNamespace(
        cfg=cfg, ds=ds, mesh=mesh, store=store, params=params,
        optimizer=optimizer, state=state, train_step=train_step,
        eval_step=eval_step, bspec=batch_sharding(mesh),
        rng=jax.random.PRNGKey(7),
    )
