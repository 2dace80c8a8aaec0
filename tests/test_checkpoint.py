"""Checkpoint/resume: roundtrip equality and the fault-injection contract —
killing training between epochs and resuming must reproduce the uninterrupted
run's numbers (SURVEY §5 failure-detection row)."""

import jax
import jax.numpy as jnp
import numpy as np

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.data.loader import BatchLoader
from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
from tf_vqa_regat_tpu.train import checkpoint as ckpt
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import build_train_step, init_train_state

CFG = Config(
    num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6, imp_pos_emb_dim=16,
    fusion="butd", relation_type="implicit", residual_connection=True,
    base_lr=5e-3,
)


def _setup():
    ds = synthetic_dataset(num_images=8, num_questions=64, v_dim=32, num_ans=9)
    ntoken = ds.dictionary.ntoken
    mesh = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
    params = init_regat(jax.random.PRNGKey(0), CFG, ntoken, 32, 9)
    mask = trainable_mask(params, False)
    opt = make_optimizer(CFG.base_lr, CFG.grad_clip, 4, 0.75, 2, mask)
    state = init_train_state(params, opt, mesh)
    step = build_train_step(CFG, ntoken, opt, mesh, "jnp", params)
    loader = BatchLoader(ds, 16, 12, shuffle=False)
    return mesh, state, step, loader


def test_checkpoint_roundtrip(tmp_path):
    out = str(tmp_path / "run") + "/"
    mesh, state, step, loader = _setup()
    batch = jax.device_put(next(iter(loader.epoch(0))), batch_sharding(mesh))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    ckpt.save_checkpoint(out, state, epoch=0, best_score=1.5, is_best=True)

    _, fresh, _, _ = _setup()
    latest = ckpt.latest_checkpoint(out)
    assert latest is not None and latest.endswith("epoch_0000")
    restored = ckpt.restore_checkpoint(latest, fresh)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state),
        jax.device_get(restored),
    )
    epoch, best = ckpt.restore_meta(out)
    assert epoch == 0 and best == 1.5


def test_kill_and_resume_reproduces_uninterrupted_run(tmp_path):
    out = str(tmp_path / "run") + "/"
    rng = jax.random.PRNGKey(1)

    # Uninterrupted: 4 steps.
    mesh, state, step, loader = _setup()
    batches = [
        jax.device_put(b, batch_sharding(mesh)) for b in list(loader.epoch(0))
    ]
    losses_full = []
    for b in batches:
        state, m = step(state, b, rng)
        losses_full.append(float(m["loss"]))
    params_full = jax.device_get(state["params"])

    # Interrupted: 2 steps, save, "crash", restore, 2 more steps.
    mesh, state, step, loader = _setup()
    for b in batches[:2]:
        state, m = step(state, b, rng)
    ckpt.save_checkpoint(out, state, epoch=0, best_score=0.0, is_best=False)
    del state

    _, fresh, step2, _ = _setup()
    state2 = ckpt.restore_checkpoint(ckpt.latest_checkpoint(out), fresh)
    losses_resumed = []
    for b in batches[2:]:
        state2, m = step2(state2, b, rng)
        losses_resumed.append(float(m["loss"]))
    np.testing.assert_allclose(losses_resumed, losses_full[2:], rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        params_full,
        jax.device_get(state2["params"]),
    )


def test_params_only_artifact(tmp_path):
    out = str(tmp_path / "m") + "/"
    mesh, state, _, _ = _setup()
    path = ckpt.save_params_only(out, "implicit", "butd", state["params"])
    assert "implicit-butd-pretrained_model" in path
    restored = ckpt.load_params(path, jax.device_get(state["params"]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(state["params"]),
        restored,
    )
