"""Cross-framework training-trajectory equivalence harness.

The strongest executable evidence for the accuracy north star (SURVEY §6,
BASELINE.md: >=63.2% VQA 2.0): instantiate the reference's OWN TensorFlow
model, copy its randomly-initialized weights into this framework's pytree,
run N train steps in BOTH frameworks on the SAME batches with matched
optimizer semantics, and compare per-step loss trajectories. If the
trajectories agree to float tolerance, the full pipeline — forward, backward,
per-tensor clip, Adamax, LR — reproduces the reference's training dynamics by
construction, not just eval-mode layer parity.

Matched-semantics notes (each item is load-bearing):

- **Dropout must be 0** (cfg.dropout=0): PRNG streams cannot be matched
  across frameworks. This costs little fidelity: the reference's training
  loop calls ``model(...)`` WITHOUT ``training=True`` (reference
  train.py:103-105), so keras resolves ``training=None`` -> learning phase
  False and its Dropout layers are inactive during training anyway — the
  committed 63.24% run effectively trained without dropout.
- **Reference quirks on**: cfg.ref_compat_q_att + cfg.ref_compat_pos
  reproduce the reference's two transcription bugs (softmax-over-batch
  question attention, row-sliced position pairing) so forwards agree
  exactly; flipping them off quantifies each fix (the A/B in
  tools/trajectory_equivalence.py).
- **Optimizer**: the reference uses
  ``tensorflow.keras.optimizers.experimental.Adamax`` (train.py:15,48-49) —
  the new-API optimizer whose sparse (IndexedSlices, from the embedding
  lookup) path is *dense-equivalent* (m/u decay every row; the variable
  update applies the full momentum tensor), matching optax.adamax exactly.
  The old OptimizerV2 ``legacy.Adamax`` sparse path is lazy (touched rows
  only) and would NOT match — this harness pins the one the reference
  imports.
- **Clipping**: per-tensor ``tf.clip_by_norm(g, grad_clip)``
  (train.py:111-112) == train/optim.py::clip_per_tensor.
- **Loss**: ``mean(sigmoid_ce) * num_answers`` (train.py:20-26, 107-108)
  == train/loss.py::bce_with_logits_sum for all-valid batches.
- **Frozen leaves**: the reference's second word-embedding table is
  ``trainable=False`` (language_model.py:56-58) == trainable_mask's
  emb2_trainable=False. The softmax-shift-invariant biases this framework
  additionally freezes (models/regat.py::trainable_mask) DO drift in TF under
  Adamax-amplified float noise, but a uniform shift into a softmax cannot
  change any activation, so loss trajectories are unaffected.
- **All rois valid**: batches must have every roi real (e.g. the fixed-36
  fixture) — the reference attends to zero-padded keys instead of masking
  (dataset.py:329-355), so padded batches would diverge by design.

Requires tensorflow + tf_keras (dev images); import is call-time gated.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import numpy as np

from tf_vqa_regat_tpu.config import Config


def reference_trajectory_from_model(
    model: Any,
    cfg: Config,
    num_ans: int,
    batches: Sequence[Dict[str, np.ndarray]],
    steps: int,
) -> List[float]:
    """Train an already-built reference keras model in place; returns the
    per-step loss_avg values (reference train.py:103-119 semantics)."""
    import tensorflow as tf
    from model.position_emb import prepare_graph_variables  # reference host fn

    optimizer = tf.keras.optimizers.Adamax(
        learning_rate=cfg.base_lr, beta_1=0.9, beta_2=0.999, epsilon=1e-8
    )  # train.py:48-49 (experimental == new-API Adamax)

    losses = []
    for step in range(steps):
        b = batches[step % len(batches)]
        R = b["features"].shape[1]
        pos_emb, sem_adj, spa_adj = prepare_graph_variables(
            cfg.relation_type, b["bb"], None, None, R, cfg.nongt_dim,
            cfg.imp_pos_emb_dim, cfg.spa_label_num, cfg.sem_label_num,
        )
        target = tf.constant(b["target"])
        with tf.GradientTape() as tape:
            pred = model(
                tf.constant(b["features"]), tf.constant(b["norm_bb"]),
                tf.constant(b["question"]),
                tf.constant(np.asarray(pos_emb, np.float32)),
                sem_adj, spa_adj,
            )  # train.py:103-105 — note: no training kwarg, like the reference
            per = tf.nn.sigmoid_cross_entropy_with_logits(
                labels=target, logits=pred
            )
            loss_avg = tf.reduce_mean(per) * float(num_ans)  # train.py:107-108
        grads = tape.gradient(loss_avg, model.trainable_variables)
        grads = [tf.clip_by_norm(g, cfg.grad_clip) for g in grads]  # :111-112
        optimizer.apply_gradients(zip(grads, model.trainable_variables))
        losses.append(float(loss_avg.numpy()))
    return losses


def jax_trajectory_with_scores(
    cfg: Config,
    params: Any,
    ntoken: int,
    batches: Sequence[Dict[str, np.ndarray]],
    steps: int,
) -> Dict[str, List[float]]:
    """Like jax_trajectory but also records the per-step train VQA score
    fraction (used by the fix A/B in tools/trajectory_equivalence.py)."""
    losses, scores = _jax_run(cfg, params, ntoken, batches, steps)
    return {"loss": losses, "score": scores}


def jax_trajectory(
    cfg: Config,
    params: Any,
    ntoken: int,
    batches: Sequence[Dict[str, np.ndarray]],
    steps: int,
) -> List[float]:
    """Run `steps` train steps through this framework's production train step
    (train/step.py::build_train_step) with matched optimizer semantics.
    Returns per-step losses."""
    return _jax_run(cfg, params, ntoken, batches, steps)[0]


def _jax_run(cfg, params, ntoken, batches, steps):
    import jax

    from tf_vqa_regat_tpu.models.regat import trainable_mask
    from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
    from tf_vqa_regat_tpu.train.optim import make_optimizer
    from tf_vqa_regat_tpu.train.step import build_train_step, init_train_state

    mesh = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
    # Deep-copy: the donated train step would otherwise consume the caller's
    # buffers (device_put aliases arrays that already match the sharding),
    # breaking reuse of the same init across runs (the fix A/B does exactly
    # that).
    import jax.numpy as jnp

    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    mask = trainable_mask(params, emb2_trainable=False)
    # Huge steps_per_epoch keeps the schedule in warmup epoch 0 -> constant
    # base_lr, matching the TF runner above.
    opt = make_optimizer(
        cfg.base_lr, cfg.grad_clip, 10**9, cfg.lr_decay_rate,
        cfg.lr_decay_step, mask,
    )
    state = init_train_state(params, opt, mesh)
    step_fn = build_train_step(cfg, ntoken, opt, mesh, "jnp", params)
    bspec = batch_sharding(mesh)
    rng = jax.random.PRNGKey(0)  # unused: dropout must be 0 (module docstring)
    assert cfg.dropout == 0.0, "trajectory equivalence requires dropout=0"

    losses, scores = [], []
    for step in range(steps):
        batch = jax.device_put(dict(batches[step % len(batches)]), bspec)
        state, m = step_fn(state, batch, rng)
        host = jax.device_get(m)
        losses.append(float(host["loss"]))
        scores.append(float(host["score"]) / max(float(host["n"]), 1.0))
    return losses, scores


def make_trajectory_batches(
    dataset, batch_size: int, num_rois: int
) -> List[Dict[str, np.ndarray]]:
    """Fixed-order, all-valid batches shared by both frameworks."""
    from tf_vqa_regat_tpu.data.loader import BatchLoader

    loader = BatchLoader(dataset, batch_size, num_rois, shuffle=False)
    batches = []
    for b in loader.epoch(0):
        assert bool(np.all(b["valid"])), (
            "trajectory batches must be fully valid (pick sizes where "
            "batch_size divides the dataset)"
        )
        assert int(b["num_boxes"].min()) == num_rois, (
            "trajectory batches must have every roi real (fixed-size "
            "features): the reference attends to zero-padded keys instead "
            "of masking them"
        )
        batches.append({k: np.asarray(v) for k, v in b.items()})
    return batches
