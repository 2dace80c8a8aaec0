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


def _tf_forward(model, cfg: Config, b: Dict[str, np.ndarray]):
    """One reference-semantics forward (train.py:97-105): host
    prepare_graph_variables + model(...) with no training kwarg."""
    import tensorflow as tf
    from model.position_emb import prepare_graph_variables  # reference host fn

    R = b["features"].shape[1]
    pos_emb, sem_adj, spa_adj = prepare_graph_variables(
        cfg.relation_type, b["bb"], None, None, R, cfg.nongt_dim,
        cfg.imp_pos_emb_dim, cfg.spa_label_num, cfg.sem_label_num,
    )
    return model(
        tf.constant(b["features"]), tf.constant(b["norm_bb"]),
        tf.constant(b["question"]),
        tf.constant(np.asarray(pos_emb, np.float32)),
        sem_adj, spa_adj,
    )


def _tf_one_step(model, optimizer, cfg: Config, num_ans: int, b) -> float:
    """One reference train step (train.py:103-119 semantics); returns
    loss_avg."""
    import tensorflow as tf

    target = tf.constant(b["target"])
    with tf.GradientTape() as tape:
        pred = _tf_forward(model, cfg, b)
        per = tf.nn.sigmoid_cross_entropy_with_logits(
            labels=target, logits=pred
        )
        loss_avg = tf.reduce_mean(per) * float(num_ans)  # train.py:107-108
    grads = tape.gradient(loss_avg, model.trainable_variables)
    grads = [tf.clip_by_norm(g, cfg.grad_clip) for g in grads]  # :111-112
    optimizer.apply_gradients(zip(grads, model.trainable_variables))
    return float(loss_avg.numpy())


def reference_trajectory_from_model(
    model: Any,
    cfg: Config,
    num_ans: int,
    batches: Sequence[Dict[str, np.ndarray]],
    steps: int,
) -> List[float]:
    """Train an already-built reference keras model in place; returns the
    per-step loss_avg values (reference train.py:103-119 semantics,
    constant base_lr — the epoch/LR-schedule variant is
    reference_trajectory_epochs)."""
    import tensorflow as tf

    optimizer = tf.keras.optimizers.Adamax(
        learning_rate=cfg.base_lr, beta_1=0.9, beta_2=0.999, epsilon=1e-8
    )  # train.py:48-49 (experimental == new-API Adamax)
    return [
        _tf_one_step(model, optimizer, cfg, num_ans, batches[s % len(batches)])
        for s in range(steps)
    ]


def reference_trajectory_epochs(
    model: Any,
    cfg: Config,
    num_ans: int,
    batches: Sequence[Dict[str, np.ndarray]],
    steps_per_epoch: int,
    epochs: int,
) -> Dict[str, List[float]]:
    """The reference's FULL multi-epoch loop semantics: the imperative LR
    assignment (warmup [1,1,1.2,1.3,1.4]*base over epochs 0-4, then
    lr *= decay_rate at epochs range(5, epochs, decay_step) — reference
    train.py:53-83) around the same per-step body, plus the reference's
    per-epoch eval pass (evaluate(), train.py:130-177: same forward without
    the tape, VQA score = soft target at the argmax answer).

    Returns {"loss": per-step, "lr": per-epoch effective LR,
    "eval_score": per-epoch score fraction} — the cross-framework oracle for
    the epoch-keyed schedule in train/optim.py::make_lr_schedule."""
    import tensorflow as tf

    optimizer = tf.keras.optimizers.Adamax(
        learning_rate=cfg.base_lr, beta_1=0.9, beta_2=0.999, epsilon=1e-8
    )
    warmup = [
        cfg.base_lr, cfg.base_lr, 1.2 * cfg.base_lr, 1.3 * cfg.base_lr,
        1.4 * cfg.base_lr,
    ]  # train.py:53 gradual_warmup_steps
    decay_epochs = set(range(5, epochs, cfg.lr_decay_step))  # train.py:54
    losses: List[float] = []
    lrs: List[float] = []
    eval_scores: List[float] = []
    step = 0
    for epoch in range(epochs):
        if epoch < len(warmup):  # train.py:66-71
            optimizer.learning_rate.assign(warmup[epoch])
        elif epoch in decay_epochs:  # train.py:73-77
            optimizer.learning_rate.assign(
                float(optimizer.learning_rate.numpy()) * cfg.lr_decay_rate
            )
        lrs.append(float(optimizer.learning_rate.numpy()))
        for _ in range(steps_per_epoch):
            losses.append(
                _tf_one_step(
                    model, optimizer, cfg, num_ans, batches[step % len(batches)]
                )
            )
            step += 1
        score = total = 0.0  # evaluate(), train.py:151-177
        for b in batches:
            pred = _tf_forward(model, cfg, b).numpy()
            hit = np.take_along_axis(
                b["target"], pred.argmax(-1)[:, None], axis=-1
            )[:, 0]
            score += float(hit.sum())
            total += len(hit)
        eval_scores.append(score / total)
    return {"loss": losses, "lr": lrs, "eval_score": eval_scores}


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


def jax_trajectory_epochs(
    cfg: Config,
    params: Any,
    ntoken: int,
    batches: Sequence[Dict[str, np.ndarray]],
    steps_per_epoch: int,
    epochs: int,
) -> Dict[str, List[float]]:
    """Multi-epoch counterpart of jax_trajectory: the PRODUCTION epoch-keyed
    LR schedule (make_optimizer with the real steps_per_epoch — warmup +
    x decay_rate at epochs 5, 5+step, ...) plus a per-epoch eval pass
    (apply_regat train=False, vqa_score_sum) over the same batches the TF
    oracle evaluates. Returns {"loss", "lr", "eval_score"} shaped exactly
    like reference_trajectory_epochs for direct comparison."""
    import jax

    from tf_vqa_regat_tpu.models.regat import apply_regat
    from tf_vqa_regat_tpu.train.loss import vqa_score_sum
    from tf_vqa_regat_tpu.train.optim import make_lr_schedule

    run = _JaxRunner(cfg, params, ntoken, steps_per_epoch)
    lr_fn = make_lr_schedule(
        cfg.base_lr, steps_per_epoch, cfg.lr_decay_rate, cfg.lr_decay_step
    )

    def eval_fn(params, batch):
        logits = apply_regat(params, cfg, batch, ntoken, train=False)
        return vqa_score_sum(logits, batch["target"], batch["valid"])

    eval_jit = jax.jit(eval_fn)

    losses: List[float] = []
    lrs: List[float] = []
    eval_scores: List[float] = []
    step = 0
    for epoch in range(epochs):
        lrs.append(float(lr_fn(epoch * steps_per_epoch)))
        for _ in range(steps_per_epoch):
            loss, _ = run.one_step(batches[step % len(batches)])
            losses.append(loss)
            step += 1
        score = total = 0.0
        for b in batches:
            batch = jax.device_put(dict(b), run.bspec)
            score += float(jax.device_get(eval_jit(run.params, batch)))
            total += b["target"].shape[0]
        eval_scores.append(score / total)
    return {"loss": losses, "lr": lrs, "eval_score": eval_scores}


class _JaxRunner:
    """Shared train-step driver for the trajectory harnesses: production
    build_train_step + make_optimizer from a deep-copied init."""

    def __init__(self, cfg, params, ntoken, steps_per_epoch: int):
        import jax
        import jax.numpy as jnp

        from tf_vqa_regat_tpu.models.regat import trainable_mask
        from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
        from tf_vqa_regat_tpu.train.optim import make_optimizer
        from tf_vqa_regat_tpu.train.step import (
            build_train_step,
            init_train_state,
        )

        mesh = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
        # Deep-copy: the donated train step would otherwise consume the
        # caller's buffers (device_put aliases arrays that already match the
        # sharding), breaking reuse of the same init across runs (the fix
        # A/B does exactly that).
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        mask = trainable_mask(params, emb2_trainable=False)
        opt = make_optimizer(
            cfg.base_lr, cfg.grad_clip, steps_per_epoch, cfg.lr_decay_rate,
            cfg.lr_decay_step, mask,
        )
        self.state = init_train_state(params, opt, mesh)
        self.step_fn = build_train_step(cfg, ntoken, opt, mesh, "jnp", params)
        self.bspec = batch_sharding(mesh)
        self.rng = jax.random.PRNGKey(0)  # unused: dropout must be 0
        assert cfg.dropout == 0.0, "trajectory equivalence requires dropout=0"

    @property
    def params(self):
        return self.state["params"]

    def one_step(self, b) -> tuple:
        import jax

        batch = jax.device_put(dict(b), self.bspec)
        self.state, m = self.step_fn(self.state, batch, self.rng)
        host = jax.device_get(m)
        return float(host["loss"]), float(host["score"]) / max(
            float(host["n"]), 1.0
        )


def _jax_run(cfg, params, ntoken, batches, steps):
    # Huge steps_per_epoch keeps the schedule in warmup epoch 0 -> constant
    # base_lr, matching the constant-LR TF runner
    # (reference_trajectory_from_model).
    run = _JaxRunner(cfg, params, ntoken, 10**9)
    losses, scores = [], []
    for step in range(steps):
        loss, score = run.one_step(batches[step % len(batches)])
        losses.append(loss)
        scores.append(score)
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
