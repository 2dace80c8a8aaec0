"""Jitted train/eval steps over the device mesh.

One donated pjit train step per run: grads + Adamax update + on-device metric
accumulation, with the batch sharded over the data axis and params replicated
(or TP-sharded). The reference's per-step eager GradientTape + host .numpy()
metric pulls (train.py:103-119) collapse into a single XLA program with no
host sync except the print-frequency device_get in the loop.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.models.regat import apply_regat
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, param_shardings, replicated
from tf_vqa_regat_tpu.train.loss import bce_with_logits_sum, vqa_score_sum

TrainState = Dict[str, Any]  # {"params", "opt_state", "step"}


def init_train_state(
    params: Any, optimizer: optax.GradientTransformation, mesh
) -> TrainState:
    """Place params per the sharding rules, then let GSPMD lay out the
    optimizer state to match (mu/nu inherit the param shardings)."""
    pspec = param_shardings(params, mesh)
    params = jax.device_put(params, pspec)
    opt_state = jax.jit(optimizer.init)(params)
    step = jax.device_put(jnp.zeros((), jnp.int32), replicated(mesh))
    return {"params": params, "opt_state": opt_state, "step": step}


def build_train_step(
    cfg: Config,
    ntoken: int,
    optimizer: optax.GradientTransformation,
    mesh,
    impl: str,
) -> Callable[
    [TrainState, Dict[str, jax.Array], jax.Array],
    Tuple[TrainState, Dict[str, jax.Array]],
]:
    def train_step(state, batch, base_rng):
        rng = jax.random.fold_in(base_rng, state["step"])

        def loss_fn(params):
            logits = apply_regat(
                params, cfg, batch, ntoken, train=True, rng=rng, impl=impl
            )
            loss = bce_with_logits_sum(logits, batch["target"], batch["valid"])
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        metrics = {
            "loss": loss,
            "score": vqa_score_sum(logits, batch["target"], batch["valid"]),
            "n": jnp.sum(batch["valid"].astype(jnp.float32)),
        }
        new_state = {
            "params": params,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, metrics

    rep = replicated(mesh)
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(None, batch_sharding(mesh), rep),
        out_shardings=(None, rep),
    )


def build_eval_step(
    cfg: Config, ntoken: int, mesh, impl: str
) -> Callable[[Any, Dict[str, jax.Array]], Dict[str, jax.Array]]:
    def eval_step(params, batch):
        logits = apply_regat(params, cfg, batch, ntoken, train=False, impl=impl)
        return {
            "loss": bce_with_logits_sum(logits, batch["target"], batch["valid"]),
            "score": vqa_score_sum(logits, batch["target"], batch["valid"]),
            "n": jnp.sum(batch["valid"].astype(jnp.float32)),
        }

    rep = replicated(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=rep,
    )
