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
from tf_vqa_regat_tpu.parallel.mesh import (
    batch_sharding,
    replicated,
    train_state_shardings,
)
from tf_vqa_regat_tpu.train.loss import bce_with_logits_sum, vqa_score_sum

TrainState = Dict[str, Any]  # {"params", "opt_state", "step"}


def init_train_state(
    params: Any, optimizer: optax.GradientTransformation, mesh
) -> TrainState:
    """Build the train state placed against its explicit shardings (params per
    the TP rules, optimizer moments following them, scalars replicated)."""
    from tf_vqa_regat_tpu.parallel.distributed import put_global, put_global_tree

    shardings = train_state_shardings(params, optimizer, mesh)
    params = put_global_tree(params, shardings["params"])
    opt_state = jax.jit(optimizer.init, out_shardings=shardings["opt_state"])(params)
    step = put_global(jnp.zeros((), jnp.int32), shardings["step"])
    return {"params": params, "opt_state": opt_state, "step": step}


def _accum_grads(params, batch, rng, cfg, ntoken, impl, sp_mesh, accum):
    """Microbatched gradient accumulation (cfg.grad_accum > 1).

    The batch splits into `accum` strided microbatches — [B] reshapes to
    [B/accum, accum] (a local reshape on a batch-dim-sharded array: device d's
    contiguous rows stay device d's), then the accum axis moves to the front
    for lax.scan. Per microbatch we take the gradient of the SUM of
    per-example losses; the accumulated sum-grad divided by the global valid
    count is exactly the single-pass step's batch-mean gradient (modulo fp
    summation order), so the downstream per-tensor clip + Adamax update see
    identical inputs. Peak activation memory drops by the factor: XLA keeps
    one microbatch's activations live at a time.

    Dropout draws a distinct folded key per microbatch (fold_in(rng, a)) —
    a different mask realization than the single-pass step, same
    distribution."""

    def split(x):
        mb = x.shape[0] // accum
        return jnp.moveaxis(x.reshape(mb, accum, *x.shape[1:]), 1, 0)

    mbatch = jax.tree_util.tree_map(split, batch)

    def sum_loss_fn(p, mb, a):
        logits = apply_regat(
            p, cfg, mb, ntoken, train=True,
            rng=jax.random.fold_in(rng, a), impl=impl, sp_mesh=sp_mesh,
        )
        n = jnp.sum(mb["valid"].astype(jnp.float32))
        # bce_with_logits_sum is a valid-count mean; rescale to a sum so
        # microbatch contributions add linearly across the scan.
        loss_sum = bce_with_logits_sum(logits, mb["target"], mb["valid"]) * n
        return loss_sum, (logits, n)

    def body(acc, xs):
        mb, a = xs
        (loss_sum, (logits, n)), g = jax.value_and_grad(
            sum_loss_fn, has_aux=True
        )(params, mb, a)
        return (
            {
                "grads": jax.tree_util.tree_map(jnp.add, acc["grads"], g),
                "loss_sum": acc["loss_sum"] + loss_sum,
                "score": acc["score"]
                + vqa_score_sum(logits, mb["target"], mb["valid"]),
                "n": acc["n"] + n,
            },
            None,
        )

    acc0 = {
        "grads": jax.tree_util.tree_map(jnp.zeros_like, params),
        "loss_sum": jnp.zeros(()),
        "score": jnp.zeros(()),
        "n": jnp.zeros(()),
    }
    acc, _ = jax.lax.scan(body, acc0, (mbatch, jnp.arange(accum)))
    n = jnp.maximum(acc["n"], 1.0)
    grads = jax.tree_util.tree_map(lambda g: g / n, acc["grads"])
    metrics = {"loss": acc["loss_sum"] / n, "score": acc["score"], "n": acc["n"]}
    return grads, metrics


def _train_core(state, batch, base_rng, cfg, ntoken, optimizer, impl, sp_mesh=None):
    rng = jax.random.fold_in(base_rng, state["step"])

    if cfg.grad_accum > 1:
        grads, metrics = _accum_grads(
            state["params"], batch, rng, cfg, ntoken, impl, sp_mesh,
            cfg.grad_accum,
        )
    else:
        def loss_fn(params):
            logits = apply_regat(
                params, cfg, batch, ntoken, train=True, rng=rng, impl=impl,
                sp_mesh=sp_mesh,
            )
            loss = bce_with_logits_sum(logits, batch["target"], batch["valid"])
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )
        metrics = {
            "loss": loss,
            "score": vqa_score_sum(logits, batch["target"], batch["valid"]),
            "n": jnp.sum(batch["valid"].astype(jnp.float32)),
        }
    updates, opt_state = optimizer.update(grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    new_state = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
    return new_state, metrics


def _eval_core(params, batch, cfg, ntoken, impl, sp_mesh=None):
    logits = apply_regat(
        params, cfg, batch, ntoken, train=False, impl=impl, sp_mesh=sp_mesh
    )
    return {
        "loss": bce_with_logits_sum(logits, batch["target"], batch["valid"]),
        "score": vqa_score_sum(logits, batch["target"], batch["valid"]),
        "n": jnp.sum(batch["valid"].astype(jnp.float32)),
    }


def build_train_step(
    cfg: Config,
    ntoken: int,
    optimizer: optax.GradientTransformation,
    mesh,
    impl: str,
    params: Any,
) -> Callable[
    [TrainState, Dict[str, jax.Array], jax.Array],
    Tuple[TrainState, Dict[str, jax.Array]],
]:
    """Host-streaming variant: the batch dict arrives from the prefetch
    pipeline. `params` may be concrete or abstract — only shapes/structure are
    used to pin the state shardings on both sides of the donated jit (stable
    cache key: exactly one compilation per run)."""
    state_sh = train_state_shardings(params, optimizer, mesh)

    sp_mesh = mesh if cfg.sp_rois else None

    def train_step(state, batch, base_rng):
        return _train_core(
            state, batch, base_rng, cfg, ntoken, optimizer, impl, sp_mesh
        )

    rep = replicated(mesh)
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(state_sh, batch_sharding(mesh), rep),
        out_shardings=(state_sh, rep),
    )


def _store_gather(cfg: Config, mesh, num_ans: int, padding_idx: int, sharded: bool):
    """(gather(arrays, idx) -> batch, arrays-sharding) for a store mode — the
    ONE thing that differs between the device and sharded variants of every
    store step builder. Device mode: tables replicated, plain on-device
    gather (data/device_store.py). Sharded mode: tables partitioned over the
    data axis, each device gathering from its local slice inside shard_map
    (data/sharded_store.py)."""
    if sharded:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tf_vqa_regat_tpu.data.sharded_store import build_sharded_gather
        from tf_vqa_regat_tpu.parallel.mesh import DATA_AXIS

        gather = build_sharded_gather(
            mesh, cfg.resolved_num_rois(), num_ans, padding_idx
        )
        return gather, NamedSharding(mesh, P(DATA_AXIS))
    from tf_vqa_regat_tpu.data.device_store import gather_batch

    R = cfg.resolved_num_rois()

    def gather(arrays, idx):
        return gather_batch(arrays, idx, R, num_ans, padding_idx)

    return gather, replicated(mesh)


def _block_sharding(mesh):
    """[K, B] index blocks: the batch axis (axis 1) shards over data."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tf_vqa_regat_tpu.parallel.mesh import DATA_AXIS

    return NamedSharding(mesh, P(None, DATA_AXIS))


def _build_any_store_train_step(
    cfg, ntoken, optimizer, mesh, impl, params, num_ans, padding_idx, sharded
):
    state_sh = train_state_shardings(params, optimizer, mesh)
    gather, arrays_sh = _store_gather(cfg, mesh, num_ans, padding_idx, sharded)
    sp_mesh = mesh if cfg.sp_rois else None

    def train_step(state, arrays, idx, base_rng):
        return _train_core(
            state, gather(arrays, idx), base_rng, cfg, ntoken, optimizer,
            impl, sp_mesh,
        )

    rep = replicated(mesh)
    return jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(state_sh, arrays_sh, batch_sharding(mesh), rep),
        out_shardings=(state_sh, rep),
    )


def _build_any_store_train_block(
    cfg, ntoken, optimizer, mesh, impl, params, num_ans, padding_idx, block,
    sharded,
):
    state_sh = train_state_shardings(params, optimizer, mesh)
    gather, arrays_sh = _store_gather(cfg, mesh, num_ans, padding_idx, sharded)
    sp_mesh = mesh if cfg.sp_rois else None

    def train_block(state, arrays, idx_block, base_rng):
        # trace-time contract, like eval_block: the caller's stream grouping
        # sized the blocks; a mismatched [K', B] would silently run K' steps
        # while step accounting assumes K
        assert idx_block.shape[0] == block, (idx_block.shape, block)

        def real(st, idx):
            return _train_core(
                st, gather(arrays, idx), base_rng, cfg, ntoken, optimizer,
                impl, sp_mesh,
            )

        def skip(st, idx):
            # tail-padding batch (all idx == -1): the state — params,
            # optimizer moments, step counter (hence the RNG fold and the
            # count-keyed LR schedule) — passes through UNTOUCHED, so a
            # padded tail is exactly equivalent to ending the scan early
            zeros = {
                "loss": jnp.zeros(()),
                "score": jnp.zeros(()),
                "n": jnp.zeros(()),
            }
            return st, zeros

        def body(carry, idx):
            st, acc, last = carry
            st, m = jax.lax.cond(jnp.any(idx >= 0), real, skip, st, idx)
            acc = {
                "loss_sum": acc["loss_sum"] + m["loss"] * m["n"],
                "score": acc["score"] + m["score"],
                "n": acc["n"] + m["n"],
            }
            last = jnp.where(m["n"] > 0, m["loss"], last)
            return (st, acc, last), None

        zeros = {
            "loss_sum": jnp.zeros(()),
            "score": jnp.zeros(()),
            "n": jnp.zeros(()),
        }
        (state, acc, last), _ = jax.lax.scan(
            body, (state, zeros, jnp.zeros(())), idx_block
        )
        # "loss" = the last real step's loss (the per-step contract the
        # progress line prints); "loss_sum" is block-accumulated so the
        # loop's accumulator does NOT reconstruct it as loss * n
        return state, {"loss": last, **acc}

    rep = replicated(mesh)
    return jax.jit(
        train_block,
        donate_argnums=(0,),
        in_shardings=(state_sh, arrays_sh, _block_sharding(mesh), rep),
        out_shardings=(state_sh, rep),
    )


def _build_any_store_eval_step(
    cfg, ntoken, mesh, impl, num_ans, padding_idx, sharded
):
    gather, arrays_sh = _store_gather(cfg, mesh, num_ans, padding_idx, sharded)
    sp_mesh = mesh if cfg.sp_rois else None

    def eval_step(params, arrays, idx):
        return _eval_core(params, gather(arrays, idx), cfg, ntoken, impl, sp_mesh)

    return jax.jit(
        eval_step,
        in_shardings=(None, arrays_sh, batch_sharding(mesh)),
        out_shardings=replicated(mesh),
    )


def _build_any_store_eval_block(
    cfg, ntoken, mesh, impl, num_ans, padding_idx, block, sharded
):
    gather, arrays_sh = _store_gather(cfg, mesh, num_ans, padding_idx, sharded)
    sp_mesh = mesh if cfg.sp_rois else None

    def eval_block(params, arrays, idx_block):
        # trace-time contract: `block` sized the caller's stream grouping
        # (blocked_eval_stream); a mismatched [K', B] block would silently
        # scan K' batches while ETA/accounting assume K (review finding)
        assert idx_block.shape[0] == block, (idx_block.shape, block)

        def body(acc, idx):
            m = _eval_core(params, gather(arrays, idx), cfg, ntoken, impl, sp_mesh)
            return (
                {
                    "loss_sum": acc["loss_sum"] + m["loss"] * m["n"],
                    "score": acc["score"] + m["score"],
                    "n": acc["n"] + m["n"],
                },
                None,
            )

        zeros = {
            "loss_sum": jnp.zeros(()),
            "score": jnp.zeros(()),
            "n": jnp.zeros(()),
        }
        acc, _ = jax.lax.scan(body, zeros, idx_block)
        return {
            "loss": acc["loss_sum"] / jnp.maximum(acc["n"], 1.0),
            "score": acc["score"],
            "n": acc["n"],
        }

    return jax.jit(
        eval_block,
        in_shardings=(None, arrays_sh, _block_sharding(mesh)),
        out_shardings=replicated(mesh),
    )


def _build_any_store_predict_block(
    cfg, ntoken, mesh, impl, num_ans, padding_idx, block, sharded
):
    gather, arrays_sh = _store_gather(cfg, mesh, num_ans, padding_idx, sharded)
    sp_mesh = mesh if cfg.sp_rois else None

    def predict_block(params, arrays, idx_block):
        assert idx_block.shape[0] == block, (idx_block.shape, block)

        def body(carry, idx):
            logits = apply_regat(
                params, cfg, gather(arrays, idx), ntoken, train=False,
                impl=impl, sp_mesh=sp_mesh,
            )
            return carry, jnp.argmax(logits, axis=-1).astype(jnp.int32)

        _, labels = jax.lax.scan(body, None, idx_block)
        return labels  # [K, B]

    # labels REPLICATED ([K, B] int32 is tiny): every process can fetch the
    # full result under multi-process — a data-sharded output would span
    # non-addressable devices on other hosts
    return jax.jit(
        predict_block,
        in_shardings=(None, arrays_sh, _block_sharding(mesh)),
        out_shardings=replicated(mesh),
    )


def build_store_train_step(
    cfg: Config,
    ntoken: int,
    optimizer: optax.GradientTransformation,
    mesh,
    impl: str,
    params: Any,
    num_ans: int,
    padding_idx: int,
):
    """Device-store variant: feature tables stay resident in HBM; the per-step
    host->device transfer is just the [batch] int32 index vector, and batch
    assembly is an on-device gather fused into the step
    (data/device_store.py). Signature: (state, arrays, idx, base_rng)."""
    return _build_any_store_train_step(
        cfg, ntoken, optimizer, mesh, impl, params, num_ans, padding_idx,
        sharded=False,
    )


def build_store_train_block(
    cfg: Config,
    ntoken: int,
    optimizer: optax.GradientTransformation,
    mesh,
    impl: str,
    params: Any,
    num_ans: int,
    padding_idx: int,
    block: int,
):
    """Run `block` train steps in ONE dispatched program: a lax.scan carries
    the donated train state through K optimizer updates (--train_block).

    The donated per-step chain serializes execution but still pays a
    per-step dispatch (client-side jit call over the ~300-buffer state tree
    + tunnel round trip); scanning K steps amortizes it (+3.7% at R=100,
    +4.1% at the production bucket mix, K=8 on the tunneled v5e —
    tools/train_block_bench.py, PERF_NOTES.md; this is the --train_block
    auto default, train/loop.py::resolve_train_block). Tail blocks pad with all -1
    index batches which a lax.cond passes through without touching the
    state — no optimizer update, no step/LR advance, zero metric weight —
    so blocked training is step-for-step identical to the per-step program
    on the same batch order.

    Signature: (state, arrays, idx_block [K, B], base_rng) ->
    (state, {"loss": last real step's loss, "loss_sum", "score", "n"
    summed over the block})."""
    return _build_any_store_train_block(
        cfg, ntoken, optimizer, mesh, impl, params, num_ans, padding_idx,
        block, sharded=False,
    )


def build_store_eval_step(
    cfg: Config, ntoken: int, mesh, impl: str, num_ans: int, padding_idx: int
):
    return _build_any_store_eval_step(
        cfg, ntoken, mesh, impl, num_ans, padding_idx, sharded=False
    )


def build_store_eval_block(
    cfg: Config, ntoken: int, mesh, impl: str, num_ans: int, padding_idx: int,
    block: int,
):
    """Evaluate `block` index batches in ONE dispatched program via lax.scan.

    Eval steps are independent programs, so unlike the donated-state train
    chain they cannot hide the host->device dispatch round trip; over the
    tunneled v5e that latency dominated (device-busy ~7 ms vs ~23 ms wall per
    batch — tools/profile_step.py). Scanning K batches per program amortizes
    the round trip K-fold and lets XLA pipeline the gathers.

    Signature: (params, arrays, idx_block [K, B]) -> {"loss", "score", "n"}
    with "score"/"n" summed over the block and "loss" the block's
    valid-weighted mean — the same contract per item as the per-batch step,
    so _run_eval's accumulation (loss * n) stays exact. Tail blocks pad with
    all -1 (invalid) index batches, which contribute n=0.
    """
    return _build_any_store_eval_block(
        cfg, ntoken, mesh, impl, num_ans, padding_idx, block, sharded=False
    )


def build_eval_step(
    cfg: Config, ntoken: int, mesh, impl: str
) -> Callable[[Any, Dict[str, jax.Array]], Dict[str, jax.Array]]:
    # _eval_core carries sp_mesh so --sp_rois shards the roi axis in eval
    # exactly like the train step and the store-mode eval builders do
    # (previously this host path evaluated fully replicated over 'model' —
    # tp x the train step's per-device activation memory; review finding)
    sp_mesh = mesh if cfg.sp_rois else None

    def eval_step(params, batch):
        return _eval_core(params, batch, cfg, ntoken, impl, sp_mesh)

    rep = replicated(mesh)
    return jax.jit(
        eval_step,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=rep,
    )

def build_sharded_store_train_step(
    cfg: Config,
    ntoken: int,
    optimizer: optax.GradientTransformation,
    mesh,
    impl: str,
    params: Any,
    num_ans: int,
    padding_idx: int,
):
    """Sharded-store variant: each device's shard of the batch is gathered
    from its *local* slice of the data-axis-partitioned tables inside a
    shard_map region (data/sharded_store.py); the model step stays GSPMD."""
    return _build_any_store_train_step(
        cfg, ntoken, optimizer, mesh, impl, params, num_ans, padding_idx,
        sharded=True,
    )


def build_sharded_store_eval_step(
    cfg: Config, ntoken: int, mesh, impl: str, num_ans: int, padding_idx: int
):
    return _build_any_store_eval_step(
        cfg, ntoken, mesh, impl, num_ans, padding_idx, sharded=True
    )


def build_store_predict_block(
    cfg: Config, ntoken: int, mesh, impl: str, num_ans: int, padding_idx: int,
    block: int,
):
    """Argmax answer labels for `block` index batches in ONE dispatched
    program (device data mode): (params, arrays, idx_block [K, B]) ->
    labels [K, B] int32. Padded entries (idx < 0) return whatever the zero
    batch produces — the caller drops them by the idx mask. Powers
    `--mode predict` (VQA submission files for answerless test splits —
    capability the reference lacks: its eval path needs targets,
    train.py:151-170)."""
    return _build_any_store_predict_block(
        cfg, ntoken, mesh, impl, num_ans, padding_idx, block, sharded=False
    )


def build_sharded_store_eval_block(
    cfg: Config, ntoken: int, mesh, impl: str, num_ans: int, padding_idx: int,
    block: int,
):
    """Sharded-store analog of build_store_eval_block: ONE program scans
    `block` index batches, each gathered from the data-axis-partitioned
    tables inside shard_map — the dispatch-latency amortization of blocked
    eval extends to splits too large to replicate."""
    return _build_any_store_eval_block(
        cfg, ntoken, mesh, impl, num_ans, padding_idx, block, sharded=True
    )


def build_sharded_store_train_block(
    cfg: Config,
    ntoken: int,
    optimizer: optax.GradientTransformation,
    mesh,
    impl: str,
    params: Any,
    num_ans: int,
    padding_idx: int,
    block: int,
):
    """Sharded-store analog of build_store_train_block: each scanned step
    gathers its batch from the data-axis-partitioned tables inside
    shard_map — dispatch amortization where real multi-host training lands
    (resolve_data_mode)."""
    return _build_any_store_train_block(
        cfg, ntoken, optimizer, mesh, impl, params, num_ans, padding_idx,
        block, sharded=True,
    )


def build_sharded_store_predict_block(
    cfg: Config, ntoken: int, mesh, impl: str, num_ans: int, padding_idx: int,
    block: int,
):
    """Sharded-store analog of build_store_predict_block: argmax labels for
    `block` index batches, gathered from the data-axis-partitioned tables —
    `--mode predict` at too-big-to-replicate scale (the answerless adaptive
    test2015 split is the motivating case)."""
    return _build_any_store_predict_block(
        cfg, ntoken, mesh, impl, num_ans, padding_idx, block, sharded=True
    )
