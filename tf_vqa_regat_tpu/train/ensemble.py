"""Three-branch ReGAT ensemble evaluation (BASELINE config #5).

The ReGAT paper's headline numbers ensemble the implicit + spatial + semantic
relation models by averaging predicted answer scores; neither the TF reference
nor its flags support this (it is pure evaluation machinery). Members are
separate checkpoints trained with their own --relation_type; at eval time each
member runs its own jitted step and the sigmoid answer probabilities are
averaged before the argmax VQA score.

CLI: --mode ensemble_eval
     --ensemble_checkpoints implicit:PATH,spatial:PATH,semantic:PATH
(any non-empty subset of branches works).
"""

from __future__ import annotations

import time
from typing import List, Tuple

import jax
import jax.numpy as jnp

from tf_vqa_regat_tpu.config import Config
from tf_vqa_regat_tpu.data.features import VQADataset
from tf_vqa_regat_tpu.data.loader import BatchLoader, prefetch_to_device
from tf_vqa_regat_tpu.models.regat import apply_regat, init_regat
from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, replicated
from tf_vqa_regat_tpu.train import checkpoint as ckpt
from tf_vqa_regat_tpu.train.logging import Logger
from tf_vqa_regat_tpu.train.loss import vqa_score_sum


def parse_members(spec: str) -> List[Tuple[str, str]]:
    """'implicit:P1,spatial:P2' -> [(relation_type, path), ...]."""
    members = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        rt, path = part.split(":", 1)
        if rt not in ("implicit", "spatial", "semantic"):
            raise ValueError(f"unknown ensemble relation_type {rt!r}")
        members.append((rt, path))
    if not members:
        raise ValueError("empty --ensemble_checkpoints")
    return members


def build_member_step(cfg: Config, ntoken: int, mesh, impl: str):
    """Jitted per-member probability step: batch -> sigmoid answer probs."""

    def step(params, batch):
        logits = apply_regat(params, cfg, batch, ntoken, train=False, impl=impl)
        return jax.nn.sigmoid(logits)

    return jax.jit(
        step,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )


def run_ensemble_eval(
    cfg: Config,
    val_ds: VQADataset,
    mesh,
    impl: str,
    logger: Logger,
) -> float:
    """Returns the ensemble VQA score (%)."""
    ntoken = val_ds.ntoken
    members = parse_members(cfg.ensemble_checkpoints)
    steps = []
    for rt, path in members:
        mcfg = cfg.replace(relation_type=rt)
        abstract = init_regat(
            jax.random.PRNGKey(cfg.seed), mcfg, ntoken, val_ds.v_dim, val_ds.num_ans
        )
        from tf_vqa_regat_tpu.parallel.distributed import put_global_tree

        params = put_global_tree(ckpt.load_params(path, abstract), replicated(mesh))
        steps.append((rt, build_member_step(mcfg, ntoken, mesh, impl), params))
        logger.write(f"[ensemble] loaded {rt} member from {path}")

    # Per-member loaders: each relation type needs its own adjacency in the
    # batch (semantic: the label table; spatial: precomputed if the HDF5 has
    # it, else the in-jit builder; implicit: none). shuffle=False keeps all
    # loaders in lockstep over the same entries, so targets align.
    import dataclasses as _dc

    bspec = batch_sharding(mesh)
    # batch//4 (reference main.py:118), rounded up to a data-mesh multiple so
    # the sharded batch dim stays divisible
    dp = mesh.shape["data"]
    eval_batch = cfg.resolved_eval_batch(dp)
    R = cfg.resolved_num_rois()
    member_iters = []
    for rt, _ in members:
        member_ds = _dc.replace(val_ds, relation_type=rt)
        loader = BatchLoader(
            member_ds, eval_batch, R, shuffle=False,
            include_adj=(rt in ("semantic", "spatial")),
            feature_dtype=cfg.feature_dtype,
        )
        member_iters.append(
            prefetch_to_device(loader.epoch(0), bspec, depth=cfg.prefetch)
        )

    score = jnp.zeros(())
    n = jnp.zeros(())
    start = time.time()
    for batches in zip(*member_iters):
        probs = None
        for (rt, step, params), batch in zip(steps, batches):
            p = step(params, batch)
            probs = p if probs is None else probs + p
        probs = probs / len(steps)
        ref_batch = batches[0]
        score = score + vqa_score_sum(probs, ref_batch["target"], ref_batch["valid"])
        n = n + jnp.sum(ref_batch["valid"].astype(jnp.float32))
    score_pct = 100.0 * float(jax.device_get(score)) / max(float(jax.device_get(n)), 1.0)
    logger.write(
        f"[ensemble] members={[rt for rt, _ in members]} "
        f"score={score_pct:.4f} ({time.time()-start:.1f}s)"
    )
    return score_pct
