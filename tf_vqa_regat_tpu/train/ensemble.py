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
import numpy as np

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
    """Jitted per-member probability step: batch -> sigmoid answer probs
    (host-streaming path)."""

    sp_mesh = mesh if cfg.sp_rois else None  # roi-axis sharding (--sp_rois)

    def step(params, batch):
        logits = apply_regat(
            params, cfg, batch, ntoken, train=False, impl=impl, sp_mesh=sp_mesh
        )
        return jax.nn.sigmoid(logits)

    return jax.jit(
        step,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )


def _build_ensemble_block_common(
    member_cfgs: List[Config],
    ntoken: int,
    mesh,
    impl: str,
    gather_fn,
    arrays_sharding,
    block=None,
):
    """Shared body of the fused one-program ensemble: per batch, gather each
    member's inputs (via `gather_fn(arrays, idx)` — replicated tables or the
    shard_map local gather), average the members' sigmoid answer
    probabilities, and accumulate the VQA score on device over a lax.scan of
    `block` index batches. One builder so the device and sharded paths
    cannot drift (round-3 review finding).

    Signature: (params_tuple, arrays_tuple, idx_block [K, B])
               -> {"score": sum, "n": valid count}
    Tail blocks pad with -1 index batches (n == 0), as build_store_eval_block.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tf_vqa_regat_tpu.parallel.mesh import DATA_AXIS

    def one_batch(params_tuple, arrays_tuple, idx):
        probs = None
        ref = None
        for mcfg, params, arrays in zip(member_cfgs, params_tuple, arrays_tuple):
            batch = gather_fn(arrays, idx)
            ref = batch  # entries identical across members; keep any
            # --sp_rois must shard the roi axis here exactly as in the
            # single-model eval builders (step.py) — dropping it silently
            # changes the fused program's memory contract (review finding)
            logits = apply_regat(
                params, mcfg, batch, ntoken, train=False, impl=impl,
                sp_mesh=mesh if mcfg.sp_rois else None,
            )
            p = jax.nn.sigmoid(logits)
            probs = p if probs is None else probs + p
        probs = probs / len(member_cfgs)
        return (
            vqa_score_sum(probs, ref["target"], ref["valid"]),
            jnp.sum(ref["valid"].astype(jnp.float32)),
        )

    def ensemble_block(params_tuple, arrays_tuple, idx_block):
        # trace-time contract (see step.py's blocked builders)
        assert block is None or idx_block.shape[0] == block, (
            idx_block.shape, block,
        )

        def body(acc, idx):
            s, n = one_batch(params_tuple, arrays_tuple, idx)
            return {"score": acc["score"] + s, "n": acc["n"] + n}, None

        zeros = {"score": jnp.zeros(()), "n": jnp.zeros(())}
        acc, _ = jax.lax.scan(body, zeros, idx_block)
        return acc

    block_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return jax.jit(
        ensemble_block,
        in_shardings=(None, arrays_sharding, block_sh),
        out_shardings=replicated(mesh),
    )


def build_ensemble_block(
    member_cfgs: List[Config],
    ntoken: int,
    mesh,
    impl: str,
    num_ans: int,
    padding_idx: int,
    block: int,
):
    """Fused ensemble over HBM-replicated tables (device data mode): fusing
    the members into one program removes the per-member dispatch round trips
    of the host path (3 members x ~27 ms tunnel latency per batch) and lets
    XLA schedule the members back-to-back."""
    from tf_vqa_regat_tpu.data.device_store import gather_batch

    R = member_cfgs[0].resolved_num_rois()
    return _build_ensemble_block_common(
        member_cfgs, ntoken, mesh, impl,
        lambda arrays, idx: gather_batch(arrays, idx, R, num_ans, padding_idx),
        replicated(mesh),
        block=block,
    )


def build_sharded_ensemble_block(
    member_cfgs: List[Config],
    ntoken: int,
    mesh,
    impl: str,
    num_ans: int,
    padding_idx: int,
    block: int,
):
    """Sharded analog of build_ensemble_block: each member's inputs gather
    from the data-axis-partitioned tables inside shard_map
    (data/sharded_store.py) — the fused one-program ensemble at
    too-big-to-replicate scale."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tf_vqa_regat_tpu.data.sharded_store import build_sharded_gather
    from tf_vqa_regat_tpu.parallel.mesh import DATA_AXIS

    R = member_cfgs[0].resolved_num_rois()
    gather = build_sharded_gather(mesh, R, num_ans, padding_idx)
    return _build_ensemble_block_common(
        member_cfgs, ntoken, mesh, impl, gather,
        NamedSharding(mesh, P(DATA_AXIS)),
        block=block,
    )


def _member_sharded_arrays(
    val_ds: VQADataset, members, mesh, feature_dtype: str, cache_dir: str = ""
):
    """Per-member sharded array dicts SHARING the partitioned feature/box/
    question tables; each member's edge-label table (semantic/spatial when
    precomputed) is partitioned with the base store's image assignment —
    which depends only on box counts, never the relation type."""
    import dataclasses as _dc

    from tf_vqa_regat_tpu.data.sharded_store import ShardedDeviceStore

    base = ShardedDeviceStore(
        _dc.replace(val_ds, relation_type="implicit"), mesh, False,
        feature_dtype, cache_dir,
    )
    adj_cache = {}
    arrays_tuple = []
    for rt, _ in members:
        arrays = dict(base.arrays)
        src = None
        if rt == "semantic":
            src = val_ds.store.semantic_adj
        elif rt == "spatial":
            src = val_ds.store.spatial_adj
        if src is not None:
            if rt not in adj_cache:
                adj_cache[rt] = base.sharded_adj_table(src)
            arrays["adj"] = adj_cache[rt]
        arrays_tuple.append(arrays)
    return base, tuple(arrays_tuple)


def _member_device_arrays(
    val_ds: VQADataset, members, mesh, feature_dtype: str, cache_dir: str = ""
):
    """Per-member device array dicts SHARING the feature/box/question tables
    (uploaded once); only the adjacency table differs per relation type
    (semantic: HDF5 label table; spatial: precomputed table when present,
    else the in-jit builder runs from bb; implicit: none)."""
    import dataclasses as _dc

    from tf_vqa_regat_tpu.data.device_store import DeviceStore

    rep = replicated(mesh)
    base = DeviceStore(
        _dc.replace(val_ds, relation_type="implicit"),
        sharding=rep,
        include_adj=False,
        feature_dtype=feature_dtype,
        cache_dir=cache_dir,
    )
    adj_cache = {}
    arrays_tuple = []
    for rt, _ in members:
        arrays = dict(base.arrays)
        src = None
        if rt == "semantic":
            src = val_ds.store.semantic_adj
        elif rt == "spatial":
            src = val_ds.store.spatial_adj
        if src is not None:
            if rt not in adj_cache:
                import numpy as np

                from tf_vqa_regat_tpu.parallel.distributed import put_global

                # multi-process aware (put_global, not raw device_put —
                # replicated shardings span non-addressable devices there)
                adj_cache[rt] = put_global(src.astype(np.int8), rep)
            arrays["adj"] = adj_cache[rt]
        arrays_tuple.append(arrays)
    return base, tuple(arrays_tuple)


def run_ensemble_eval(
    cfg: Config,
    val_ds: VQADataset,
    mesh,
    impl: str,
    logger: Logger,
) -> float:
    """Returns the ensemble VQA score (%). Data path mirrors run_evaluation:
    device-store gather (feature tables uploaded once, shared across members;
    supports --roi_buckets and --eval_block) when the tables fit the budget,
    host streaming otherwise."""
    ntoken = val_ds.ntoken
    members = parse_members(cfg.ensemble_checkpoints)
    member_params = []
    for rt, path in members:
        mcfg = cfg.replace(relation_type=rt)
        # load_params only needs shapes/dtypes as the restore target —
        # eval_shape skips materializing a full throwaway random init per
        # member (3x full glorot sampling on a 3-member ensemble)
        abstract = jax.eval_shape(
            lambda key, c=mcfg: init_regat(
                key, c, ntoken, val_ds.v_dim, val_ds.num_ans
            ),
            jax.random.PRNGKey(cfg.seed),
        )
        from tf_vqa_regat_tpu.parallel.distributed import put_global_tree

        params = put_global_tree(ckpt.load_params(path, abstract), replicated(mesh))
        member_params.append(params)
        logger.write(f"[ensemble] loaded {rt} member from {path}")

    from tf_vqa_regat_tpu.train.loop import resolve_data_mode

    # Same policy as run_evaluation/run_prediction: device-resident (fused
    # one-program blocks) when replicated tables fit or the per-shard slice
    # does (dp>1); host streaming otherwise — the log line's data= tag shows
    # which ran. The base store never carries adjacency (members share
    # feature tables, each bringing its OWN edge table via
    # _member_device_arrays/_member_sharded_arrays), so the budget check
    # adds every distinct member adjacency table explicitly — at val scale
    # semantic AND spatial together are ~800 MB int8, enough to breach a
    # budget the features alone fit (round-2 advisor finding).
    adj_srcs = [
        src
        for rt in {rt for rt, _ in members}
        for src in [
            val_ds.store.semantic_adj
            if rt == "semantic"
            else val_ds.store.spatial_adj if rt == "spatial" else None
        ]
        if src is not None
    ]
    dp = mesh.shape["data"]
    # replicated upload: full [n_img, A, A] int8 per distinct table
    adj_extra = sum(int(np.prod(src.shape)) for src in adj_srcs)
    adj_extra_sharded = 0
    if adj_srcs and dp > 1:
        # Sharded upload pads each table to the layout's max image-count
        # shard ([dp, max_local_imgs, A, A], sharded_adj_table) — and the
        # greedy assignment balances BOX counts, so max_local_imgs can be
        # several times n_img/dp on an adaptive split. Size by the real
        # layout, not total/dp (review finding, round 3).
        from tf_vqa_regat_tpu.data.sharded_store import sharded_layout

        _, _, _, max_local_imgs = sharded_layout(val_ds, dp)
        adj_extra_sharded = sum(
            max_local_imgs * src.shape[1] * src.shape[2] for src in adj_srcs
        )
    mode = resolve_data_mode(
        cfg, val_ds, None, False, dp, adj_extra, adj_extra_sharded
    )
    # same loud rejection as training/eval/predict: the host fallback has no
    # bucketed programs, so --roi_buckets there would be silently ignored
    from tf_vqa_regat_tpu.train.loop import check_roi_buckets_mode

    check_roi_buckets_mode(cfg, mode)
    if mode in ("device", "sharded"):
        return _run_ensemble_resident(
            cfg, val_ds, mesh, impl, logger, members, member_params, mode
        )
    return _run_ensemble_host(cfg, val_ds, mesh, impl, logger, members, member_params)


def _run_ensemble_resident(
    cfg, val_ds, mesh, impl, logger, members, member_params, mode
):
    """Device-resident ensemble eval: replicated tables (mode='device') or
    data-axis-partitioned ones (mode='sharded'); identical wiring, only the
    arrays/block builders differ."""
    from tf_vqa_regat_tpu.train.loop import blocked_eval_stream

    ntoken = val_ds.ntoken
    if mode == "sharded":
        base, arrays_tuple = _member_sharded_arrays(
            val_ds, members, mesh, cfg.feature_dtype, cfg.packed_cache
        )
        block_builder = build_sharded_ensemble_block
    else:
        base, arrays_tuple = _member_device_arrays(
            val_ds, members, mesh, cfg.feature_dtype, cfg.packed_cache
        )
        block_builder = build_ensemble_block
    params_tuple = tuple(member_params)
    dp = mesh.shape["data"]
    eval_batch = cfg.resolved_eval_batch(dp)
    K, sizes, blkspec, stream = blocked_eval_stream(cfg, base, mesh, eval_batch)
    steps_by_R = {
        R: block_builder(
            [cfg.replace(relation_type=rt, num_rois=R) for rt, _ in members],
            ntoken, mesh, impl, val_ds.num_ans, base.padding_idx, K,
        )
        for R in sizes
    }
    from tf_vqa_regat_tpu.parallel.distributed import put_global

    start = time.time()
    score = None
    n = None
    for R, blk in stream:
        m = steps_by_R[R](params_tuple, arrays_tuple, put_global(blk, blkspec))
        score = m["score"] if score is None else score + m["score"]
        n = m["n"] if n is None else n + m["n"]
    score_pct = 100.0 * float(jax.device_get(score)) / max(float(jax.device_get(n)), 1.0)
    logger.write(
        f"[ensemble] members={[rt for rt, _ in members]} data={mode} "
        f"score={score_pct:.4f} ({time.time()-start:.1f}s)"
    )
    return score_pct


def _run_ensemble_host(cfg, val_ds, mesh, impl, logger, members, member_params):
    ntoken = val_ds.ntoken
    steps = []
    for (rt, _), params in zip(members, member_params):
        mcfg = cfg.replace(relation_type=rt)
        steps.append((rt, build_member_step(mcfg, ntoken, mesh, impl), params))

    # ONE shared loader packs the heavy tensors (features/boxes/questions/
    # targets — the ~hundreds-of-MB per batch) once; only each member's tiny
    # [B, R, R] edge-label table (semantic: the HDF5 table; spatial:
    # precomputed when present, else the in-jit builder needs no batch input)
    # is packed and uploaded per member. The previous per-member loaders
    # packed and shipped the identical dominant tensors once PER member —
    # ~3x host pack work and host->HBM bytes on the transport-capped path
    # (review finding).
    import dataclasses as _dc

    bspec = batch_sharding(mesh)
    # batch//4 (reference main.py:118), rounded up to a data-mesh multiple so
    # the sharded batch dim stays divisible
    dp = mesh.shape["data"]
    eval_batch = cfg.resolved_eval_batch(dp)
    R = cfg.resolved_num_rois()
    shared_ds = _dc.replace(val_ds, relation_type="implicit")
    loader = BatchLoader(
        shared_ds, eval_batch, R, shuffle=False, include_adj=False,
        feature_dtype=cfg.feature_dtype,
    )
    shared_iter = prefetch_to_device(loader.epoch(0), bspec, depth=cfg.prefetch)
    adj_sources = {
        rt: (
            val_ds.store.semantic_adj
            if rt == "semantic"
            else val_ds.store.spatial_adj if rt == "spatial" else None
        )
        for rt, _ in members
    }
    entry_img = val_ds.entries.image_index

    score = jnp.zeros(())
    n = jnp.zeros(())
    start = time.time()
    for bi, shared in enumerate(shared_iter):
        lo = bi * eval_batch  # shuffle=False: entries in natural order
        idx = np.arange(lo, min(lo + eval_batch, len(entry_img)))
        adj_cache = {}
        probs = None
        for rt, step, params in steps:
            batch = shared
            src = adj_sources.get(rt)
            if src is not None:
                if rt not in adj_cache:
                    adj = np.zeros((eval_batch, R, R), np.int32)
                    k = min(src.shape[1], R)
                    adj[: len(idx), :k, :k] = src[entry_img[idx]][:, :k, :k]
                    adj_cache[rt] = jax.device_put(adj, bspec)
                batch = dict(shared, adj_label=adj_cache[rt])
            p = step(params, batch)
            probs = p if probs is None else probs + p
        probs = probs / len(steps)
        score = score + vqa_score_sum(probs, shared["target"], shared["valid"])
        n = n + jnp.sum(shared["valid"].astype(jnp.float32))
    score_pct = 100.0 * float(jax.device_get(score)) / max(float(jax.device_get(n)), 1.0)
    logger.write(
        f"[ensemble] members={[rt for rt, _ in members]} data=host "
        f"score={score_pct:.4f} ({time.time()-start:.1f}s)"
    )
    return score_pct
