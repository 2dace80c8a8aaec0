"""Subprocess driver for the multi-process data-feeding test.

Runs a tiny synthetic training (DeviceStore path: tables placed via
put_global, per-step index vectors likewise) for a fixed number of steps
plus one eval pass, and writes the per-step metrics as JSON. Launched by
tests/test_multiprocess.py either as one process with 8 virtual CPU
devices, or as two jax.distributed processes with 4 each — the global
program is identical, so the metrics must match. Runtime + rig setup is
shared with mp_ckpt_driver.py via tests/mp_common.py.

Usage: mp_driver.py <out_json> <process_id> <num_processes> <port>
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import mp_common

out_json, pid, nproc, port = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
)
jax = mp_common.init_runtime(nproc, pid, port)
rig = mp_common.build_tiny_training()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tf_vqa_regat_tpu.parallel.distributed import put_global  # noqa: E402

NTOKEN, NUM_ANS, BATCH = mp_common.NTOKEN, mp_common.NUM_ANS, mp_common.BATCH
cfg, ds, store, bspec, rng = rig.cfg, rig.ds, rig.store, rig.bspec, rig.rng
state = rig.state
# host copy NOW, before the donated train chain can delete any buffer the
# initial params might alias — seeds the sharded-store segment's fresh state
params_host = jax.device_get(rig.params)

losses = []
for epoch in range(2):
    for idx in store.epoch_indices(epoch, BATCH, shuffle=True, seed=3):
        state, m = rig.train_step(
            state, store.arrays, put_global(idx, bspec), rng
        )
        losses.append(float(m["loss"]))

escore = esum = en = 0.0
for idx in store.epoch_indices(0, BATCH, shuffle=False, seed=3):
    m = rig.eval_step(state["params"], store.arrays, put_global(idx, bspec))
    escore += float(m["score"])
    esum += float(m["loss"]) * float(m["n"])
    en += float(m["n"])

# blocked eval + predict: the scan-based programs and their multi-process
# put_global placement / replicated-label fetch (run_prediction's path)
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from tf_vqa_regat_tpu.train.loop import _block_batches  # noqa: E402
from tf_vqa_regat_tpu.train.step import (  # noqa: E402
    build_store_eval_block, build_store_predict_block,
)

mesh = rig.mesh
eblk = build_store_eval_block(cfg, NTOKEN, mesh, "jnp", NUM_ANS, store.padding_idx, 2)
pblk = build_store_predict_block(cfg, NTOKEN, mesh, "jnp", NUM_ANS, store.padding_idx, 2)
blkspec = NamedSharding(mesh, P(None, "data"))
bsum = bscore = bn = 0.0
pred = {}
for _, blk in _block_batches(
    ((cfg.num_rois, i) for i in store.epoch_indices(0, BATCH, False, 3)), 2, BATCH
):
    gb = put_global(blk, blkspec)
    m = eblk(state["params"], store.arrays, gb)
    bsum += float(m["loss"]) * float(m["n"])
    bscore += float(m["score"])
    bn += float(m["n"])
    lab = np.asarray(jax.device_get(pblk(state["params"], store.arrays, gb)))
    ok = blk >= 0
    for i, l in zip(blk[ok].tolist(), lab[ok].tolist()):
        pred[int(i)] = int(l)

# host-streaming predict path (run_prediction's host branch): batch-sharded
# inputs assembled per-process by put_global_tree, labels REPLICATED — a
# batch-sharded output would span non-addressable devices on the other
# process and device_get would fail (round-2 review finding).
from tf_vqa_regat_tpu.data.loader import BatchLoader  # noqa: E402
from tf_vqa_regat_tpu.models.regat import apply_regat  # noqa: E402
from tf_vqa_regat_tpu.parallel.distributed import put_global_tree  # noqa: E402
from tf_vqa_regat_tpu.parallel.mesh import replicated  # noqa: E402

loader = BatchLoader(ds, BATCH, cfg.num_rois, shuffle=False)


def _host_predict(params, batch):
    logits = apply_regat(params, cfg, batch, NTOKEN, train=False, impl="jnp")
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


hstep = jax.jit(
    _host_predict, in_shardings=(None, bspec), out_shardings=replicated(mesh)
)
host_pred = []
pos = 0
for batch in loader.epoch(0):
    lab = np.asarray(
        jax.device_get(hstep(state["params"], put_global_tree(batch, bspec)))
    )
    n_real = min(BATCH, len(ds.entries) - pos)
    host_pred.extend(int(x) for x in lab[:n_real])
    pos += n_real

# sharded-store path: the data mode real multi-host training lands on
# (resolve_data_mode promotes too-big-to-replicate splits here). Tables
# partitioned over the data axis via put_global (each process places only
# its local shards), shard_map local gather, SPMD bucketed schedule, blocked
# eval, and predict with the local->global entry translation — all must be
# topology-invariant too.
from tf_vqa_regat_tpu.data.sharded_store import ShardedDeviceStore  # noqa: E402
from tf_vqa_regat_tpu.train.step import (  # noqa: E402
    build_sharded_store_eval_block,
    build_sharded_store_predict_block,
    build_sharded_store_train_step,
    init_train_state,
)

sstore = ShardedDeviceStore(ds, rig.mesh)
SB = [32, 100]  # synthetic box counts span 10..100: both buckets populated
ssteps = {
    R: build_sharded_store_train_step(
        cfg.replace(num_rois=R), NTOKEN, rig.optimizer, mesh, "jnp",
        params_host, NUM_ANS, sstore.padding_idx,
    )
    for R in SB
}
dsh = NamedSharding(mesh, P("data"))
sstate = init_train_state(params_host, rig.optimizer, mesh)
slosses = []
for R, idx in sstore.epoch_indices_bucketed(0, BATCH, SB, True, 5):
    sstate, sm = ssteps[R](sstate, sstore.arrays, put_global(idx, dsh), rng)
    slosses.append(float(sm["loss"]))

seblks = {
    R: build_sharded_store_eval_block(
        cfg.replace(num_rois=R), NTOKEN, mesh, "jnp", NUM_ANS,
        sstore.padding_idx, 2,
    )
    for R in SB
}
spblks = {
    R: build_sharded_store_predict_block(
        cfg.replace(num_rois=R), NTOKEN, mesh, "jnp", NUM_ANS,
        sstore.padding_idx, 2,
    )
    for R in SB
}
per = BATCH // sstore.dp
ssum = sscore = sn = 0.0
spred = {}
for R, blk in _block_batches(
    sstore.epoch_indices_bucketed(0, BATCH, SB, False, 5), 2, BATCH
):
    gb = put_global(blk, blkspec)
    m = seblks[R](sstate["params"], sstore.arrays, gb)
    ssum += float(m["loss"]) * float(m["n"])
    sscore += float(m["score"])
    sn += float(m["n"])
    lab = np.asarray(jax.device_get(spblks[R](sstate["params"], sstore.arrays, gb)))
    # blk holds shard-LOCAL entry ids (segment s = positions [s*per,(s+1)*per));
    # translate through the store's local->global table for entry identity
    for k in range(blk.shape[0]):
        for pos in np.where(blk[k] >= 0)[0]:
            gid = int(sstore.local_to_global[pos // per, blk[k, pos]])
            spred[gid] = int(lab[k, pos])

result = {
    "devices": len(jax.devices()),
    "losses": losses,
    "sharded_losses": slosses,
    "sharded_eval_loss": ssum / sn,
    "sharded_eval_score": sscore / sn,
    "sharded_pred": sorted(spred.items()),
    "eval_loss": esum / en,
    "eval_score": escore / en,
    "blocked_eval_loss": bsum / bn,
    "blocked_eval_score": bscore / bn,
    "pred": sorted(pred.items()),
    "host_pred": host_pred,
}
if pid == 0:
    with open(out_json, "w") as f:
        json.dump(result, f)
print(f"[p{pid}] done devices={len(jax.devices())}", flush=True)
