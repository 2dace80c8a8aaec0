"""Subprocess driver for the multi-process FULL-CLI test.

mp_driver.py / mp_ckpt_driver.py exercise the step builders and checkpoint
primitives under jax.distributed; this driver runs the PRODUCTION entrypoint
itself — `main.main()` with `--synthetic --data_mode sharded` — so the whole
top-level surface is covered in one shot: resolve_data_mode, the sharded
_DataPath, run_training's epoch loop with process-0-gated log/metrics/meta
writes, the (blocking, collective) per-epoch Orbax saves, the eval pass, and
the final pretrained artifact. Process 0 reports {output}/metrics.jsonl; the
test asserts the 2-process run's metrics equal the single-process run's.

Usage: mp_main_driver.py <out_json> <pid> <nproc> <port> <outdir>
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import mp_common

out_json, pid, nproc, port, outdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5],
)
jax = mp_common.init_runtime(nproc, pid, port)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import main as regat_main

regat_main.main([
    "--synthetic", "--epochs", "2", "--batch_size", "16",
    "--num_hid", "32", "--relation_dim", "48", "--num_heads", "4",
    "--nongt_dim", "6", "--imp_pos_emb_dim", "16", "--num_rois", "10",
    "--adaptive", "--synthetic_train_size", "64", "--synthetic_val_size",
    "32", "--print_freq", "0", "--data_mode", "sharded",
    "--fusion", "butd", "--relation_type", "implicit",
    "--residual_connection", "--output", outdir,
])

# ensemble_eval over the just-trained artifact (two implicit members),
# still multi-process + sharded: member checkpoint loading, the fused
# one-program member scan, and the ensemble store path under >1 process
final = os.path.join(outdir, "implicit-butd-pretrained_model")
ens_out = outdir + "_ens"
regat_main.main([
    "--synthetic", "--mode", "ensemble_eval",
    "--ensemble_checkpoints", f"implicit:{final},implicit:{final}",
    "--batch_size", "16", "--num_hid", "32", "--relation_dim", "48",
    "--num_heads", "4", "--nongt_dim", "6", "--imp_pos_emb_dim", "16",
    "--num_rois", "10", "--adaptive", "--synthetic_val_size", "32",
    "--print_freq", "0", "--data_mode", "sharded", "--fusion", "butd",
    "--relation_type", "implicit", "--residual_connection",
    "--output", ens_out,
])

if pid == 0:
    with open(os.path.join(outdir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    # drop wall-clock fields; everything else must be topology-invariant
    drop = {"ts", "train_time_s", "eval_time_s", "train_qps"}
    rows = [{k: v for k, v in r.items() if k not in drop} for r in rows]
    with open(os.path.join(ens_out, "eval_log.txt")) as f:
        ens_line = [l for l in f if "Final ensemble eval score" in l][-1]
    with open(out_json, "w") as f:
        json.dump(
            {
                "metrics": rows,
                "final_artifact": os.path.isdir(final),
                "ensemble_score": ens_line.strip().rsplit(" ", 1)[-1],
            },
            f,
        )
print(f"[p{pid}] main done devices={len(jax.devices())}", flush=True)
