"""Real-dataset preflight: the runnable form of REALDATA.md's bring-up
checklist. Run it against `--data_folder` BEFORE the first real training
run; nothing here touches an accelerator.

    python tools/preflight.py --data_folder ./data --adaptive --dp 8 \
        [--budget_gb 8] [--splits train,val] [--sample_rows 4096]

Reports, per split:
  1. file inventory — every path the loaders will open (reference layout,
     dataset.py:119-199), with sizes and loud MISSING markers;
  2. memory-estimate table — replicated (estimate_nbytes) and per-shard
     (estimate_sharded_nbytes at --dp) footprints for f32/bf16/int8, the
     eval-only `--data_mode auto` resolution per split, and (when both
     train and val are inventoried) the JOINT `--mode train` resolution —
     both splits against the halved per-store budget, exactly the call
     run_training makes;
  3. int8 quantization sanity (REALDATA.md §3 step 3) — per-row symmetric
     quantization error on a strided sample of REAL feature rows
     (quantize_rows, the exact production quantizer): relative L2 error
     and the outlier ratio rowmax/row-RMS. Synthetic Gaussians sit near
     ratio ~4; BUTD features with heavy outlier structure push the ratio
     up and the error toward 1/127 * ratio — the check that decides
     whether the int8 capacity lever is safe on the real data.

Entry tables are NOT joined (that needs minutes at real scale and proves
nothing about capacity) — the estimate's entry-count terms come from the
question JSON lengths, so the tool stays IO-light: HDF5 metadata + the
sampled rows only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import numpy as np


def _fmt_bytes(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1000:
            return f"{n:.1f} {unit}"
        n /= 1000
    return f"{n:.1f} TB"


def inventory(dataroot: str, name: str, adaptive: bool, tfidf: bool):
    """(path, exists, size) for every file this split's load touches."""
    from tf_vqa_regat_tpu.data.entries import question_path

    prefix = "_36" if "test" in name else "36"
    feat_dir = (
        "Bottom-up-features-adaptive" if adaptive else "Bottom-up-features-fixed"
    )
    paths = [
        os.path.join(dataroot, "glove", "dictionary.pkl"),
        os.path.join(dataroot, "glove", "glove6b_init_300d.npy"),
        os.path.join(dataroot, "cache", "trainval_ans2label.pkl"),
        os.path.join(dataroot, "cache", "trainval_label2ans.pkl"),
        question_path(dataroot, name),
        os.path.join(
            dataroot, "imgids",
            "%s%s_imgid2idx.pkl" % (name, "" if adaptive else prefix),
        ),
        os.path.join(
            dataroot, feat_dir,
            "%s%s.hdf5" % (name, "" if adaptive else prefix),
        ),
    ]
    if "test" not in name:
        paths.append(os.path.join(dataroot, "cache", "%s_target.pkl" % name))
    if tfidf:
        paths += [
            os.path.join(dataroot, "tfidf", "indices.npy"),
            os.path.join(dataroot, "tfidf", "values.npy"),
            os.path.join(dataroot, "glove", "glove.6B.300d.txt"),
        ]
    return [
        (p, os.path.exists(p), os.path.getsize(p) if os.path.exists(p) else 0)
        for p in paths
    ]


def _cfg_for(ds, dtype: str, budget_gb: float, relation_type: str):
    from tf_vqa_regat_tpu.config import Config

    # relation_type MUST be threaded through: resolve_data_mode's sharded
    # leg keys on cfg.relation_type == "semantic" (the sharded store ships
    # only the semantic table; spatial builds in-jit) — a default-implicit
    # Config mispredicted semantic runs (round-3 review finding)
    return Config(
        batch_size=256, adaptive=ds.store.adaptive, feature_dtype=dtype,
        device_store_budget_gb=budget_gb, relation_type=relation_type,
    )


def estimate_tables(ds, dp: int, budget_gb: float, relation_type: str):
    """Rows of (dtype, replicated, per-shard@dp, eval-run auto mode).

    The auto column here is the EVAL-ONLY resolution (train_ds=None — full
    budget, what --mode eval/predict/serve resolve for this split); a
    training run halves the budget per store and resolves both splits
    jointly — see train_run_modes. Adjacency terms mirror what each store
    actually ships (device: semantic OR spatial table; sharded: semantic
    only), exactly like production resolve_data_mode/build_store."""
    from tf_vqa_regat_tpu.data.device_store import estimate_nbytes
    from tf_vqa_regat_tpu.data.sharded_store import estimate_sharded_nbytes
    from tf_vqa_regat_tpu.train.loop import resolve_data_mode

    include_adj = relation_type in ("semantic", "spatial")
    rows = []
    for dtype in ("float32", "bfloat16", "int8"):
        cfg = _cfg_for(ds, dtype, budget_gb, relation_type)
        rows.append(
            (
                dtype,
                estimate_nbytes(ds, include_adj, dtype),
                estimate_sharded_nbytes(
                    ds, include_adj and relation_type == "semantic", dtype, dp
                ),
                resolve_data_mode(cfg, ds, None, include_adj, dp),
            )
        )
    return rows


def train_run_modes(
    train_ds, val_ds, dp: int, budget_gb: float, relation_type: str
):
    """(dtype -> auto mode) for an actual `--mode train` run: both splits
    resolved JOINTLY with the budget halved per store — the exact call
    run_training makes (train/loop.py _DataPath)."""
    from tf_vqa_regat_tpu.train.loop import resolve_data_mode

    include_adj = relation_type in ("semantic", "spatial")
    return {
        dtype: resolve_data_mode(
            _cfg_for(val_ds, dtype, budget_gb, relation_type),
            val_ds, train_ds, include_adj, dp,
        )
        for dtype in ("float32", "bfloat16", "int8")
    }


def int8_check(features, sample_rows: int):
    """Quantization-error stats over a strided sample of real rows.

    Returns dict(rel_err_mean, rel_err_max, outlier_ratio_p99, n_sampled).
    rel_err = ||x - dequant(quant(x))||_2 / ||x||_2 per row; outlier ratio
    = rowmax/row-RMS (99th percentile over sampled rows)."""
    from tf_vqa_regat_tpu.data.device_store import quantize_rows

    n = features.shape[0] if features.ndim == 2 else (
        features.shape[0] * features.shape[1]
    )
    flat3 = features.ndim == 3
    take = min(sample_rows, n)
    step = max(n // take, 1)
    rel_errs = []
    ratios = []
    # contiguous-slice reads (h5py-safe) in small blocks along the stride
    BLOCK = 64
    got = 0
    for lo in range(0, n, step * BLOCK):
        hi = min(lo + BLOCK, n)
        if flat3:
            i0, i1 = lo // features.shape[1], -(-hi // features.shape[1])
            # offset into the image-aligned block: rows [lo, hi), not the
            # block's first hi-lo rows (which snapped every sample back to
            # an image boundary — round-3 review finding)
            off = lo - i0 * features.shape[1]
            chunk = np.asarray(features[i0:i1], np.float32).reshape(
                -1, features.shape[-1]
            )[off : off + (hi - lo)]
        else:
            chunk = np.asarray(features[lo:hi], np.float32)
        if not len(chunk):
            continue
        q, s = quantize_rows(chunk)
        deq = q.astype(np.float32) * s[:, None]
        norm = np.linalg.norm(chunk, axis=1)
        ok = norm > 0
        rel_errs.append(
            np.linalg.norm(chunk - deq, axis=1)[ok] / norm[ok]
        )
        rms = norm[ok] / np.sqrt(chunk.shape[1])
        ratios.append(np.abs(chunk[ok]).max(axis=1) / np.maximum(rms, 1e-12))
        got += int(ok.sum())
        if got >= take:
            break
    rel = np.concatenate(rel_errs) if rel_errs else np.zeros(1)
    rat = np.concatenate(ratios) if ratios else np.zeros(1)
    return {
        "rel_err_mean": float(rel.mean()),
        "rel_err_max": float(rel.max()),
        "outlier_ratio_p99": float(np.percentile(rat, 99)),
        "n_sampled": int(len(rel)),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_folder", required=True)
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--splits", default="train,val")
    ap.add_argument("--dp", type=int, default=8)
    ap.add_argument("--budget_gb", type=float, default=8.0)
    ap.add_argument("--sample_rows", type=int, default=4096)
    ap.add_argument("--relation_type", default="implicit")
    ap.add_argument("--tfidf", action="store_true")
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    args = ap.parse_args()

    from tf_vqa_regat_tpu.data.dictionary import Dictionary
    from tf_vqa_regat_tpu.data.entries import EntryTable, question_path
    from tf_vqa_regat_tpu.data.features import (
        VQADataset, load_feature_store,
    )

    report = {"data_folder": args.data_folder, "splits": {}}
    ok = True
    loaded = {}  # split -> VQADataset (for the joint train-run resolution)
    for name in [s.strip() for s in args.splits.split(",") if s.strip()]:
        inv = inventory(args.data_folder, name, args.adaptive, args.tfidf)
        missing = [p for p, exists, _ in inv if not exists]
        split_rep = {
            "files": [
                {"path": p, "exists": e, "bytes": sz} for p, e, sz in inv
            ],
            "missing": missing,
        }
        report["splits"][name] = split_rep
        if not args.json:
            print(f"== split {name!r} ==")
            for p, exists, sz in inv:
                mark = "ok " if exists else "MISSING"
                print(f"  [{mark}] {p}" + (f" ({_fmt_bytes(sz)})" if exists else ""))
        if missing:
            ok = False
            if not args.json:
                print(f"  -> {len(missing)} file(s) missing; skipping estimates")
            continue

        # lazy store: HDF5 metadata + box tables only; no feature read
        store = load_feature_store(
            args.data_folder, name, args.adaptive, args.relation_type, mmap=True
        )
        # entry-count terms from the question JSON (no target join needed);
        # image_index spreads uniformly so the sharded layout's max-entries
        # term approximates the real per-shard distribution instead of
        # collapsing every entry onto one shard
        with open(question_path(args.data_folder, name)) as fh:
            n_q = len(json.load(fh)["questions"])
        n_img = (
            store.pos_boxes.shape[0]
            if store.adaptive
            else store.features.shape[0]
        )
        ent = EntryTable(
            question_ids=np.zeros(n_q, np.int64),
            image_ids=np.zeros(n_q, np.int64),
            image_index=(np.arange(n_q) % max(n_img, 1)).astype(np.int32),
            q_tokens=np.zeros((n_q, 14), np.int32),
            label_offsets=np.zeros(n_q + 1, np.int64),
            labels=np.zeros(0, np.int32),
            scores=np.zeros(0, np.float32),
            has_answers=False,
        )
        ds = VQADataset(
            name=name, entries=ent, store=store, num_ans=3129,
            label2ans=[], dictionary=Dictionary(), relation_type=args.relation_type,
            ntoken=19901,
        )
        loaded[name] = ds
        rows = estimate_tables(ds, args.dp, args.budget_gb, args.relation_type)
        split_rep["estimates"] = [
            {
                "feature_dtype": d, "replicated_bytes": r,
                "per_shard_bytes": s, "auto_mode": m,
            }
            for d, r, s, m in rows
        ]
        if not args.json:
            print(f"  questions: {n_q:,}; feature rows: "
                  f"{int(np.prod(store.features.shape[:-1])):,} x {store.v_dim}")
            print(f"  {'dtype':9s} {'replicated':>12s} {'/shard@dp%d' % args.dp:>12s}  auto (eval-only)->")
            for d, r, s, m in rows:
                print(f"  {d:9s} {_fmt_bytes(r):>12s} {_fmt_bytes(s):>12s}  {m}")
            if all(m == "host" for *_x, m in rows):
                print("  !! every dtype resolves to host streaming — raise "
                      "--budget_gb, add chips, or use int8")

        chk = int8_check(store.features, args.sample_rows)
        split_rep["int8_check"] = chk
        if not args.json:
            print(
                f"  int8 sample ({chk['n_sampled']} rows): rel L2 err "
                f"mean {chk['rel_err_mean']:.4f} / max {chk['rel_err_max']:.4f}; "
                f"outlier ratio p99 {chk['outlier_ratio_p99']:.1f}"
            )
            if chk["rel_err_max"] > 0.05 or chk["outlier_ratio_p99"] > 20:
                print(
                    "  !! heavy outlier structure: per-row int8 loses "
                    ">5% of some rows — validate training dynamics before "
                    "trusting --feature_dtype int8 (REALDATA.md §3)"
                )
            else:
                print("  int8 quantization looks safe on this split")
    # The run a user is actually preparing for: `--mode train` resolves BOTH
    # splits jointly with the budget halved per store (train/loop.py) — the
    # per-split eval-only column above intentionally does not predict it
    # (round-3 review finding: preflight previously used the full budget and
    # a default-implicit config, mispredicting real training runs).
    if "train" in loaded and "val" in loaded:
        modes = train_run_modes(
            loaded["train"], loaded["val"], args.dp, args.budget_gb,
            args.relation_type,
        )
        report["train_run_auto_mode"] = modes
        if not args.json:
            print(f"== `--mode train` resolution (val+train jointly, "
                  f"budget/2 per store, dp={args.dp}) ==")
            for d, m in modes.items():
                print(f"  {d:9s} auto-> {m}")
            if all(m == "host" for m in modes.values()):
                print("  !! the training run lands on host streaming — raise "
                      "--budget_gb, add chips, or use int8")

    for ds in loaded.values():
        if ds.store.h5_file is not None:
            ds.store.h5_file.close()

    report["ok"] = ok
    if args.json:
        print(json.dumps(report))
    elif not ok:
        print("PREFLIGHT: missing files — fix the inventory before training")
        raise SystemExit(1)
    else:
        print("PREFLIGHT: all files present; see estimates above")


if __name__ == "__main__":
    main()
