"""Config system: argparse surface + JSON overlay with CLI-wins semantics.

Mirrors the reference public contract exactly (reference main.py:14-97 defines the
flag surface; config/parser.py:13-23 defines the overlay semantics: JSON values
override argparse defaults, but flags explicitly present on the command line win
over the JSON). ``python main.py --config configs/butd_vqa.json [--mode eval
--checkpoint PATH]`` must behave identically.

A typed dataclass sits behind the argparse surface so the rest of the framework
never touches argparse.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from typing import Any, List, Optional


@dataclasses.dataclass
class Config:
    # --- training logistics (reference main.py:19-27) ---
    epochs: int = 20
    base_lr: float = 1e-3
    lr_decay_start: int = 15
    lr_decay_rate: float = 0.25
    lr_decay_step: int = 2
    grad_clip: float = 0.25
    batch_size: int = 8
    output: str = "saved_models/"
    seed: int = 42

    # --- loading trained models (main.py:32) ---
    checkpoint: str = ""

    # --- dataset (main.py:37-46) ---
    dataset: str = "vqa"  # vqa | vqa_cp
    data_folder: str = "./data"
    use_both: bool = False
    use_vg: bool = False
    adaptive: bool = False

    # --- model (main.py:50-59) ---
    relation_type: str = "implicit"  # spatial | semantic | implicit
    fusion: str = "mutan"  # ban | butd | mutan
    tfidf: bool = False
    op: str = "c"
    num_hid: int = 1024

    # --- relation hyper-params (main.py:64-90) ---
    imp_pos_emb_dim: int = 64
    spa_label_num: int = 11
    sem_label_num: int = 15
    dir_num: int = 2
    relation_dim: int = 1024
    nongt_dim: int = 20
    num_heads: int = 16
    num_steps: int = 1
    residual_connection: bool = False
    label_bias: bool = False
    dropout: float = 0.2

    # --- run control (main.py:94-95) ---
    print_freq: int = 500
    mode: str = "train"  # train | eval | ensemble_eval | export_h5 | predict | serve
    # --- serving (--mode serve: HTTP answer service, serve.py) ---
    serve_port: int = 8000
    # Pre-compiled serve batch sizes; requests micro-batch to the smallest
    # size that fits (no recompiles at serve time).
    serve_batch_sizes: str = "1,8,32"
    # Max milliseconds a micro-batch waits for stragglers before running.
    serve_max_delay_ms: float = 5.0
    # Split for --mode predict (VQA submission JSON): test2015 | test-dev2015
    # | val. Capability the reference lacks — its eval needs soft targets
    # (reference train.py:151-170), so its downloaded test features are
    # unusable from it.
    predict_split: str = "test2015"
    # Three-branch ensemble eval (ReGAT paper headline setting; BASELINE
    # config #5): "implicit:PATH,spatial:PATH,semantic:PATH".
    ensemble_checkpoints: str = ""

    # --- present in shipped JSON config but unused by the reference model
    # (config/butd_vqa.json:15) — accepted for compatibility ---
    lr_decay_based_on_val: bool = False

    # === TPU-framework extensions (not in the reference; all have defaults so
    # reference configs parse unchanged) ===
    # Static roi padding (reference padded to the per-batch max, dataset.py:329;
    # TPU needs static shapes). 0 = auto: 36 fixed / 100 adaptive.
    num_rois: int = 0
    # bfloat16 matmuls AND bf16 activation storage (params, optimizer,
    # softmax statistics, and the answer logits stay float32). Off by default
    # for exact reference parity; on v5e the full-bf16-activation mode is
    # +12.5% train q/s over f32 on top of bf16 feature tables, with training
    # dynamics indistinguishable from f32 — PERF_NOTES.md bf16 experiment.
    # TPU-only (XLA:CPU lacks bf16 dots).
    compute_dtype: str = "float32"
    # Eval batch size; 0 = the reference's batch_size//4 (main.py:118 — an
    # artifact of its dynamic padding). With static masked shapes eval is
    # fastest at the full train batch (+19% measured at 256 vs 64 on v5e).
    eval_batch: int = 0
    # Eval batches evaluated per dispatched program (device data mode): one
    # jitted lax.scan over K index batches. Eval is dispatch-latency-bound
    # over a tunneled TPU (device-busy ~7 ms vs ~23 ms wall per batch,
    # tools/profile_step.py) — blocking amortizes the round trip K-fold.
    # The tail block pads with -1 (invalid) batches; metrics are exact.
    # 1 disables (one program per batch).
    eval_block: int = 8
    # Train steps executed per dispatched program (device/sharded data
    # modes): one jitted lax.scan carries the donated train state through K
    # optimizer steps, amortizing the per-step dispatch overhead the donated
    # chain still pays. 0 = AUTO (the default): K=8 on the device/sharded
    # stores, per-step on the host path (train/loop.py::resolve_train_block)
    # — measured +4.1% train q/s at the production bucket mix on the
    # tunneled v5e (K=4 +3.1%, K=16 +4.5% with double the tail padding;
    # single-bucket R=100 +3.7%; tools/train_block_bench.py --mix,
    # PERF_NOTES.md). 1 forces per-step. Tail blocks pad with -1 batches
    # that a lax.cond passes through WITHOUT touching the state (no
    # optimizer update, no step/LR advance) — single-bucket blocked training
    # is step-for-step identical to per-step training. With --roi_buckets
    # the epoch stream groups K same-size batches per block, so the
    # optimizer visits the same batches in a block-granular order
    # (documented ordering change, recorded in the resume run signature).
    train_block: int = 0
    # EVAL: fold the two graph-attention directions into one 2H-head
    # computation (jnp impl, dir_num=2) — attention matmuls at double width,
    # the [b,R,n,P] sinusoid computed once. +16% eval q/s on v5e; exact
    # modulo matmul batching order (eval has no dropout). Train keeps
    # per-direction programs: the folded backward measured ~8% slower
    # (PERF_NOTES.md).
    fold_dual_attention: bool = True
    # PRNG implementation for dropout masks: "threefry" (default, stable
    # cross-platform streams) or "rbg" (hardware RNG; ~15% faster train step
    # at these shapes — dropout masks are ~100M bits/step).
    prng_impl: str = "threefry"
    # Gradient accumulation: split each optimizer batch into this many
    # microbatches inside the jitted step (lax.scan), accumulate sum-loss
    # grads, apply ONE Adamax update on the batch-mean gradient — identical
    # optimizer semantics to the single-pass step (per-tensor clip acts on
    # the accumulated gradient), with peak activation memory divided by the
    # factor. Trains batch-256 reference semantics where one pass doesn't
    # fit (e.g. host-streaming f32 at R=100 next to a resident table).
    # Dropout draws a distinct folded key per microbatch. 1 = off (the
    # single-pass step, unchanged).
    grad_accum: int = 1
    # Mesh axes: data-parallel size (0 = all local devices) x model-parallel.
    dp_size: int = 0
    tp_size: int = 1
    # Roi-axis sharding over the 'model' axis (the sequence-parallel analog
    # for this model family, SURVEY §2.5) — anchor constraints in apply_regat.
    sp_rois: bool = False
    # Use the fused Pallas graph-attention kernel instead of XLA batched
    # einsums. Off by default: XLA is ~2x faster at the flagship shapes (the
    # 20-key axis starves per-head MXU tiles in the kernel's grid) — see
    # models/regat.py::resolve_impl.
    use_pallas: bool = False
    # Checkpoint every epoch + keep best (reference saved final weights only,
    # main.py:145). Resume picks up the latest checkpoint in `output`.
    resume: bool = False
    save_every_epoch: bool = True
    # Mid-epoch checkpointing: additionally save a step checkpoint every N
    # optimizer steps (0 = per-epoch only). --resume then restarts INSIDE the
    # interrupted epoch at the exact step — data order (seeded epoch
    # permutation), dropout stream (state step counter) and the epoch's
    # metric accumulators are all restored, so the resumed run reproduces the
    # uninterrupted run exactly (tests/test_checkpoint.py). A SIGTERM during
    # training also saves at the next dispatch boundary (per step, or per
    # --train_block block under blocked training) and exits cleanly — the
    # TPU-preemption contract the reference (no checkpointing at all,
    # main.py:145) has no answer to; under multi-process the save step is
    # agreed across hosts via JAX's preemption sync service.
    checkpoint_every_steps: int = 0
    # Async checkpoint writes (single-process only; multi-process saves are
    # collective and stay blocking): the state is snapshotted into fresh
    # device buffers (one jitted HBM copy, ~ms — the train step donates the
    # live buffers) and the host fetch + Orbax write + meta + prune run on a
    # background thread, overlapped with training. Crash-safety ordering is
    # preserved (meta written last, one write in flight).
    # --no-async_checkpoint restores blocking saves.
    async_checkpoint: bool = True
    # Keep only the newest N per-epoch checkpoints (0 = keep all). "best"
    # and any mid-epoch step checkpoint are never retention-pruned; a
    # 20-epoch flagship run at ~420 MB/state drops from ~8.8 GB to
    # N x 420 MB + best.
    keep_ckpts: int = 0
    # Debug switches (SURVEY §5): jax_debug_nans behind a flag.
    debug_nans: bool = False
    # Profiling (SURVEY §5): trace server port (0 = off) and per-epoch
    # programmatic traces directory ("" = off).
    profile_port: int = 0
    profile_dir: str = ""
    # Data loader prefetch depth (host->device double buffering).
    prefetch: int = 2
    # Data path: "auto" resolves device -> sharded -> host: feature tables
    # replicated in HBM with on-device batch gather when they fit
    # device_store_budget_gb; else partitioned across the data mesh axis
    # (dp>1) when the per-shard slice fits (the real adaptive train split
    # lands here on a v5e-8); else host streaming.
    # "device"/"sharded"/"host" force a mode (train/loop.py::
    # resolve_data_mode is the single policy).
    data_mode: str = "auto"
    device_store_budget_gb: float = 8.0
    # Keep the HDF5 feature table lazy instead of materializing it into host
    # RAM (the reference loads ~58 GB f32 into RAM, dataset.py:206-230). The
    # device stores then convert it chunk-by-chunk straight to feature_dtype
    # — host peak RAM becomes the converted table + one chunk (e.g. ~15 GB
    # for int8 instead of ~73 GB); host streaming reads per-image slices
    # from disk.
    mmap_features: bool = False
    # Packed-feature cache directory ("" = off; device AND sharded data
    # modes): the converted feature table (+ int8 scales) persists as .npy
    # after the first run; later runs memory-map it, skipping the HDF5 read
    # and dtype conversion entirely (minutes of startup at the ~58 GB
    # adaptive scale). The sharded cache is keyed by dp too (the layout
    # depends on the shard count). Composes with --mmap_features (the HDF5
    # read drops to ~64 fingerprint-sample rows on a hit) and any
    # --feature_dtype.
    packed_cache: str = ""
    # Feature dtype on the device path AND the host-streaming wire:
    # "bfloat16" halves the device-store resident footprint + gather traffic
    # (re-widened to f32 at gather) and halves host->device bytes/batch when
    # streaming (~214 -> ~109 MB at flagship shapes — the tunnel transfer is
    # the host path's bottleneck, PERF_NOTES.md). "int8" (device/sharded
    # stores only) quantizes per row (scale = rowmax/127, dequantized at
    # gather): 4x smaller — fits the full ~58 GB adaptive train table in one
    # v5e's 16 GB HBM. Input-rounding only; box tables stay float32
    # (spatial-graph labels are discrete in them).
    feature_dtype: str = "float32"
    # Roi bucketing (device and sharded data modes): comma-separated static
    # roi sizes, e.g. "36,64,100" — homogeneous-size batches route to
    # per-size compiled programs, recovering the padding waste of
    # always-padding to the max (measured R=100/64/36 -> 8.5k/12.0k/16.6k
    # train q/s; SURVEY §7). In sharded mode every shard steps through the
    # same deterministic (R, step) schedule (per-bucket step count = max over
    # shards), padding short segments with -1. Empty = single static size
    # (resolved_num_rois()).
    roi_buckets: str = ""
    # BAN glimpses / MuTAN rank+glimpses (net-new families; defaults match the
    # PyTorch ReGAT's ban_gamma=4 / mutan_gamma=2 and block-lib rank=15).
    ban_glimpse: int = 4
    mutan_rank: int = 15
    mutan_gamma: int = 2
    # MuTAN training speed option (default off = upstream-pinned): share the
    # q-side input-dropout mask across rois in the attention Tucker block.
    # The upstream `block` lib flattens rois into the batch, so each roi
    # draws its OWN mask over the (identical) broadcast question activations
    # — which forces the q-side merge matmuls (1200 x 1200*rank) to run per
    # roi instead of per example (models/mutan.py). One shared per-example
    # mask is an equally valid Bernoulli regularizer and keeps the q-side
    # per-example, which also unlocks the Tucker rank-sum reassociation in
    # train (models/mutan.py): 8.0 -> 1.7 TF/step, train 4.1k -> 7.1k q/s
    # measured (PERF_NOTES "MuTAN shared q-mask" + "rank-sum
    # reassociation"). Identical to the default path whenever no input
    # dropout runs (eval / dropout=0; pinned by test).
    mutan_shared_qdrop: bool = False
    # Synthetic-data mode for benchmarking without the 90GB dataset on disk.
    synthetic: bool = False
    synthetic_train_size: int = 4096
    synthetic_val_size: int = 1024
    # Reference-quirk compatibility switches. This framework deliberately
    # fixes two reference transcription bugs (models/language.py docstring;
    # ops/position.py docstring). These flags reproduce the reference's exact
    # behavior instead, enabling (a) bit-matched TF-vs-JAX training-trajectory
    # equivalence runs and (b) A/B quantification of each fix
    # (tools/trajectory_equivalence.py, tests/test_trajectory.py).
    ref_compat_q_att: bool = False  # softmax-over-batch scramble (language_model.py:163-167)
    ref_compat_pos: bool = False  # row-sliced pos matrix + flat regroup (SURVEY §2.3-P2)

    def __post_init__(self) -> None:
        # Enum-valued extension flags are validated here — the single funnel
        # every entrypoint (train/eval/predict/serve/ensemble) passes through;
        # a typo'd --feature_dtype must not silently build f32 tables (4x the
        # intended footprint for the int8 single-chip capacity case).
        _check = {
            "feature_dtype": ("float32", "bfloat16", "int8"),
            "compute_dtype": ("float32", "bfloat16"),
            "data_mode": ("auto", "device", "host", "sharded"),
            "prng_impl": ("threefry", "rbg"),
        }
        for field, allowed in _check.items():
            v = getattr(self, field)
            if v not in allowed:
                raise ValueError(
                    f"--{field} {v!r} is not one of {'|'.join(allowed)}"
                )
        if self.print_freq < 0:
            raise ValueError(
                f"--print_freq must be >= 0 (0 silences step lines), got "
                f"{self.print_freq}"
            )
        if self.train_block < 0 or self.eval_block < 0:
            raise ValueError(
                f"--train_block/--eval_block must be >= 0 (0 = auto for "
                f"train / off for eval; 1 disables blocking), got "
                f"{self.train_block}/{self.eval_block}"
            )
        # serve flags validate here, not at MicroBatcher construction: an
        # empty --serve_batch_sizes otherwise surfaced as an opaque
        # `max() arg is an empty sequence` AFTER the full feature-table
        # upload (review finding)
        sizes = [x for x in self.serve_batch_sizes.split(",") if x.strip()]
        if not sizes or any(int(x) <= 0 for x in sizes):
            raise ValueError(
                f"--serve_batch_sizes needs >=1 positive sizes, got "
                f"{self.serve_batch_sizes!r}"
            )
        if self.serve_max_delay_ms < 0:
            raise ValueError(
                f"--serve_max_delay_ms must be >= 0, got "
                f"{self.serve_max_delay_ms}"
            )

    def resolved_num_rois(self) -> int:
        if self.num_rois > 0:
            return self.num_rois
        return 100 if self.adaptive else 36

    def resolved_eval_batch(self, dp: int) -> int:
        """Eval batch rounded up to a data-mesh multiple (the batch dim is
        sharded over `dp` devices)."""
        base = self.eval_batch if self.eval_batch > 0 else max(self.batch_size // 4, 1)
        return -(-base // dp) * dp

    def parsed_roi_buckets(self):
        buckets = sorted(int(x) for x in self.roi_buckets.split(",") if x.strip())
        return buckets or None

    @property
    def word_dim(self) -> int:
        return 600 if "c" in self.op else 300

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)


_BOOL_FLAGS = {
    f.name
    for f in dataclasses.fields(Config)
    if f.type in ("bool", bool)
}


def build_arg_parser() -> argparse.ArgumentParser:
    """Argparse surface identical (plus extensions) to reference main.py:14-97."""
    parser = argparse.ArgumentParser(description="TPU-native ReGAT")
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        if f.name in _BOOL_FLAGS:
            # Superset of the reference's store_true booleans
            # (main.py:41-46,86-89): `--flag` still sets True, and
            # `--no-flag` can disable default-True fields (e.g.
            # --no-save_every_epoch), which store_true could not express.
            parser.add_argument(
                name, action=argparse.BooleanOptionalAction, default=f.default
            )
        else:
            parser.add_argument(name, type=type(f.default), default=f.default)
    parser.add_argument("--config", type=str, default=None, help="JSON config file")
    return parser


def parse_with_config(argv: Optional[List[str]] = None) -> Config:
    """JSON overlays argparse defaults; explicit CLI flags win.

    Same semantics as reference config/parser.py:13-23 (override keys scraped
    from argv).
    """
    if argv is None:
        argv = sys.argv[1:]
    parser = build_arg_parser()
    args = parser.parse_args(argv)
    if args.config is not None:
        with open(args.config) as fh:
            config_args = json.load(fh)
        override_keys = set()
        for a in argv:
            if not a.startswith("--"):
                continue
            k = a[2:].split("=")[0]
            if k.startswith("no-"):  # BooleanOptionalAction off-switch
                k = k[3:]
            override_keys.add(k)
        known = {f.name for f in dataclasses.fields(Config)}
        for k, v in config_args.items():
            if k in override_keys:
                continue
            if k not in known:
                raise ValueError(f"Unknown config key in JSON: {k!r}")
            setattr(args, k, v)
    d = vars(args)
    d.pop("config", None)
    return Config(**d)
