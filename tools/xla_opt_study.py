"""Study: TPU compiler-option overrides on the flagship blocked train step.

PERF_NOTES' profile pass #3 verdict was that the residual ~1.3x between the
shipped step and the model's ceiling (2.8 ms of XLA-chosen "data formatting"
relayouts + 1.1 ms of copies at R=100) "needs XLA scheduler/layout changes,
not framework code". This tool prices the one channel through which such
changes ARE reachable from framework code: PJRT per-compile
``compiler_options``.

Why not XLA_FLAGS: the tunneled axon client has no libtpu flag registry, so
``XLA_FLAGS=--xla_tpu_*`` aborts client-side in parse_flags_from_env
("Unknown flag"). ``jitted.lower(...).compile(compiler_options={...})``
instead ships the overrides WITH the remote compile request, where the
server's tpu_compile_helper validates them — a bogus option name or an
absurd value (scoped_vmem_limit_kib=1) fails the compile with HTTP 500, so
accepted variants below are genuinely applied, not silently dropped.

Measures the PRODUCTION blocked builder (train/step.py::
build_store_train_block, K=8 — the --train_block auto default) at R=100,
one lowering compiled once per option set. Protocol per PERF_NOTES: chain
every block through the donated state, warm each executable before timing,
end every timed region with a device_get that depends on every step; the
per-variant figure is the median of --repeats timed passes.

Candidate set: the single-chip-relevant slice of the public MaxText/PAX
TPU tuning flags (scoped vmem budget, rwb fusion, dot strength reduction,
dot-dot fusion, latency-hiding scheduler); collective-overlap flags are
omitted (no collectives in the single-chip program). Unknown-to-this-libtpu
names are reported as REJECTED rather than skipped silently.

Usage:  python tools/xla_opt_study.py [--steps 192] [--k 8] [--repeats 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax
import numpy as np

from bench import BATCH, MODEL_VARIANTS, NTOKEN, NUM_ANS, V_DIM, variant_cfg
from tf_vqa_regat_tpu.data.device_store import DeviceStore
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.models.regat import init_regat, resolve_impl, trainable_mask
from tf_vqa_regat_tpu.parallel.mesh import make_mesh, replicated
from tf_vqa_regat_tpu.train.optim import make_optimizer
from tf_vqa_regat_tpu.train.step import build_store_train_block, init_train_state

# (name, overrides) — values are strings per the PJRT env_option_overrides
# convention. Ordered cheapest-hypothesis first; baseline = {} anchors the
# comparison within this process/tunnel session.
VARIANTS = [
    ("baseline", {}),
    # vmem budget for scoped allocations: larger lets the fusion cost model
    # build bigger fusions (MaxText ships 98304 on v5e for transformer
    # blocks); the attention chain's [b,R,H,n] tensors are small, so this
    # probes whether the formatting cost is a fusion-size artifact.
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # read-write-back fusion off: a known win on some memory-bound TPU
    # workloads (public PAX/MaxText recipes) — targets the loop-fusion tier
    # (3.8 ms at R=100, near the HBM bound).
    ("no_rwb", {"xla_tpu_rwb_fusion": "false"}),
    # keep small dots as dots instead of strength-reducing to elementwise:
    # targets the batched small-matmul attention chain.
    ("no_dot_sr", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    # allow fusing producer dots into consumer dots even when duplicated.
    ("dot_dot_dup", {"xla_tpu_dot_dot_fusion_duplicated": "true"}),
    # latency-hiding scheduler: mostly reorders around async collectives
    # (none here) but also changes copy/done scheduling.
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # combination of the accepted single-flag winners is appended at runtime
    # (see main) if at least two independent flags win >= 0.5%.
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=192,
                    help="optimizer steps per timed pass (steps//k blocks)")
    ap.add_argument("--k", type=int, default=8, help="train block size")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--rois", type=int, default=100,
                    help="static roi size R (bucket point) to measure at")
    ap.add_argument(
        "--model", default="flagship", choices=sorted(MODEL_VARIANTS),
        help="bench.py MODEL_VARIANTS key whose production blocked step to "
             "sweep (default: flagship)")
    ap.add_argument(
        "--variant", action="append", default=[],
        help="extra variant 'name:key=val[;key=val]' — replaces the "
             "built-in candidate list (baseline always runs first)")
    args = ap.parse_args()
    variants = list(VARIANTS)
    if args.variant:
        variants = [("baseline", {})]
        for spec in args.variant:
            name, _, kvs = spec.partition(":")
            opts = dict(kv.split("=", 1) for kv in kvs.split(";") if kv)
            variants.append((name, opts))

    jax.config.update("jax_default_prng_impl", "rbg")
    # NO persistent compilation cache: each variant must hit the remote
    # compiler so the override set is actually exercised (and compile wall
    # time per variant is itself reported).
    cfg = variant_cfg(args.model)
    mesh = make_mesh()
    impl = resolve_impl(cfg)

    R, K = args.rois, args.k
    nblocks = args.steps // K
    nq = nblocks * K * BATCH
    ds = synthetic_dataset(num_images=512, num_questions=nq, v_dim=V_DIM,
                           num_ans=NUM_ANS, adaptive=True, seed=0)
    store = DeviceStore(ds, sharding=replicated(mesh), feature_dtype="bfloat16")
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
    mask = trainable_mask(params, emb2_trainable=True)
    optimizer = make_optimizer(cfg.base_lr, cfg.grad_clip, args.steps,
                               cfg.lr_decay_rate, cfg.lr_decay_step, mask)
    rng = jax.random.PRNGKey(1)
    state = init_train_state(params, optimizer, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P

    blkspec = NamedSharding(mesh, P(None, "data"))
    order = np.arange(nq, dtype=np.int32)
    blocks = [
        jax.device_put(order[b * K * BATCH:(b + 1) * K * BATCH].reshape(K, BATCH),
                       blkspec)
        for b in range(nblocks)
    ]

    print(f"setup done: {nblocks} blocks of K={K} at R={R}; lowering...",
          flush=True)
    block_fn = build_store_train_block(
        cfg.replace(num_rois=R), NTOKEN, optimizer, mesh, impl, params,
        NUM_ANS, store.padding_idx, block=K,
    )
    lowered = block_fn.lower(state, store.arrays, blocks[0], rng)
    print("lowered; compiling variants (remote, uncached — minutes each)",
          flush=True)

    results = {}

    def run_variant(name, opts):
        nonlocal state
        print(f"[{name:12s}] compiling...", flush=True)
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile(compiler_options=dict(opts) or None)
        except Exception as e:  # server-side validation: unknown name/value
            print(f"[{name:12s}] REJECTED by remote compiler: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            return
        compile_s = time.perf_counter() - t0
        for _ in range(2):  # exec warm (donated chain)
            state, m = compiled(state, store.arrays, blocks[0], rng)
        jax.device_get(m["loss"])
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for blk in blocks:
                state, m = compiled(state, store.arrays, blk, rng)
            jax.device_get(m["loss"])
            times.append(time.perf_counter() - t0)
        per = float(np.median(times)) / (nblocks * K)
        results[name] = per
        base = results.get("baseline", per)
        print(f"[{name:12s}] {per * 1e3:7.3f} ms/step  {BATCH / per:8.0f} q/s  "
              f"({base / per - 1:+.3%} vs baseline)  compile {compile_s:5.1f}s  "
              f"spread {min(times) / (nblocks * K) * 1e3:.3f}-"
              f"{max(times) / (nblocks * K) * 1e3:.3f} ms", flush=True)

    for name, opts in variants:
        run_variant(name, opts)

    if "baseline" in results:
        base = results["baseline"]
        winners = {
            n: o for n, o in variants[1:]
            if n in results and results[n] < base * 0.995
        }
        if len(winners) >= 2:
            combo = {}
            for o in winners.values():
                combo.update(o)
            run_variant("combo", combo)
        print("\nbest:", min(results, key=results.get),
              {n: f"{base / t - 1:+.2%}" for n, t in sorted(results.items())},
              flush=True)


if __name__ == "__main__":
    main()
