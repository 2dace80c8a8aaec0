"""Per-op device-time breakdown of the flagship train/eval step (v5e).

Runs the same bf16 device-store step bench.py measures, under
``jax.profiler.trace``, then aggregates the xplane with xprof's
framework_op_stats converter. Output: top HLO ops by self device time —
the ground truth for where the step's ~25 ms actually goes, replacing
ablation guesswork.

Usage:  python tools/profile_step.py [--eval] [--rois 100] [--steps 20]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(_HERE), ".jax_cache"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--rois", type=int, default=100)
    ap.add_argument("--steps", type=int, default=20)
    from bench import MODEL_VARIANTS

    ap.add_argument(
        "--variant", default="flagship", choices=sorted(MODEL_VARIANTS),
        help="bench.py MODEL_VARIANTS key (e.g. mutan_shared) to profile",
    )
    ap.add_argument("--trace_dir", default="/tmp/regat_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from bench import BATCH, NTOKEN, NUM_ANS, V_DIM, variant_cfg
    from tf_vqa_regat_tpu.data.device_store import DeviceStore
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.models.regat import init_regat, resolve_impl, trainable_mask
    from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from tf_vqa_regat_tpu.train.optim import make_optimizer
    from tf_vqa_regat_tpu.train.step import (
        build_store_eval_step,
        build_store_train_step,
        init_train_state,
    )

    cfg = variant_cfg(args.variant).replace(num_rois=args.rois)
    mesh = make_mesh()
    impl = resolve_impl(cfg)
    bspec = batch_sharding(mesh)
    ds = synthetic_dataset(
        num_images=128, num_questions=2048, v_dim=V_DIM, num_ans=NUM_ANS,
        adaptive=True, seed=0,
    )
    store = DeviceStore(ds, sharding=replicated(mesh), feature_dtype="bfloat16")
    params = init_regat(jax.random.PRNGKey(0), cfg, NTOKEN, V_DIM, NUM_ANS)
    mask = trainable_mask(params, emb2_trainable=True)
    optimizer = make_optimizer(
        cfg.base_lr, cfg.grad_clip, 8, cfg.lr_decay_rate, cfg.lr_decay_step, mask
    )
    state = init_train_state(params, optimizer, mesh)
    rng = jax.random.PRNGKey(1)

    idx_all = list(store.epoch_indices(0, BATCH, shuffle=True, seed=0))
    idxs = [jax.device_put(i, bspec) for i in idx_all[: args.steps]]

    if args.eval:
        step = build_store_eval_step(cfg, NTOKEN, mesh, impl, NUM_ANS, store.padding_idx)

        def run():
            acc = None
            for idx in idxs:
                m = step(state["params"], store.arrays, idx)
                acc = m["loss"] if acc is None else acc + m["loss"]
            jax.device_get(acc)
    else:
        step = build_store_train_step(
            cfg, NTOKEN, optimizer, mesh, impl, params, NUM_ANS, store.padding_idx
        )

        holder = {"state": state}

        def run():
            s = holder["state"]
            for idx in idxs:
                s, m = step(s, store.arrays, idx, rng)
            holder["state"] = s
            jax.device_get(m["loss"])

    run()  # compile + warm
    run()
    with jax.profiler.trace(args.trace_dir):
        run()

    paths = sorted(
        glob.glob(os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no xplane produced (tunnel may not support device tracing)")
        return
    report(paths[-1], args.top, len(idxs))


def report(xplane_path: str, top: int, steps: int) -> None:
    """Aggregate hlo_stats by (source line, op category). Requires
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the installed
    tensorboard_plugin_profile protos predate the C++ descriptor pool)."""
    import collections
    import re

    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([xplane_path], "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except Exception:
            pass
        data = data.decode()
    obj = json.loads(data)
    # hlo_stats gviz columns: 2=category 6=occurrences 9=total self time (us)
    # 25=source info.
    rows = [[c.get("v") for c in r["c"]] for r in obj["rows"]]
    total = sum(r[9] for r in rows)
    print(f"xplane: {xplane_path}")
    print(
        f"total device self-time: {total/1e3:.1f} ms "
        f"({total/steps/1e3:.2f} ms/step over {steps} steps)"
    )

    def src(r):
        m = re.search(r"title=''>(.*?)</div>", r[25] or "")
        return m.group(1) if m else "(none)"

    by_line = collections.defaultdict(float)
    by_cat = collections.defaultdict(float)
    for r in rows:
        by_line[(src(r), r[2])] += r[9]
        by_cat[r[2]] += r[9]
    print("== by category ==")
    for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:10]:
        print(f"{v/total*100:5.1f}%  {v/steps/1e3:7.3f} ms/step  {k}")
    print(f"== top {top} by (source line, category) ==")
    for (s, c), v in sorted(by_line.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v/total*100:5.1f}%  {v/steps/1e3:7.3f} ms/step  {c:18s} {s}")


if __name__ == "__main__":
    main()
