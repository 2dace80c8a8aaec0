"""TPU-native ReGAT entrypoint — same public contract as the reference:

    python main.py --config configs/butd_vqa.json [--mode eval --checkpoint P]

(reference main.py:99-157). Train mode: build datasets, init the model, load
GloVe(+TF-IDF) embeddings, train with per-epoch eval + checkpoints, save the
final `{relation_type}-{fusion}-pretrained_model` artifact. Eval mode: restore
a checkpoint and run one eval pass.

Framework extensions beyond the reference's two modes:
  --mode ensemble_eval  three-branch relation ensemble (train/ensemble.py)
  --mode predict        VQA submission JSON for answerless test splits
  --mode serve          HTTP answer service (serve.py)
  --mode export_h5      write an orbax model as a reference-loadable .h5
  --synthetic           identical pipeline on generated in-memory data with
                        real shapes (no 90GB download) — used by bench.py

Capacity/throughput levers (see Config docstrings + PERF_NOTES.md):
--feature_dtype bfloat16|int8, --mmap_features, --packed_cache DIR,
--roi_buckets 36,64,100, --grad_accum k, --data_mode device|sharded|host.
"""

from __future__ import annotations

import os
import sys

# importable regardless of caller cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from tf_vqa_regat_tpu.config import Config, parse_with_config
from tf_vqa_regat_tpu.data.dictionary import Dictionary
from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
from tf_vqa_regat_tpu.data.glove import tfidf_from_questions
from tf_vqa_regat_tpu.models.regat import init_regat, resolve_impl
from tf_vqa_regat_tpu.models.language import word_embedding_load_glove
from tf_vqa_regat_tpu.parallel.mesh import make_mesh
from tf_vqa_regat_tpu.train import checkpoint as ckpt
from tf_vqa_regat_tpu.train.logging import Logger
from tf_vqa_regat_tpu.train.loop import run_evaluation, run_training


def build_datasets(cfg: Config):
    """(train_ds or None, val_ds, emb-init info). Synthetic mode generates
    in-memory data with real shapes; real mode reads the reference's on-disk
    layout."""
    if cfg.synthetic:
        semantic = cfg.relation_type == "semantic" or (
            cfg.mode == "ensemble_eval" and "semantic:" in cfg.ensemble_checkpoints
        )
        val = synthetic_dataset(
            num_images=max(cfg.synthetic_val_size // 8, 8),
            num_questions=cfg.synthetic_val_size,
            adaptive=cfg.adaptive,
            seed=cfg.seed + 1,
            semantic=semantic,
            name="val",
        )
        train = None
        if cfg.mode == "train":
            train = synthetic_dataset(
                num_images=max(cfg.synthetic_train_size // 8, 8),
                num_questions=cfg.synthetic_train_size,
                adaptive=cfg.adaptive,
                seed=cfg.seed,
                semantic=semantic,
                name="train",
            )
        return train, val, None, None

    from tf_vqa_regat_tpu.data.features import load_vqa_dataset

    dictionary = Dictionary.load_from_file(
        os.path.join(cfg.data_folder, "glove", "dictionary.pkl")
    )
    # Ensemble members span relation types: the shared store must carry
    # EVERY member's precomputed adjacency table, not just the top-level
    # --relation_type's (a semantic member would otherwise trace-fail on a
    # missing adj_label — round-3 review finding; synthetic mode already
    # special-cased this above).
    store_rts = None
    if cfg.mode == "ensemble_eval":
        from tf_vqa_regat_tpu.train.ensemble import parse_members

        store_rts = {rt for rt, _ in parse_members(cfg.ensemble_checkpoints)}
        store_rts.add(cfg.relation_type)
    # --use_both/--use_vg only ever compose under --mode train (below);
    # inference modes build the val split alone, so --mmap_features is fine
    # there even when the training JSON config carries use_both. The vqa_cp
    # merged base composes in every mode.
    if cfg.mmap_features and (
        cfg.dataset == "vqa_cp"
        or (cfg.mode == "train" and (cfg.use_both or cfg.use_vg))
    ):
        raise ValueError(
            "--mmap_features cannot compose splits (--use_both/--use_vg and "
            "the vqa_cp merged train+val store concatenate feature tables, "
            "which requires materializing them); drop one or the other"
        )
    if cfg.dataset == "vqa_cp":
        from tf_vqa_regat_tpu.data.compose import (
            load_vqa_cp_base,
            load_vqa_cp_dataset,
        )

        # one merged COCO train+val store shared by both CP splits (each
        # split otherwise re-merges its own copy — 2x resident RAM)
        cp_base = load_vqa_cp_base(
            cfg.data_folder, cfg.adaptive, store_rts or cfg.relation_type
        )
        val = load_vqa_cp_dataset(
            "test", dictionary, cfg.relation_type, cfg.data_folder,
            cfg.adaptive, store_relation_types=store_rts, base=cp_base,
        )
        train = None
        if cfg.mode == "train":
            train = load_vqa_cp_dataset(
                "train", dictionary, cfg.relation_type, cfg.data_folder,
                cfg.adaptive, base=cp_base,
            )
        del cp_base
    else:
        # --mode predict targets the (possibly answerless) predict_split;
        # every other mode evaluates on val (reference main.py:115).
        val_split = cfg.predict_split if cfg.mode == "predict" else "val"
        val = load_vqa_dataset(
            val_split, dictionary, cfg.relation_type, cfg.data_folder,
            cfg.adaptive, cfg.mmap_features, store_relation_types=store_rts,
        )
        train = None
        if cfg.mode == "train":
            train = load_vqa_dataset(
                "train", dictionary, cfg.relation_type, cfg.data_folder,
                cfg.adaptive, cfg.mmap_features,
            )
            if cfg.use_both:
                from tf_vqa_regat_tpu.data.compose import concat_datasets

                train = concat_datasets(train, val, "trainval")
            if cfg.use_vg:
                import pickle as _pickle

                from tf_vqa_regat_tpu.data.compose import (
                    append_entries,
                    load_visual_genome_entries,
                )
                from tf_vqa_regat_tpu.data.features import load_imgid2idx

                with open(
                    os.path.join(cfg.data_folder, "cache", "trainval_ans2label.pkl"),
                    "rb",
                ) as fh:
                    ans2label = _pickle.load(fh)
                img_id2idx = load_imgid2idx(cfg.data_folder, "train", cfg.adaptive)
                if cfg.use_both:
                    val_map = load_imgid2idx(cfg.data_folder, "val", cfg.adaptive)
                    offset = (
                        train.store.pos_boxes.shape[0] - len(val_map)
                        if cfg.adaptive
                        else train.store.features.shape[0] - len(val_map)
                    )
                    for k, v in val_map.items():
                        img_id2idx.setdefault(k, v + offset)
                vg = load_visual_genome_entries(
                    cfg.data_folder, dictionary, ans2label, img_id2idx
                )
                train = append_entries(train, vg, train.name + "+vg")
    tfidf = weights = None
    if cfg.tfidf and cfg.mode == "train":
        # Train-only, like the reference (main.py:122,136): the result feeds
        # only the embedding INIT, every model is sized by the pre-extension
        # ntoken snapshot (SURVEY §3.5; test_ntoken_snapshot_*), and serve's
        # _encode remap makes the extension a no-op for inference — running
        # it in eval/predict/serve burned minutes tokenizing ~1.1M questions
        # and required train-side files eval-only data folders lack
        # (review finding). Extends the dictionary as a side effect — must
        # run before GloVe row extraction.
        tfidf, weights = tfidf_from_questions(
            ["train", "val", "test2015"], dictionary, cfg.data_folder
        )
    return train, val, tfidf, weights


def _load_eval_params(cfg: Config, val_ds):
    """Restore params for an inference-only mode (eval/predict/serve):
    an orbax dir from training, or a reference-trained keras .h5
    (train/h5_import.py). Raises without --checkpoint."""
    if not cfg.checkpoint:
        raise ValueError(
            f"--mode {cfg.mode} needs --checkpoint (an orbax dir from "
            "training or a reference-trained .h5)"
        )
    ntoken = val_ds.ntoken
    if cfg.checkpoint.endswith(".h5"):
        from tf_vqa_regat_tpu.train.h5_import import import_reference_h5

        return import_reference_h5(
            cfg.checkpoint, cfg, ntoken, val_ds.v_dim, val_ds.num_ans
        )
    # shapes only: load_params reduces the template to ShapeDtypeStructs, so
    # materializing a full random init (orthogonal QR on the GRU kernels,
    # ~10^7 draws) was pure waste (review finding)
    abstract = jax.eval_shape(
        lambda: init_regat(
            jax.random.PRNGKey(cfg.seed), cfg, ntoken, val_ds.v_dim, val_ds.num_ans
        )
    )
    return ckpt.load_params(cfg.checkpoint, abstract)


def main(argv=None) -> None:
    cfg = parse_with_config(argv)
    # The environment startup hook can pin jax_platforms to the TPU plugin;
    # restore the standard JAX_PLATFORMS contract so CPU dev runs work.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if cfg.prng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    # Persistent compilation cache (flagship programs compile in ~90s through
    # the remote helper; reruns reuse them).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    from tf_vqa_regat_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()
    print(f"devices: {jax.devices()}")
    np.random.seed(cfg.seed)
    os.environ["PYTHONHASHSEED"] = str(cfg.seed)

    train_ds, val_ds, tfidf, tfidf_weights = build_datasets(cfg)

    if cfg.mode == "train":
        ds = train_ds
        # snapshotted at tokenization time — NOT dictionary.ntoken, which the
        # TF-IDF init has since extended (VQADataset.ntoken docstring)
        ntoken = ds.ntoken
        params = init_regat(
            jax.random.PRNGKey(cfg.seed), cfg, ntoken, ds.v_dim, ds.num_ans
        )
        emb2_trainable = False
        if not cfg.synthetic:
            glove = np.load(
                os.path.join(cfg.data_folder, "glove", "glove6b_init_300d.npy")
            ).squeeze()
            params["w_emb"], emb2_trainable = word_embedding_load_glove(
                params["w_emb"], glove, cfg.op, tfidf, tfidf_weights
            )
        from tf_vqa_regat_tpu.train.loop import Preempted

        try:
            final_params, best = run_training(
                cfg, train_ds, val_ds, init_params=params, emb2_trainable=emb2_trainable
            )
        except Preempted as e:
            # SIGTERM (TPU preemption): state is checkpointed; the final
            # pretrained artifact is NOT written (training is unfinished).
            print(
                f"preempted at {e} — checkpoint saved; rerun the same "
                f"command with --resume to continue"
            )
            return
        path = ckpt.save_params_only(
            cfg.output, cfg.relation_type, cfg.fusion, final_params
        )
        print(f"saved final model to {path} (best eval score {best:.4f})")

    elif cfg.mode == "eval":
        params = _load_eval_params(cfg, val_ds)
        logger = Logger(os.path.join(cfg.output, "eval_log.txt"))
        # Same data-path selection as training (device store / roi buckets /
        # host streaming) — see train/loop.py::run_evaluation.
        score, loss, elapsed = run_evaluation(cfg, val_ds, params, logger)
        logger.write(f"Final eval score: {score:.4f} (eval loss {loss:.5f})")

    elif cfg.mode == "predict":
        # VQA submission file (question_id -> answer string) for answerless
        # test splits — see train/loop.py::run_prediction.
        params = _load_eval_params(cfg, val_ds)
        from tf_vqa_regat_tpu.train.loop import run_prediction

        logger = Logger(os.path.join(cfg.output, "predict_log.txt"))
        path = run_prediction(cfg, val_ds, params, logger)
        print(f"predictions: {path}")

    elif cfg.mode == "serve":
        # HTTP answer service over a checkpoint (tf_vqa_regat_tpu/serve.py):
        # pre-compiled micro-batched inference, features resident in HBM.
        params = _load_eval_params(cfg, val_ds)
        from tf_vqa_regat_tpu.serve import run_server

        run_server(cfg, val_ds, params, Logger(os.path.join(cfg.output, "serve_log.txt")))

    elif cfg.mode == "export_h5":
        # Two-way migration: write an orbax-trained model as a
        # reference-loadable keras .h5 (train/h5_export.py).
        if not cfg.checkpoint:
            raise ValueError("--mode export_h5 needs --checkpoint (an orbax dir)")
        ntoken = val_ds.ntoken
        abstract = jax.eval_shape(  # shapes only (see _load_eval_params)
            lambda: init_regat(
                jax.random.PRNGKey(cfg.seed), cfg, ntoken, val_ds.v_dim,
                val_ds.num_ans,
            )
        )
        params = ckpt.load_params(cfg.checkpoint, abstract)
        from tf_vqa_regat_tpu.train.h5_export import export_reference_h5

        os.makedirs(cfg.output, exist_ok=True)
        path = os.path.join(
            cfg.output, f"{cfg.relation_type}-{cfg.fusion}-pretrained_model.h5"
        )
        export_reference_h5(params, path, cfg, ntoken, val_ds.v_dim, val_ds.num_ans)
        print(f"exported reference-loadable weights to {path}")

    elif cfg.mode == "ensemble_eval":
        from tf_vqa_regat_tpu.train.ensemble import run_ensemble_eval

        mesh = make_mesh(cfg.dp_size, cfg.tp_size)
        logger = Logger(os.path.join(cfg.output, "eval_log.txt"))
        score = run_ensemble_eval(cfg, val_ds, mesh, resolve_impl(cfg), logger)
        logger.write(f"Final ensemble eval score: {score:.4f}")
    else:
        raise ValueError(f"unknown mode {cfg.mode!r}")


if __name__ == "__main__":
    main()
