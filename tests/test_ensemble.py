"""Ensemble eval: member parsing and probability averaging semantics."""

import jax
import jax.numpy as jnp
import pytest

from tf_vqa_regat_tpu.train.ensemble import parse_members


def test_parse_members():
    m = parse_members("implicit:/a/b,spatial:/c/d, semantic:/e")
    assert m == [("implicit", "/a/b"), ("spatial", "/c/d"), ("semantic", "/e")]


def test_parse_members_rejects_unknown():
    with pytest.raises(ValueError):
        parse_members("bogus:/a")
    with pytest.raises(ValueError):
        parse_members("")


def test_probability_averaging_changes_argmax():
    """Averaging sigmoid probs (not logits) is the ensemble contract: a
    member that is confidently wrong is outvoted by two mildly right ones."""
    l1 = jnp.asarray([[10.0, 0.0]])  # confident answer 0
    l2 = jnp.asarray([[0.0, 2.0]])
    l3 = jnp.asarray([[0.0, 2.0]])
    probs = sum(jax.nn.sigmoid(l) for l in (l1, l2, l3)) / 3
    assert int(jnp.argmax(probs)) == 1


def test_device_ensemble_matches_host_ensemble(tmp_path):
    """The fused device-store ensemble program (one jitted scan gathering
    every member from shared feature tables) must reproduce the host-streaming
    ensemble score exactly — including adjacency handling (semantic member
    gets the HDF5 label table, implicit gets none) and the padded tail."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.models.regat import init_regat
    from tf_vqa_regat_tpu.parallel.mesh import make_mesh
    from tf_vqa_regat_tpu.train import checkpoint as ckpt
    from tf_vqa_regat_tpu.train.ensemble import run_ensemble_eval
    from tf_vqa_regat_tpu.train.logging import Logger

    ds = synthetic_dataset(
        num_images=8, num_questions=43, v_dim=16, num_ans=7, adaptive=True,
        semantic=True, name="val",
    )
    mesh = make_mesh()
    paths = {}
    base = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", batch_size=16, adaptive=True,
        num_rois=40, eval_block=4,
    )
    for rt in ("implicit", "semantic"):
        params = init_regat(
            jax.random.PRNGKey(hash(rt) % 2**31), base.replace(relation_type=rt),
            ds.ntoken, 16, 7,
        )
        paths[rt] = ckpt.save_params_only(str(tmp_path / rt), rt, "butd", params)

    spec = ",".join(f"{rt}:{p}" for rt, p in paths.items())
    logger = Logger(str(tmp_path / "log.txt"))
    scores = {}
    for mode in ("device", "sharded", "host"):
        cfg = base.replace(
            ensemble_checkpoints=spec, data_mode=mode, mode="ensemble_eval",
        )
        scores[mode] = run_ensemble_eval(cfg, ds, mesh, "jnp", logger)
    assert scores["device"] == pytest.approx(scores["host"], rel=1e-6)
    # sharded path: members share the partitioned base tables; the semantic
    # member's edge labels ride base.sharded_adj_table — same score exactly
    assert scores["sharded"] == pytest.approx(scores["host"], rel=1e-6)
    # each resident path was actually taken (log carries the data= tag)
    log = open(tmp_path / "log.txt").read()
    assert "data=device" in log and "data=sharded" in log and "data=host" in log


def test_real_data_layer_ensemble_with_semantic_member(tmp_path):
    """Round-3 review finding: on the REAL data layer (on-disk fixture), an
    ensemble with a semantic member must work with the default top-level
    --relation_type implicit — the shared store has to load every member's
    adjacency table (store_relation_types, main.py wiring), not just the
    top-level one's. Previously val_ds.store.semantic_adj was None and the
    semantic member trace-failed on a missing adj_label."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.features import load_vqa_dataset
    from tf_vqa_regat_tpu.data.fixtures import make_dictionary, write_fixture
    from tf_vqa_regat_tpu.models.regat import init_regat
    from tf_vqa_regat_tpu.parallel.mesh import make_mesh
    from tf_vqa_regat_tpu.train import checkpoint as ckpt
    from tf_vqa_regat_tpu.train.ensemble import run_ensemble_eval
    from tf_vqa_regat_tpu.train.logging import Logger

    root = str(tmp_path / "fix")
    write_fixture(root, num_images=8, num_questions=32, v_dim=16, num_ans=7,
                  adaptive=True, name="val", seed=5, semantic=True)
    d = make_dictionary()
    # the wiring main.py::build_datasets applies for --mode ensemble_eval
    ds = load_vqa_dataset(
        "val", d, "implicit", root, adaptive=True,
        store_relation_types={"implicit", "semantic"},
    )
    assert ds.relation_type == "implicit"
    assert ds.store.semantic_adj is not None  # the previously-missing table

    base = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, batch_size=16, adaptive=True, num_rois=40,
        eval_batch=16, eval_block=2, data_mode="device",
    )
    paths = {}
    for rt in ("implicit", "semantic"):
        params = init_regat(
            jax.random.PRNGKey(1), base.replace(relation_type=rt),
            ds.ntoken, ds.v_dim, ds.num_ans,
        )
        paths[rt] = ckpt.save_params_only(str(tmp_path / rt), rt, "butd", params)
    cfg = base.replace(
        mode="ensemble_eval",
        ensemble_checkpoints=(
            f"implicit:{paths['implicit']},semantic:{paths['semantic']}"
        ),
    )
    mesh = make_mesh()
    logger = Logger(str(tmp_path / "log.txt"))
    score = run_ensemble_eval(cfg, ds, mesh, "jnp", logger)
    assert 0.0 <= score <= 100.0


def test_ensemble_roi_buckets_rejected_on_host_fallback(tmp_path):
    """--roi_buckets with a host-streaming resolution must raise in
    ensemble_eval exactly like training/eval/predict do — previously the
    ensemble silently evaluated at the single static roi size instead
    (round-3 review finding)."""
    import pytest as _pytest

    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.models.regat import init_regat
    from tf_vqa_regat_tpu.parallel.mesh import make_mesh
    from tf_vqa_regat_tpu.train import checkpoint as ckpt
    from tf_vqa_regat_tpu.train.ensemble import run_ensemble_eval
    from tf_vqa_regat_tpu.train.logging import Logger

    ds = synthetic_dataset(
        num_images=8, num_questions=30, v_dim=16, num_ans=7, adaptive=True,
        name="val",
    )
    base = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        batch_size=16, adaptive=True, num_rois=40,
    )
    params = init_regat(jax.random.PRNGKey(0), base, ds.ntoken, 16, 7)
    path = ckpt.save_params_only(str(tmp_path), "implicit", "butd", params)
    cfg = base.replace(
        ensemble_checkpoints=f"implicit:{path}", mode="ensemble_eval",
        data_mode="host", roi_buckets="16,40",
    )
    with _pytest.raises(ValueError, match="roi_buckets"):
        run_ensemble_eval(cfg, ds, make_mesh(), "jnp", Logger(str(tmp_path / "l.txt")))
