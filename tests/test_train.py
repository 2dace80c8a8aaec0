"""Training runtime: loss/score reduction contract, LR schedule table,
per-tensor clipping, freezing, and a 2-step integration run (loss decreases,
single compilation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_vqa_regat_tpu.train.loss import bce_with_logits_sum, vqa_score_sum
from tf_vqa_regat_tpu.train.optim import (
    clip_per_tensor,
    freeze,
    make_lr_schedule,
    make_optimizer,
)


# ------------------------------------------------------------------------ loss
def test_bce_reduction_matches_reference_contract():
    """Reference: mean over all elements x num_answers == sum over answers,
    mean over batch (train.py:107-108)."""
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 7).astype(np.float32)
    targets = rng.rand(4, 7).astype(np.float32)
    valid = np.ones(4, bool)
    got = float(bce_with_logits_sum(*map(jnp.asarray, (logits, targets, valid))))
    # numpy reference: sigmoid BCE elementwise
    z = 1.0 / (1.0 + np.exp(-logits))
    per = -(targets * np.log(z) + (1 - targets) * np.log(1 - z))
    want = per.mean() * 7
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_ignores_invalid_examples():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 5).astype(np.float32)
    targets = rng.rand(4, 5).astype(np.float32)
    valid = np.array([True, True, False, False])
    got = float(bce_with_logits_sum(*map(jnp.asarray, (logits, targets, valid))))
    want = float(
        bce_with_logits_sum(
            jnp.asarray(logits[:2]), jnp.asarray(targets[:2]), jnp.ones(2, bool)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_vqa_score():
    logits = jnp.asarray([[0.1, 5.0, 0.0], [3.0, 0.0, 0.0]])
    targets = jnp.asarray([[0.0, 0.6, 1.0], [0.9, 0.0, 0.0]])
    valid = jnp.ones(2, bool)
    np.testing.assert_allclose(float(vqa_score_sum(logits, targets, valid)), 1.5)
    valid = jnp.asarray([True, False])
    np.testing.assert_allclose(float(vqa_score_sum(logits, targets, valid)), 0.6)


# -------------------------------------------------------------------- schedule
def test_lr_schedule_matches_reference_table():
    """Warmup [1,1,1.2,1.3,1.4] x base then x0.75 at epochs 5,7,9,...
    (train.py:54-83; confirmed in the notebook log: 9e-4 -> 1.26e-3 then
    x0.75 at 5,7,9,11,13)."""
    base = 9e-4
    spe = 100
    sched = make_lr_schedule(base, spe, lr_decay_rate=0.75, lr_decay_step=2)
    lr = lambda ep: float(sched(jnp.asarray(ep * spe)))
    np.testing.assert_allclose(lr(0), base)
    np.testing.assert_allclose(lr(1), base)
    np.testing.assert_allclose(lr(2), 1.2 * base, rtol=1e-6)
    np.testing.assert_allclose(lr(3), 1.3 * base, rtol=1e-6)
    np.testing.assert_allclose(lr(4), 1.4 * base, rtol=1e-6)
    np.testing.assert_allclose(lr(5), 1.4 * base * 0.75, rtol=1e-6)
    np.testing.assert_allclose(lr(6), 1.4 * base * 0.75, rtol=1e-6)
    np.testing.assert_allclose(lr(7), 1.4 * base * 0.75**2, rtol=1e-6)
    np.testing.assert_allclose(lr(13), 1.4 * base * 0.75**5, rtol=1e-6)
    # mid-epoch steps hold the epoch's LR
    np.testing.assert_allclose(float(sched(jnp.asarray(2 * spe + 50))), 1.2 * base, rtol=1e-6)


# -------------------------------------------------------------------- clipping
def test_per_tensor_clip():
    t = clip_per_tensor(0.25)
    big = jnp.asarray([3.0, 4.0])  # norm 5
    small = jnp.asarray([0.1, 0.0])
    clipped, _ = t.update({"a": big, "b": small}, t.init(None))
    np.testing.assert_allclose(
        np.asarray(clipped["a"]), np.asarray(big) * 0.25 / 5.0, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(clipped["b"]), np.asarray(small))


def test_freeze_zeroes_updates():
    t = freeze({"a": True, "b": False})
    u, _ = t.update({"a": jnp.ones(2), "b": jnp.ones(2)}, t.init(None))
    np.testing.assert_allclose(np.asarray(u["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(u["b"]), 0.0)


def test_adamax_frozen_leaf_stays_constant():
    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    opt = make_optimizer(1e-2, 0.25, 10, 0.75, 2, {"a": True, "b": False})
    state = opt.init(params)
    grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
    import optax

    updates, state = opt.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(jnp.abs(new["a"] - 1.0).max()) > 0
    np.testing.assert_allclose(np.asarray(new["b"]), 1.0)


# ----------------------------------------------------------------- integration
def test_two_step_training_decreases_loss_single_compile():
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.data.loader import BatchLoader
    from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
    from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
    from tf_vqa_regat_tpu.train.step import build_train_step, init_train_state

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, base_lr=5e-3,
    )
    ds = synthetic_dataset(num_images=8, num_questions=64, v_dim=32, num_ans=9)
    ntoken = ds.dictionary.ntoken
    mesh = make_mesh()
    params = init_regat(jax.random.PRNGKey(0), cfg, ntoken, 32, 9)
    mask = trainable_mask(params, False)
    from tf_vqa_regat_tpu.train.optim import make_optimizer as mo

    opt = mo(cfg.base_lr, cfg.grad_clip, 4, 0.75, 2, mask)
    state = init_train_state(params, opt, mesh)
    step = build_train_step(cfg, ntoken, opt, mesh, "jnp", params)
    loader = BatchLoader(ds, 16, 12, shuffle=False)
    rng = jax.random.PRNGKey(1)

    losses = []
    for _ in range(3):
        for batch in loader.epoch(0):
            batch = jax.device_put(batch, batch_sharding(mesh))
            state, m = step(state, batch, rng)
            losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert step._cache_size() == 1  # static shapes -> no recompiles
    assert int(jax.device_get(state["step"])) == len(losses)


def _overfit_run(compute_dtype: str):
    """Shared harness: memorize 16 examples with the full train step; returns
    (first metrics, last metrics, soft-target ceiling)."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.data.loader import BatchLoader
    from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
    from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
    from tf_vqa_regat_tpu.train.optim import make_optimizer
    from tf_vqa_regat_tpu.train.step import build_train_step, init_train_state

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, base_lr=1e-2, dropout=0.0,
        compute_dtype=compute_dtype,
    )
    ds = synthetic_dataset(num_images=4, num_questions=16, v_dim=24, num_ans=9)
    ntoken = ds.dictionary.ntoken
    mesh = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
    params = init_regat(jax.random.PRNGKey(0), cfg, ntoken, 24, 9)
    # large steps_per_epoch keeps the warmup LR constant for the whole test
    opt = make_optimizer(cfg.base_lr, cfg.grad_clip, 10000, 0.75, 2, trainable_mask(params, False))
    state = init_train_state(params, opt, mesh)
    step = build_train_step(cfg, ntoken, opt, mesh, "jnp", params)
    batch = jax.device_put(
        next(iter(BatchLoader(ds, 16, 12, shuffle=False).epoch(0))),
        batch_sharding(mesh),
    )
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(100):
        state, m = step(state, batch, rng)
        if first is None:
            first = jax.device_get(m)
    last = jax.device_get(m)
    # soft-target ceiling: mean over entries of their max score
    ent = ds.entries
    ceil = np.mean(
        [ent.scores[ent.label_offsets[i]:ent.label_offsets[i+1]].max() for i in range(16)]
    )
    return first, last, ceil


def test_overfit_small_dataset():
    """Learning sanity: the full train step memorizes 16 examples — train
    VQA score approaches the soft-target ceiling (reference's acceptance
    signal is the training log's rising score curve, train.ipynb)."""
    first, last, ceil = _overfit_run("float32")
    final_score = last["score"] / last["n"]
    assert last["loss"] < first["loss"] * 0.5, (first["loss"], last["loss"])
    assert final_score > 0.95 * ceil, (final_score, ceil)


def test_overfit_bfloat16_compute():
    """bf16 activations (compute_dtype=bfloat16, params/optimizer f32) must
    still memorize the batch — the training dynamics tolerate bf16 matmul
    rounding (SURVEY §7 / round-1 verdict's bf16 experiment; throughput side
    in PERF_NOTES.md). TPU-only: the XLA:CPU thunk runtime has no
    BF16xBF16=F32 dot, so the CPU suite skips this (the same experiment runs
    on hardware via tools/bf16_experiment.py, results in PERF_NOTES.md)."""
    if jax.default_backend() != "tpu":
        pytest.skip("XLA:CPU lacks BF16 dot support (DotThunk UNIMPLEMENTED)")
    first, last, ceil = _overfit_run("bfloat16")
    final_score = last["score"] / last["n"]
    assert last["loss"] < first["loss"] * 0.5, (first["loss"], last["loss"])
    assert final_score > 0.90 * ceil, (final_score, ceil)


def test_grad_accum_matches_single_pass():
    """cfg.grad_accum=k accumulates k microbatch sum-grads and applies ONE
    optimizer update on the batch-mean gradient — with dropout off this must
    reproduce the single-pass step exactly (params and metrics), including on
    a final partial batch (valid mask) and under a data-sharded mesh."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.data.loader import BatchLoader
    from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
    from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
    from tf_vqa_regat_tpu.train.optim import make_optimizer
    from tf_vqa_regat_tpu.train.step import build_train_step, init_train_state

    base = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, base_lr=5e-3, dropout=0.0, batch_size=32,
    )
    # 48 questions / batch 32 -> second batch is half-padded (valid mask)
    ds = synthetic_dataset(num_images=8, num_questions=48, v_dim=32, num_ans=9)
    ntoken = ds.dictionary.ntoken
    mesh = make_mesh()  # full virtual mesh: microbatch dim stays data-sharded
    rng = jax.random.PRNGKey(1)

    def run(accum):
        cfg = base.replace(grad_accum=accum)
        params = init_regat(jax.random.PRNGKey(0), cfg, ntoken, 32, 9)
        opt = make_optimizer(
            cfg.base_lr, cfg.grad_clip, 4, 0.75, 2, trainable_mask(params, False)
        )
        state = init_train_state(params, opt, mesh)
        step = build_train_step(cfg, ntoken, opt, mesh, "jnp", params)
        loader = BatchLoader(ds, cfg.batch_size, 12, shuffle=False)
        ms = []
        for _ in range(2):
            for batch in loader.epoch(0):
                batch = jax.device_put(batch, batch_sharding(mesh))
                state, m = step(state, batch, rng)
                ms.append(jax.device_get(m))
        return jax.device_get(state["params"]), ms

    # Gradient-level exactness: the accumulated sum-grads / n equal the
    # single-pass batch-mean gradient to fp epsilon (observed ~1e-10).
    from tf_vqa_regat_tpu.models.regat import apply_regat
    from tf_vqa_regat_tpu.train import step as stepmod
    from tf_vqa_regat_tpu.train.loss import bce_with_logits_sum

    params0 = init_regat(jax.random.PRNGKey(0), base, ntoken, 32, 9)
    batch0 = next(iter(BatchLoader(ds, 32, 12, shuffle=False).epoch(0)))
    batch0 = {k: jnp.asarray(v) for k, v in batch0.items()}

    def loss_fn(p):
        logits = apply_regat(
            p, base, batch0, ntoken, train=True, rng=rng, impl="jnp"
        )
        return bce_with_logits_sum(logits, batch0["target"], batch0["valid"])

    g_direct = jax.grad(loss_fn)(params0)
    g_accum, m_accum = stepmod._accum_grads(
        params0, batch0, rng, base, ntoken, "jnp", None, 2
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7),
        g_direct, g_accum,
    )
    np.testing.assert_allclose(float(m_accum["loss"]), float(loss_fn(params0)), rtol=1e-6)

    # Trajectory: losses/scores/params track across full steps. Params get a
    # small atol: bias leaves whose gradient nearly cancels (~1e-12) take
    # sign-noise Adamax updates (m/u of fp noise), so bitwise equality is not
    # the contract there — semantic divergence would show at 1e-2+ scale.
    p1, m1 = run(1)
    p2, m2 = run(2)
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=2e-5)
        np.testing.assert_allclose(a["n"], b["n"])
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-4),
        p1, p2,
    )


def test_grad_accum_divisibility_validated():
    """run_training rejects batch sizes not divisible by grad_accum*dp."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.train.loop import run_training

    ds = synthetic_dataset(num_images=4, num_questions=16, v_dim=16, num_ans=5)
    cfg = Config(
        num_hid=16, relation_dim=24, num_heads=2, nongt_dim=4,
        imp_pos_emb_dim=8, fusion="butd", batch_size=24, grad_accum=5,
        epochs=1,
    )
    with pytest.raises(ValueError, match="grad_accum"):
        run_training(cfg, ds, ds)


@pytest.mark.parametrize("fusion", ["butd", "ban", "mutan"])
def test_train_step_all_fusions(fusion):
    """Gradients flow and params update for every fusion family (BAN/MuTAN
    are net-new — their backward paths need coverage, not just forwards)."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.data.loader import BatchLoader
    from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
    from tf_vqa_regat_tpu.parallel.mesh import batch_sharding, make_mesh
    from tf_vqa_regat_tpu.train.step import build_train_step, init_train_state

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion=fusion, relation_type="implicit",
        residual_connection=True, base_lr=1e-3, ban_glimpse=2,
        mutan_rank=3, mutan_gamma=2,
    )
    ds = synthetic_dataset(num_images=4, num_questions=16, v_dim=24, num_ans=9)
    ntoken = ds.dictionary.ntoken
    mesh = make_mesh(dp_size=1, tp_size=1, devices=jax.devices()[:1])
    params = init_regat(jax.random.PRNGKey(0), cfg, ntoken, 24, 9)
    opt = make_optimizer(cfg.base_lr, cfg.grad_clip, 1000, 0.75, 2,
                         trainable_mask(params, False))
    state = init_train_state(params, opt, mesh)
    step = build_train_step(cfg, ntoken, opt, mesh, "jnp", params)
    batch = jax.device_put(
        next(iter(BatchLoader(ds, 16, 12, shuffle=False).epoch(0))),
        batch_sharding(mesh),
    )
    losses = []
    for _ in range(15):  # mutan's Tucker blocks need a few steps to settle
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses  # learning signal reaches the params
    # fusion params actually moved
    before = init_regat(jax.random.PRNGKey(0), cfg, ntoken, 24, 9)["joint_emb"]
    after = jax.device_get(state["params"])["joint_emb"]
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
                     before, after),
    )
    assert moved > 1e-6


def test_run_evaluation_device_store_and_buckets_match_host(tmp_path):
    """`--mode eval` routes through the same data-path selection as training
    (round-1 verdict: the device-store eval throughput must be reachable from
    the public CLI). Host streaming, device-store gather, and roi-bucketed
    device eval must all produce the same score/loss on the same params —
    the model is padding-invariant, so static R=128 padding and homogeneous
    16/32/64/128 buckets are equivalent views of the same data."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.models.regat import init_regat
    from tf_vqa_regat_tpu.train.logging import Logger
    from tf_vqa_regat_tpu.train.loop import run_evaluation

    ds = synthetic_dataset(num_images=8, num_questions=50, v_dim=24, num_ans=9)
    base = dict(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, batch_size=32, num_rois=128,
    )
    params = init_regat(
        jax.random.PRNGKey(0), Config(**base), ds.ntoken, 24, 9
    )
    logger = Logger(str(tmp_path / "eval_log.txt"))
    s_host, l_host, _ = run_evaluation(
        Config(**base, data_mode="host"), ds, params, logger
    )
    s_dev, l_dev, _ = run_evaluation(
        Config(**base, data_mode="device"), ds, params, logger
    )
    s_bkt, l_bkt, _ = run_evaluation(
        Config(**base, data_mode="device", roi_buckets="16,32,64,128"),
        ds, params, logger,
    )
    np.testing.assert_allclose(s_dev, s_host, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(l_dev, l_host, rtol=1e-4)
    np.testing.assert_allclose(s_bkt, s_host, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(l_bkt, l_host, rtol=1e-4)
    # the bucket guard still fires for non-device modes
    with pytest.raises(ValueError, match="roi_buckets"):
        run_evaluation(
            Config(**base, data_mode="host", roi_buckets="16,32"),
            ds, params, logger,
        )


def test_run_prediction_device_and_host_match_direct_argmax(tmp_path):
    """--mode predict machinery: the submission JSON must contain every
    question exactly once with the argmax answer string, identically on the
    device-store and host-streaming paths (including answerless entries)."""
    import json

    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.data.loader import BatchLoader
    from tf_vqa_regat_tpu.models.regat import apply_regat, init_regat
    from tf_vqa_regat_tpu.train.logging import Logger
    from tf_vqa_regat_tpu.train.loop import run_prediction

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        batch_size=16, adaptive=True, num_rois=40, eval_block=3,
        output=str(tmp_path),
    )
    ds = synthetic_dataset(num_images=8, num_questions=37, v_dim=16, num_ans=7)
    # answerless split: predict must not touch targets
    ds.entries.has_answers = False
    params = init_regat(jax.random.PRNGKey(0), cfg, ds.ntoken, 16, 7)

    # direct argmax oracle over the host loader (entry order)
    want = {}
    pos = 0
    for batch in BatchLoader(ds, 16, 40, shuffle=False).epoch(0):
        logits = apply_regat(
            params, cfg, {k: jnp.asarray(v) for k, v in batch.items()},
            ds.ntoken, train=False,
        )
        lab = np.asarray(jnp.argmax(logits, axis=-1))
        for i in range(min(16, 37 - pos)):
            want[int(ds.entries.question_ids[pos + i])] = ds.label2ans[lab[i]]
        pos += 16

    for mode in ("device", "sharded", "host"):
        path = run_prediction(
            cfg.replace(data_mode=mode), ds, params, Logger(str(tmp_path / "l.txt"))
        )
        got = {d["question_id"]: d["answer"] for d in json.load(open(path))}
        assert got == want, mode


def test_lr_banner_matches_reference_log_contract(tmp_path):
    """The per-epoch LR banner follows reference train.py:66-77 exactly: a
    'Reducing Learning Rate from X to Y' line at EVERY warmup epoch (0-4 —
    including epochs 0/1 where X == Y) and at each decay epoch (5, 5+step,
    ...), and NO line at non-decay epochs past warmup (round-3 review
    finding: the loop previously suppressed unchanged transitions and worded
    the first epoch differently)."""
    import re

    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.train.loop import run_training

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        residual_connection=True, epochs=8, batch_size=16, print_freq=0,
        lr_decay_step=2, base_lr=2e-3, output=str(tmp_path) + "/",
        save_every_epoch=False, num_rois=24,
    )
    train = synthetic_dataset(num_images=8, num_questions=32, v_dim=16, num_ans=7)
    val = synthetic_dataset(num_images=4, num_questions=16, v_dim=16, num_ans=7, seed=1)
    run_training(cfg, train, val)

    log = open(tmp_path / "log.txt").read()
    lines = re.findall(
        r"Epoch: (\d+)\. Reducing Learning Rate from (\S+) to (\S+)", log
    )
    got = [(int(e), float(a), float(b)) for e, a, b in lines]
    b, r = cfg.base_lr, cfg.lr_decay_rate
    want = [
        (0, b, b), (1, b, b), (2, b, 1.2 * b), (3, 1.2 * b, 1.3 * b),
        (4, 1.3 * b, 1.4 * b),                  # warmup: every epoch logs
        (5, 1.4 * b, 1.4 * b * r),              # decay epochs: 5, 5+step
        (7, 1.4 * b * r, 1.4 * b * r**2),       # epoch 6 logs nothing
    ]
    assert [e for e, _, _ in got] == [e for e, _, _ in want]
    for (ge, ga, gb), (we, wa, wb) in zip(got, want):
        np.testing.assert_allclose(ga, wa, rtol=1e-5, err_msg=f"epoch {we} from")
        np.testing.assert_allclose(gb, wb, rtol=1e-5, err_msg=f"epoch {we} to")


# ------------------------------------------------------------- blocked train
def test_train_block_matches_per_step():
    """build_store_train_block (one lax.scan program carrying the donated
    state through K steps, tail padded with -1 batches a lax.cond skips)
    must reproduce the per-step program's training exactly on the same
    batch order: same final params, same step counter (padded tail batches
    advance nothing), same accumulated metrics."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.device_store import DeviceStore
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.models.regat import init_regat, trainable_mask
    from tf_vqa_regat_tpu.parallel.mesh import make_mesh
    from tf_vqa_regat_tpu.train.loop import _block_batches_counted
    from tf_vqa_regat_tpu.train.step import (
        build_store_train_block,
        build_store_train_step,
        init_train_state,
    )

    cfg = Config(
        num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
        batch_size=8, adaptive=True, num_rois=40, base_lr=5e-3, dropout=0.2,
    )
    ds = synthetic_dataset(num_images=8, num_questions=56, v_dim=24, num_ans=7)
    store = DeviceStore(ds)
    mesh = make_mesh()
    params = init_regat(jax.random.PRNGKey(0), cfg, ds.ntoken, 24, 7)
    mask = trainable_mask(params, False)
    opt = make_optimizer(cfg.base_lr, cfg.grad_clip, 7, 0.75, 2, mask)
    rng = jax.random.PRNGKey(1)

    batches = list(store.epoch_indices(0, 8, shuffle=False, seed=0))
    assert len(batches) == 7  # K=4 -> one full block + a 3-real tail block

    step = build_store_train_step(
        cfg, ds.ntoken, opt, mesh, "jnp", params, 7, store.padding_idx
    )
    s1 = init_train_state(params, opt, mesh)
    want = {"loss_sum": 0.0, "score": 0.0, "n": 0.0}
    for idx in batches:
        s1, m = step(s1, store.arrays, jnp.asarray(idx), rng)
        m = jax.device_get(m)
        want["loss_sum"] += float(m["loss"]) * float(m["n"])
        want["score"] += float(m["score"])
        want["n"] += float(m["n"])

    K = 4
    blocked = build_store_train_block(
        cfg, ds.ntoken, opt, mesh, "jnp", params, 7, store.padding_idx, K
    )
    # params were donated by the per-step chain: re-init from fresh leaves
    params2 = init_regat(jax.random.PRNGKey(0), cfg, ds.ntoken, 24, 7)
    s2 = init_train_state(params2, opt, mesh)
    got = {"loss_sum": 0.0, "score": 0.0, "n": 0.0}
    items = list(_block_batches_counted(((40, b) for b in batches), K, 8))
    assert [n for _, _, n in items] == [4, 3]
    for _, blk, nreal in items:
        s2, m = blocked(s2, store.arrays, jnp.asarray(blk), rng)
        m = jax.device_get(m)
        got["loss_sum"] += float(m["loss_sum"])
        got["score"] += float(m["score"])
        got["n"] += float(m["n"])

    assert int(jax.device_get(s1["step"])) == 7
    assert int(jax.device_get(s2["step"])) == 7  # padded tail advanced nothing
    assert got["n"] == want["n"] == 56
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-6)
    np.testing.assert_allclose(got["loss_sum"], want["loss_sum"], rtol=1e-5)
    for (p1, p2) in zip(
        jax.tree_util.tree_leaves(s1["params"]),
        jax.tree_util.tree_leaves(s2["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=2e-6, atol=2e-7
        )


@pytest.mark.parametrize("data_mode", ["device", "sharded"])
def test_run_training_train_block_matches_per_step(tmp_path, data_mode):
    """Loop-level: --train_block reproduces per-step training end to end
    (single roi size, so blocking preserves the epoch order exactly) — same
    per-epoch train/eval metrics in metrics.jsonl, including the partial
    tail dispatch's step accounting. Parametrized over BOTH store modes:
    the sharded variant exercises build_sharded_store_train_block's
    lax.cond-around-shard_map-gather tail skip, which device-only coverage
    left invisible (round-3 advisor finding)."""
    import json

    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.data.fixtures import synthetic_dataset
    from tf_vqa_regat_tpu.train.loop import run_training

    train = synthetic_dataset(num_images=8, num_questions=56, v_dim=16, num_ans=7)
    val = synthetic_dataset(num_images=4, num_questions=16, v_dim=16, num_ans=7, seed=1)

    def run(sub, K):
        cfg = Config(
            num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
            imp_pos_emb_dim=16, fusion="butd", relation_type="implicit",
            residual_connection=True, epochs=2, batch_size=16, print_freq=2,
            base_lr=2e-3, output=str(tmp_path / sub) + "/",
            save_every_epoch=False, num_rois=24, train_block=K,
            data_mode=data_mode,
        )
        run_training(cfg, train, val)
        return [
            json.loads(l)
            for l in open(tmp_path / sub / "metrics.jsonl")
        ]

    per_step = run("per_step", 1)  # 1 forces per-step (0 = auto-blocked)
    # 56 q / batch 16 = 4 steps; K=3 -> a full block + a 1-real tail block
    blocked = run("blocked", 3)
    assert len(per_step) == len(blocked) == 2
    for a, b in zip(per_step, blocked):
        for k in ("train_loss", "train_score", "eval_score", "eval_loss"):
            np.testing.assert_allclose(a[k], b[k], rtol=2e-5, err_msg=k)


def test_resolve_train_block_auto_semantics():
    """--train_block 0 = auto: AUTO_TRAIN_BLOCK on the device/sharded
    stores, per-step on the host path; explicit values pass through. The
    resume run signature records the EFFECTIVE K (an auto run and an
    explicit --train_block 8 run have identical epoch order and must be
    mutually resumable; a host-mode auto run stays per-step-compatible)."""
    from tf_vqa_regat_tpu.config import Config
    from tf_vqa_regat_tpu.train.loop import (
        AUTO_TRAIN_BLOCK,
        _run_signature,
        resolve_train_block,
    )

    auto = Config()
    assert resolve_train_block(auto, "device") == AUTO_TRAIN_BLOCK
    assert resolve_train_block(auto, "sharded") == AUTO_TRAIN_BLOCK
    assert resolve_train_block(auto, "host") == 1
    assert resolve_train_block(Config(train_block=1), "device") == 1
    assert resolve_train_block(Config(train_block=4), "sharded") == 4

    explicit = Config(train_block=AUTO_TRAIN_BLOCK)
    assert (
        _run_signature(auto, 4, "device", 1)["train_block"]
        == _run_signature(explicit, 4, "device", 1)["train_block"]
        == AUTO_TRAIN_BLOCK
    )
    assert _run_signature(auto, 4, "host", 1)["train_block"] == 1
