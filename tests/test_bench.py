"""Unit tests for bench.py's host-side helpers.

bench.py's measured numbers need the real TPU (PERF_NOTES.md), but the
arithmetic behind the reported MFU pair and the init watchdog are pure
host code — pinned here so a refactor cannot silently change what the
driver's BENCH_r*.json reports. bench.py imports side-effect-free (its
jax config updates live in main()), so importing it here does not mutate
the test process's PRNG/cache configuration.
"""

import io
import sys
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench():
    import bench as bench_mod

    return bench_mod


def test_import_has_no_jax_config_side_effects(bench):
    import jax

    # the rbg/default cache-dir updates must NOT have run at import time
    assert jax.config.jax_default_prng_impl != "rbg"


def test_useful_epoch_flops_exact_on_linear_program_flops(bench):
    """Program FLOPs are linear in the static roi size R (measured <0.3%
    residual — bench.py docstring); on exactly-linear inputs the fit must
    recover the per-example charge (a + b*nbox)/batch in closed form."""
    a, b, batch = 3e9, 2e8, 256
    flops_by_R = {R: a + b * R for R in (36, 64, 100)}
    nbox = np.asarray([10, 36, 64, 100], np.int32)
    got = bench._useful_epoch_flops(flops_by_R, nbox, batch)
    want = (a * len(nbox) + b * float(nbox.sum())) / batch
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_useful_epoch_flops_clamps_nbox_to_largest_bucket(bench):
    """Images with more boxes than the largest bucket truncate to it in the
    real pipeline (roi-bucket clamp), so they must be charged at the clamp,
    not their raw box count."""
    flops_by_R = {R: 1e9 * R for R in (36, 100)}
    over = bench._useful_epoch_flops(flops_by_R, np.asarray([150]), 1)
    at_max = bench._useful_epoch_flops(flops_by_R, np.asarray([100]), 1)
    np.testing.assert_allclose(over, at_max, rtol=1e-12)


def test_baseline_aggregate_is_epoch_weighted(bench):
    """The vs_baseline denominator: epoch-weighted harmonic combination of
    the reference's train/eval q/s over the real split sizes (BASELINE.md),
    NOT a plain average — a regression here rescales every round's
    headline."""
    total = bench.REF_TRAIN_Q + bench.REF_VAL_Q
    seconds = (
        bench.REF_TRAIN_Q / bench.BASELINE_TRAIN_QPS
        + bench.REF_VAL_Q / bench.BASELINE_EVAL_QPS
    )
    np.testing.assert_allclose(bench.BASELINE_AGG_QPS, total / seconds)
    assert 500.0 < bench.BASELINE_AGG_QPS < 700.0  # between the components


def test_backend_init_watchdog_heartbeat_and_silence(bench):
    """Pending init prints a heartbeat per interval to stderr; a completed
    init stays silent. stdout (the one-JSON-line contract) is untouched."""
    err, out = io.StringIO(), io.StringIO()
    real_err, real_out = sys.stderr, sys.stdout
    sys.stderr, sys.stdout = err, out
    try:
        done = bench._backend_init_watchdog(interval_s=0.1)
        time.sleep(0.28)
        done.set()
        time.sleep(0.15)
        quiet = bench._backend_init_watchdog(interval_s=0.1)
        quiet.set()  # init "returned" immediately
        time.sleep(0.25)
    finally:
        sys.stderr, sys.stdout = real_err, real_out
    assert err.getvalue().count("still pending") == 2, err.getvalue()
    assert out.getvalue() == ""


def test_useful_epoch_flops_quadratic_fit_exact(bench):
    """Explicit relations' programs carry O(R^2) adjacency terms; deg=2
    interpolates the three bucket points exactly for any <=quadratic
    program, so the per-example charge must be recovered in closed form."""
    a, b, c, batch = 3e9, 2e8, 5e5, 256
    flops_by_R = {R: a + b * R + c * R * R for R in (36, 64, 100)}
    nbox = np.asarray([36, 64, 100], np.int32)  # at the knots: fit-exact
    got = bench._useful_epoch_flops(flops_by_R, nbox, batch, deg=2)
    want = sum(a + b * n + c * n * n for n in nbox.tolist()) / batch
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_variant_cfgs_match_the_baseline_config_matrix(bench):
    """--variant deltas must mirror configs/*.json (themselves pinned against
    the reference flag surface by test_config.py): same fusion/relation/
    label-bias switches at flagship dims."""
    flag = bench.variant_cfg("flagship")
    assert flag == bench.flagship_cfg()
    spa = bench.variant_cfg("spatial")
    assert (spa.relation_type, spa.label_bias, spa.spa_label_num) == (
        "spatial", True, 11)
    sem = bench.variant_cfg("semantic")
    assert (sem.relation_type, sem.label_bias, sem.sem_label_num) == (
        "semantic", True, 15)
    ban = bench.variant_cfg("ban")
    assert (ban.fusion, ban.ban_glimpse, ban.relation_type) == (
        "ban", 4, "implicit")
    mutan = bench.variant_cfg("mutan")
    assert (mutan.fusion, mutan.mutan_gamma, mutan.mutan_rank) == (
        "mutan", 2, 15)
    # every non-flagship single-model variant keeps the flagship dims
    for name in ("spatial", "semantic", "ban", "mutan"):
        v = bench.variant_cfg(name)
        assert (v.num_hid, v.relation_dim, v.num_heads, v.batch_size) == (
            768, 1024, 16, 256)


def test_variant_bench_paths_smoke(bench, monkeypatch):
    """End-to-end plumbing of the --variant matrix at tiny dims on the CPU
    mesh, limited to the two code paths only the bench exercises — the
    semantic store-adjacency gather inside _model_bench and the fused
    3-member _ensemble_bench — so an API drift fails here in ~a minute, not
    10 minutes into a TPU session. (BAN/MuTAN/spatial reuse exactly this
    plumbing with a different Config; their model math is covered by
    test_model/test_parallel.) Timings are meaningless on CPU; only the
    result-shape contract is checked."""
    import jax

    from tf_vqa_regat_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(bench, "BATCH", 16)
    monkeypatch.setattr(bench, "NTOKEN", 32)  # > fixtures vocab (24)
    monkeypatch.setattr(bench, "NUM_ANS", 9)
    monkeypatch.setattr(bench, "V_DIM", 32)
    monkeypatch.setattr(bench, "BUCKETS", [16])
    monkeypatch.setattr(bench, "EVAL_BLOCK", 2)
    monkeypatch.setattr(bench, "TRAIN_BLOCK", 2)
    monkeypatch.setattr(bench, "BENCH_QUESTIONS", 64)
    monkeypatch.setattr(bench, "BENCH_IMAGES", 8)
    tiny = bench.flagship_cfg().replace(
        batch_size=16, num_hid=32, relation_dim=48, num_heads=4, nongt_dim=6,
        imp_pos_emb_dim=16, compute_dtype="float32",
    )
    monkeypatch.setattr(bench, "flagship_cfg", lambda: tiny)

    class Args:
        repeats = 1

    mesh = make_mesh(dp_size=8, tp_size=1)
    r = bench._model_bench(Args(), "semantic", mesh)
    assert r["detail"]["variant"] == "semantic"
    assert "[semantic]" in r["metric"]
    assert r["value"] > 0 and np.isfinite(r["detail"]["train_mfu_useful"])
    r = bench._ensemble_bench(Args(), mesh)
    assert r["detail"]["members"] == ["implicit", "spatial", "semantic"]
    assert r["value"] > 0 and np.isfinite(r["detail"]["eval_mfu_useful"])
    jax.clear_caches()
