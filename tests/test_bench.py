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
