"""Seeded epoch-ordering RNG streams — the single definition site.

These formulas are PARITY-CRITICAL: the host loader (loader.py) and the
device store (device_store.py) must draw the *identical* epoch permutation
for the host-vs-device batch parity tests and for the mid-epoch-resume
contract ("skip N batches" reproduces the uninterrupted epoch only if the
order re-derives identically — train/checkpoint.py run_sig). They used to
be duplicated at each call site (round-3 review finding); any edit here
changes the data order of every path at once, never one of a parity pair —
and must bump ORDER_VERSION, which the mid-epoch resume guard pins.

Stream disjointness: each stream KIND owns a 2^28-wide seed band; epoch,
shard, and bucket index within the band (epoch < 2^15, shard < 2^10,
bucket < 2^3 — far above real topologies). The previous affine formulas
collided across kinds (e.g. batch_shuffle(seed, 0) == epoch_perm(seed, 7)
and shard_perm(seed, 0, s) == epoch_perm(seed, s)), seeding "distinct"
streams identically within one run (review finding).

The reference shuffles via tf.data with an unseeded buffer (no resumable
order at all); seeded fold-in streams are this framework's replacement
(SURVEY §2.1-D8).
"""

from __future__ import annotations

import numpy as np

# Bump on ANY formula change: a step checkpoint's mid-epoch skip is only
# exact when the saved epoch order re-derives identically, so the run
# signature records this and the resume guard refuses a mismatch.
ORDER_VERSION = 2

_M = 2**31
_SEED_MULT = 100003  # spreads nearby seeds apart before the stream fold-in
_BAND = 2**28  # per-kind seed band


def _rs(seed: int, kind: int, epoch: int, shard: int = 0, bucket: int = 0):
    return np.random.RandomState(
        (seed * _SEED_MULT + kind * _BAND + epoch * 2**13 + shard * 2**3 + bucket)
        % _M
    )


def epoch_perm_rng(seed: int, epoch: int) -> np.random.RandomState:
    """The epoch's entry-permutation stream — host loader AND replicated
    device store (the parity-critical pair)."""
    return _rs(seed, 0, epoch)


def batch_shuffle_rng(seed: int, epoch: int) -> np.random.RandomState:
    """Batch-order shuffle across roi buckets (distinct from the entry
    permutation so bucketed and unbucketed epochs don't correlate)."""
    return _rs(seed, 1, epoch)


def shard_perm_rng(seed: int, epoch: int, shard: int) -> np.random.RandomState:
    """Per-shard entry permutation (sharded store: each data shard draws
    over its OWN local entry set — this is why a mid-epoch resume pins
    data_mode and dp in the run signature)."""
    return _rs(seed, 2, epoch, shard)


def shard_bucket_perm_rng(
    seed: int, epoch: int, shard: int, bucket: int
) -> np.random.RandomState:
    """Per-shard, per-bucket entry permutation (sharded + roi buckets)."""
    return _rs(seed, 3, epoch, shard, bucket)
