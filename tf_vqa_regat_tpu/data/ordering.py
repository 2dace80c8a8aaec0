"""Seeded epoch-ordering RNG streams — the single definition site.

These formulas are PARITY-CRITICAL: the host loader (loader.py) and the
device store (device_store.py) must draw the *identical* epoch permutation
for the host-vs-device batch parity tests and for the mid-epoch-resume
contract ("skip N batches" reproduces the uninterrupted epoch only if the
order re-derives identically — train/checkpoint.py run_sig). They used to
be duplicated at each call site (round-3 review finding); any edit here
changes the data order of every path at once, never one of a parity pair.

The reference shuffles via tf.data with an unseeded buffer (no resumable
order at all); seeded fold-in streams are this framework's replacement
(SURVEY §2.1-D8).
"""

from __future__ import annotations

import numpy as np

_M = 2**31
_SEED_MULT = 100003  # spreads nearby seeds apart before the epoch fold-in


def epoch_perm_rng(seed: int, epoch: int) -> np.random.RandomState:
    """The epoch's entry-permutation stream — host loader AND replicated
    device store (the parity-critical pair)."""
    return np.random.RandomState((seed * _SEED_MULT + epoch) % _M)


def batch_shuffle_rng(seed: int, epoch: int) -> np.random.RandomState:
    """Batch-order shuffle across roi buckets (distinct from the entry
    permutation so bucketed and unbucketed epochs don't correlate)."""
    return np.random.RandomState((seed * _SEED_MULT + epoch * 31 + 7) % _M)


def shard_perm_rng(seed: int, epoch: int, shard: int) -> np.random.RandomState:
    """Per-shard entry permutation (sharded store: each data shard draws
    over its OWN local entry set — this is why a mid-epoch resume pins
    data_mode and dp in the run signature)."""
    return np.random.RandomState((seed * _SEED_MULT + epoch * 7919 + shard) % _M)


def shard_bucket_perm_rng(
    seed: int, epoch: int, shard: int, bucket: int
) -> np.random.RandomState:
    """Per-shard, per-bucket entry permutation (sharded + roi buckets)."""
    return np.random.RandomState(
        (seed * _SEED_MULT + epoch * 7919 + shard * 131 + bucket) % _M
    )
