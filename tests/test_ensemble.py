"""Ensemble eval: member parsing and probability averaging semantics."""

import jax
import jax.numpy as jnp
import numpy as np
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
