"""Pallas TPU kernels for the hot ops (validated against the jnp oracles in
tests; interpret-mode on CPU)."""
