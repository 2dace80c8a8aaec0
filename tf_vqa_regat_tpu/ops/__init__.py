"""TPU-native ops: weight-norm dense, FCNet, GRU scan, masked embedding,
in-jit geometry, and the fused graph-attention op (jnp oracle + Pallas kernel).
"""
