"""TPU-native ReGAT: Relation-Aware Graph Attention Network for VQA.

A from-scratch JAX / XLA / Pallas / pjit framework with the capabilities of the
reference TF2 implementation (jhss/TF_VQA_ReGAT), redesigned TPU-first:

- static shapes everywhere (rois padded to 36/100 + validity masks) instead of
  per-batch dynamic padding (reference: dataset.py:329-355);
- geometry (position embeddings) computed *inside* the jitted step from raw
  bounding boxes (reference ran numpy on host every step, position_emb.py:96-160);
- one GRU application shared between the sequence output and the final state
  (reference re-ran the GRU, rel_graph_net.py:44,57);
- a fused Pallas masked graph-attention kernel for the hot op
  (reference: graph_att_layer.py:39-121 in eager TF);
- data-parallel (and optional tensor-parallel) execution over a
  ``jax.sharding.Mesh`` with donated train state.
"""

__version__ = "0.1.0"
