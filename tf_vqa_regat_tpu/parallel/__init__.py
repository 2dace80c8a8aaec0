"""Parallelism: device mesh construction and sharding rules.

The reference is single-process single-GPU eager TF with no distribution at
all (SURVEY §2.5). Here, parallelism is expressed the TPU-native way: a
``jax.sharding.Mesh`` with ('data', 'model') axes; the batch dim is sharded
over 'data', params are replicated (or head/column-sharded over 'model' for
tensor parallelism), and XLA inserts the gradient all-reduce and metric psums
over ICI. Multi-host extends via jax.distributed.initialize + the same mesh.
Pipeline/expert parallelism are not applicable to this model family
(documented unsupported, SURVEY §2.5)."""
