"""Multi-chip scaling: mesh construction + sharded sumcheck/MSM kernels.

The reference has no parallelism of any kind (SURVEY.md §2.3); this package
is the TPU-native scale-out design: hypercube (evaluation-table) partitioning
for sumcheck — the sequence-parallel analog — and point-range partitioning
for MSMs — the tensor-parallel analog — over a jax.sharding.Mesh with XLA
collectives via shard_map.
"""
