"""spartan_tpu — a TPU-native Spartan R1CS zkSNARK framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the Rust
reference ``tsunrise/r1cs-spartan`` (see SURVEY.md): index an R1CS instance
(A, B, C sparse matrices over BLS12-381 Fr), prove knowledge of a satisfying
witness via two multilinear sumchecks plus a PST/Libra-style multilinear
pairing commitment, and verify the resulting non-interactive proof.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

- L5 NI argument driver:   ``spartan_tpu.protocol.argument``
- L4 AHP prover/verifier:  ``spartan_tpu.protocol.{prover,verifier,indexer}``
- L3 Polynomial commitment:``spartan_tpu.commitment``
- L2 R1CS-as-MLE:          ``spartan_tpu.models.r1cs``, ``spartan_tpu.ops.{mle,sparse}``
- L1 Sumcheck + MLE:       ``spartan_tpu.protocol.sumcheck``, ``spartan_tpu.ops.sumcheck``
- L0 Field/curve kernels:  ``spartan_tpu.ops.{field,fp,curve,msm}`` (JAX/Pallas),
                            ``spartan_tpu.host`` (scalar host oracle + pairing)

Cross-cutting: ``spartan_tpu.utils`` (transcript, serialization, timers,
errors) and ``spartan_tpu.parallel`` (multi-chip sharding via shard_map).
"""

from spartan_tpu.utils.errors import SpartanError, InvalidArgument, WrongWitness

__version__ = "0.1.0"
