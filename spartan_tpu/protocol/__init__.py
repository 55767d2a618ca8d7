"""Protocol layers: sumcheck AHP, Spartan AHP prover/verifier, NI driver."""
