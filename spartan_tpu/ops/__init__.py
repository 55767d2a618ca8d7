"""Compute kernels: batched limb arithmetic, MLE, sparse, curve, MSM, sumcheck."""
