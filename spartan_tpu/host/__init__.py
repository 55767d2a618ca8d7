"""Host-side scalar implementations: exact Python-int BLS12-381 arithmetic.

These modules are the framework's *oracle layer*: every batched TPU kernel in
``spartan_tpu.ops`` is cross-checked against these (the reference repo's
naive-vs-fast test pattern, SURVEY.md §4), and cold-path protocol steps
(Fiat–Shamir, interpolation, pairings) run here.
"""
