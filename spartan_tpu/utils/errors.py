"""Error types for spartan_tpu.

Mirrors the reference's error enum (reference: src/error.rs:5-39 —
InvalidArgument / SumCheckError / WrongWitness / SerializationError), but with
working Display (the reference's ``Display`` is ``todo!()`` and panics,
src/error.rs:24-26 — we do not preserve that quirk).
"""


class SpartanError(Exception):
    """Base error for the spartan_tpu framework."""


class InvalidArgument(SpartanError):
    """Bad argument (reference: src/error.rs InvalidArgument)."""


class SumCheckError(SpartanError):
    """Sumcheck round rejected (reference: src/error.rs SumCheckError)."""


class WrongWitness(SpartanError):
    """Witness fails verification (reference: src/error.rs WrongWitness)."""


class SerializationError(SpartanError):
    """Canonical (de)serialization failure (reference: src/error.rs)."""


def invalid_arg(msg: str) -> InvalidArgument:
    return InvalidArgument(msg)
