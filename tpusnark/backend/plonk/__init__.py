"""PLONK(+KZG) backend over the sparse (Plonkish) constraint system.

Reference: /root/reference/backend/plonk/ (dispatcher plonk.go, per-curve
setup.go/prove.go/verify.go). See keys.py for the proof-format note.
"""

from .keys import PlonkProof, PlonkProvingKey, PlonkVerifyingKey
from .prove import prove
from .setup import setup
from .verify import verify

__all__ = [
    "PlonkProof",
    "PlonkProvingKey",
    "PlonkVerifyingKey",
    "prove",
    "setup",
    "verify",
]
