"""Groth16 backend (BN254): setup / prove / verify.

Reference surface: /root/reference/backend/groth16/groth16.go:170-273 and the
device-offload prover backend/groth16/bn254/icicle/.
"""

from .keys import Proof, ProvingKey, VerifyingKey
from .prove import prove
from .setup import setup
from .solidity import export_solidity, proof_to_solidity_calldata
from .verify import InvalidProofError, verify

__all__ = [
    "Proof",
    "ProvingKey",
    "VerifyingKey",
    "prove",
    "setup",
    "verify",
    "InvalidProofError",
    "export_solidity",
    "proof_to_solidity_calldata",
]
