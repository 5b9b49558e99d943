"""Curve configuration: the no-codegen analog of gnark's per-curve generated
packages (reference internal/generator/backend/main.go generates 8 copies of
everything; here one parametrized implementation closes over a CurveConfig —
SURVEY.md §7 architecture stance).

A config bundles the field specs, the short-Weierstrass constants the device
kernels need, and the host (python-int) curve module used for setup ladders,
proof assembly, and pairings.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

from ..fields.spec import BLS12_381_FP, BLS12_381_FR, BN254_FP, BN254_FR, FieldSpec


@dataclass(frozen=True)
class CurveConfig:
    name: str
    fr_spec: FieldSpec
    fp_spec: FieldSpec
    g1_b: int  # G1: y^2 = x^3 + b
    g2_b3: tuple  # (c0, c1): 3 * b'' of the twist, as Fp2 ints

    @property
    def host(self):
        """Host curve module: G1, G2, R, pairing helpers (python ints)."""
        if self.name == "bn254":
            from . import ref

            return ref
        if self.name == "bls12-381":
            from . import bls12381

            return bls12381
        raise ValueError(f"unknown curve {self.name}")


def _bn254_g2_b3() -> tuple:
    from .ref import XI, Fp2

    b2 = Fp2(3, 0) * XI.inv()
    b3 = b2 * 3
    return (b3.c0, b3.c1)


@lru_cache(maxsize=None)
def get_curve(name: str = "bn254") -> CurveConfig:
    if name == "bn254":
        return CurveConfig(
            name="bn254",
            fr_spec=BN254_FR,
            fp_spec=BN254_FP,
            g1_b=3,
            g2_b3=_bn254_g2_b3(),
        )
    if name == "bls12-381":
        # G1: y^2 = x^3 + 4; twist (M-type): y^2 = x^3 + 4(1+u) -> 3b = (12, 12)
        return CurveConfig(
            name="bls12-381",
            fr_spec=BLS12_381_FR,
            fp_spec=BLS12_381_FP,
            g1_b=4,
            g2_b3=(12, 12),
        )
    raise ValueError(f"unknown curve {name} (supported: bn254, bls12-381)")
