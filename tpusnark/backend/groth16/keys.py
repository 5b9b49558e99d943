"""Groth16 key and proof containers.

Reference shapes: ProvingKey/VerifyingKey at
/root/reference/backend/groth16/bn254/setup.go:35-82 and the icicle
device-resident variant /root/reference/backend/groth16/bn254/icicle/provingkey.go:11-36.

Host-side points are python-int affine tuples ((x, y) | None, G2 uses Fp2
coords) — the serializable form. Device residency (the icicle
setupDevicePointers analog) is lazy: on first prove the point tables are limb-
encoded into jax arrays, cached on the key object, and live in HBM thereafter.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class VerifyingKey:
    alpha_g1: tuple
    beta_g2: tuple
    gamma_g2: tuple
    delta_g2: tuple
    k: list  # G1 points: one per public wire (index 0 = the constant wire),
    # then one per BSB22 commitment wire (verifier-injected challenges)
    # gnark carries G1.Beta/Delta on the VK purely for wire compatibility
    # ("unused, here for compatibility purposes", setup.go:66, = pk.G1.Beta/
    # Delta at setup.go:326-327); we store them so vk bytes match gnark's.
    beta_g1: tuple | None = None
    delta_g1: tuple | None = None
    # BSB22 (reference verify.go:76-108): Pedersen vk + per-commitment index
    # lists into the extended public witness for the challenge hash
    commitment_key: object | None = None
    public_and_commitment_committed: list = field(default_factory=list)

    @property
    def n_public(self) -> int:
        return len(self.k)


@dataclass
class ProvingKey:
    alpha_g1: tuple
    beta_g1: tuple
    delta_g1: tuple
    beta_g2: tuple
    delta_g2: tuple
    a: list  # G1, per wire: A_w(t)
    b1: list  # G1, per wire: B_w(t)
    b2: list  # G2, per wire: B_w(t)
    k: list  # G1, per uncommitted private wire: (beta*A_w+alpha*B_w+C_w)/delta
    z: list  # G1, length n-1: t^i * Z_H(t)/delta
    domain_n: int = 0
    # BSB22: wire ids backing pk.k (identity when no commitments), and the
    # Pedersen proving keys (basis = K of committed wires, setup.go:146-197)
    k_wires: list | None = None
    commitment_keys: list = field(default_factory=list)
    # which curve the key was set up over (gnark's CurveID; drives the
    # parametrized prover — no per-curve codegen, SURVEY §7)
    curve: str = "bn254"
    # lazy device residency (icicle.go:31-130 analog)
    _dev: dict = field(default_factory=dict, repr=False)

    def device(self):
        """Encode point tables into device arrays once; returns the cache."""
        if not self._dev:
            from ...curves.config import get_curve
            from ...curves.encoding import g1_to_device, g2_to_device
            from ...fields.jfield import get_field

            cfg = get_curve(self.curve)
            fp = get_field(cfg.fp_spec)
            # BW6: G2 points have plain Fp coordinates (sextic twist over
            # Fp) — encode them with the G1 layout. BLS24: Fp4 coordinates.
            if cfg.g2_over_fp:
                enc_g2 = g1_to_device
            elif cfg.g2_fp4:
                from ...curves.encoding import g4_to_device

                enc_g2 = g4_to_device
            else:
                enc_g2 = g2_to_device
            self._dev = {
                "a": g1_to_device(self.a, fp),
                "b1": g1_to_device(self.b1, fp),
                "b2": enc_g2(self.b2, fp),
                "k": g1_to_device(self.k, fp),
                "z": g1_to_device(self.z, fp),
            }
        return self._dev


@dataclass
class Proof:
    ar: tuple  # G1
    krs: tuple  # G1
    bs: tuple  # G2
    # BSB22 (reference Proof, prove.go:46-56): one Pedersen commitment per
    # frontend Commit plus a single folded proof of knowledge
    commitments: list = field(default_factory=list)
    commitment_pok: tuple | None = None
