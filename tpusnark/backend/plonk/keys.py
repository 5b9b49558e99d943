"""PLONK key and proof containers.

Reference shapes: ProvingKey/VerifyingKey/Trace at
/root/reference/backend/plonk/bn254/setup.go:62-107 and the Proof struct in
backend/plonk/bn254/prove.go. The proving key here keeps every prover table
device-resident (coefficient forms + 4n-coset evaluations), the TPU analog
of gnark's in-memory trace + lazy iop basis conversions.

Proof format: gnark's linearized-polynomial variant
(backend/plonk/bn254/prove.go:707-836) — one batched KZG opening at zeta
over [foldedH, linearizedPolynomial, l, r, o, s1, s2] plus the Z opening at
omega*zeta; serialization follows gnark's marshal layout (marshal.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PlonkVerifyingKey:
    n: int  # domain size
    generator: int  # omega
    k1: int
    k2: int
    n_public: int
    # G1 commitments
    ql: tuple
    qr: tuple
    qm: tuple
    qo: tuple
    qc: tuple
    s1: tuple
    s2: tuple
    s3: tuple
    # KZG verification points
    g2: tuple  # (G2, tau*G2)
    # BSB22 (reference setup.go:90-107): qcp selector commitments + the
    # challenge-injection rows (pre-public-offset, gnark convention)
    qcp: list = field(default_factory=list)
    commitment_constraint_indexes: list = field(default_factory=list)

    def digest_points(self) -> list:
        """Points bound to "gamma", in gnark's bindPublicData order
        (/root/reference/backend/plonk/bn254/verify.go:296-341): the
        permutation commitments S1,S2,S3 first, then the coefficient
        commitments Ql,Qr,Qm,Qo,Qk, then Qcp."""
        return [
            self.s1,
            self.s2,
            self.s3,
            self.ql,
            self.qr,
            self.qm,
            self.qo,
            self.qc,
        ] + list(self.qcp)


@dataclass
class PlonkProvingKey:
    """Prover tables. The quotient runs gnark's rho-loop (computeNumerator,
    reference prove.go:980-1045): the numerator is evaluated one size-n
    coset slice at a time, so the PK stores only size-n coefficient forms
    plus 4 slice-scale vectors — peak memory O(n), never O(4n x columns)."""

    vk: PlonkVerifyingKey
    srs: object  # kzg.SRS
    domain_n: int
    # device tables, (L, n) Montgomery coefficient forms
    q_coeffs: dict  # name -> (L, n)
    s_coeffs: dict  # "s1"/"s2"/"s3" -> (L, n)
    # rho-loop slice tables: coset_scale[r][i] = (shift * w4^r)^i, (L, n)
    coset_scale: list = None
    omega_pows: object = None  # (L, n) Montgomery powers of the n-th root
    slice_shift: list = None  # host ints s_r = shift * w4^r
    slice_xn: list = None  # host ints s_r^n (x^n is constant per slice)
    # permutation values on H as ints (for the grand product):
    s_evals_int: dict = None  # "s1"/"s2"/"s3" -> list[int] length n
    # BSB22 qcp selector tables, one per commitment
    qcp_coeffs: list = None  # [(L, n) Montgomery coefficient forms]

    def __post_init__(self):
        if self.qcp_coeffs is None:
            self.qcp_coeffs = []

    def dev(self):
        """Lazy device-resident prover tables (built once per PK, the
        accelerator-PK-residency discipline of the reference's icicle
        ProvingKey, /root/reference/backend/groth16/bn254/icicle/
        provingkey.go:11-36): identity/permutation columns for the grand
        product, omega powers for z(omega X), and the padded coefficient
        stacks the opening stage linearly combines. Removing these from the
        per-prove path killed ~3n host->device encodes per proof."""
        tab = self.__dict__.get("_devtab")
        if tab is not None:
            return tab
        import jax.numpy as jnp

        from ...fields.jfield import get_field
        from ...fields.spec import BN254_FR

        f = get_field(BN254_FR)
        p = BN254_FR.modulus
        n = self.domain_n
        vk = self.vk
        from ...poly.ntt import get_ntt

        ntt_n = get_ntt(BN254_FR, n)
        id1 = f.array(ntt_n.domain.powers)  # omega^i
        ids = jnp.stack([id1, f.mul_const(id1, vk.k1), f.mul_const(id1, vk.k2)], axis=1)
        s_lag = jnp.stack(
            [f.array(self.s_evals_int[kk]) for kk in ("s1", "s2", "s3")], axis=1
        )
        maxm = n + 3  # z_hat length (3 blinders)
        wpow = f.array([pow(vk.generator, i, p) for i in range(maxm)])

        def pad_to(x, m):
            return jnp.pad(x, ((0, 0), (0, m - x.shape[1])))

        # open/linearization stacks over PK columns (padded to maxm)
        lin_base = jnp.stack(
            [
                pad_to(self.q_coeffs["ql"], maxm),
                pad_to(self.q_coeffs["qr"], maxm),
                pad_to(self.q_coeffs["qm"], maxm),
                pad_to(self.q_coeffs["qo"], maxm),
                pad_to(self.q_coeffs["qc"], maxm),
                pad_to(self.s_coeffs["s3"], maxm),
            ],
            axis=1,
        )  # (L, 6, maxm)
        s12 = jnp.stack(
            [pad_to(self.s_coeffs["s1"], maxm), pad_to(self.s_coeffs["s2"], maxm)],
            axis=1,
        )  # (L, 2, maxm)
        qcp_stack = (
            jnp.stack([pad_to(c, maxm) for c in self.qcp_coeffs], axis=1)
            if self.qcp_coeffs
            else None
        )
        tab = {
            "ids": ids,  # (L, 3, n)
            "s_lag": s_lag,  # (L, 3, n)
            "wpow": wpow,  # (L, maxm)
            "lin_base": lin_base,
            "s12": s12,
            "qcp_stack": qcp_stack,
            "maxm": maxm,
        }
        self.__dict__["_devtab"] = tab
        return tab


@dataclass
class PlonkProof:
    """gnark-shape PLONK proof (reference Proof struct,
    backend/plonk/bn254/prove.go:96-113): LRO + Z + H commitments, ONE
    batched opening at zeta over [foldedH, linearizedPolynomial, l, r, o,
    s1, s2] (claimed values in that order), and the Z opening at omega*zeta.
    The linearized-polynomial variant replaces round 1's full-opening
    protocol (VERDICT r1 #5)."""

    # commitments
    l_com: tuple
    r_com: tuple
    o_com: tuple
    z_com: tuple
    h1_com: tuple
    h2_com: tuple
    h3_com: tuple
    bsb22_commitments: list
    # batched opening at zeta (gnark BatchedProof)
    batched_h: tuple  # KZG quotient commitment W_zeta
    claimed_values: list  # [H(z), lin(z), l(z), r(z), o(z), s1(z), s2(z)]
    # Z opened at omega*zeta (gnark ZShiftedOpening)
    z_shifted_h: tuple
    z_shifted_value: int
