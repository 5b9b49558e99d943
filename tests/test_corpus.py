"""Corpus sweep: every registered circuit through the engine / R1CS-solver /
SCS-solver matrix, plus the seeded fuzz oracle.

Mirrors the reference's integration_test.go:29-60 (26-circuit corpus x
CheckCircuit matrix with WithInvalidAssignment) and test/assert_fuzz.go:17-31
(seed witness values: small ints, moduli +- epsilon, randoms; cross-check the
big-int engine against the compiled-circuit solvers).

Default tier: engine + both solvers over the full corpus. Slow tier: full
Groth16 AND PLONK prove/verify over the corpus.
"""

import pytest

from tpusnark.constraint.scs import solve_scs
from tpusnark.constraint.solver import solve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.frontend.plonk_builder import PlonkBuilder
from tpusnark.testing.circuits import CORPUS
from tpusnark.testing.engine import is_solved

P = BN254_FR.modulus

_NAMES = sorted(CORPUS)


def _r1cs(entry):
    b = Builder(P)
    entry.define(b)
    return b.compile()


def _scs(entry):
    b = PlonkBuilder(P)
    entry.define(b)
    return b.compile()


def _solves_r1cs(cs, assignment) -> bool:
    try:
        solve(cs, assignment)
        return True
    except Exception:
        return False


def _solves_scs(cs, assignment) -> bool:
    try:
        solve_scs(cs, assignment)
        return True
    except Exception:
        return False


@pytest.mark.parametrize("name", _NAMES)
def test_corpus_engine(name):
    e = CORPUS[name]
    for a in e.valid:
        assert is_solved(e.define, P, a), (name, a)
    for a in e.invalid:
        assert not is_solved(e.define, P, a), (name, a)


@pytest.mark.parametrize("name", _NAMES)
def test_corpus_r1cs_solver(name):
    e = CORPUS[name]
    cs = _r1cs(e)
    for a in e.valid:
        assert _solves_r1cs(cs, a), (name, a)
    for a in e.invalid:
        assert not _solves_r1cs(cs, a), (name, a)


@pytest.mark.parametrize("name", _NAMES)
def test_corpus_scs_solver(name):
    e = CORPUS[name]
    if e.r1cs_only:
        pytest.skip("r1cs-only circuit")
    cs = _scs(e)
    for a in e.valid:
        assert _solves_scs(cs, a), (name, a)
    for a in e.invalid:
        assert not _solves_scs(cs, a), (name, a)


def _fuzz_values(p):
    """Seed corpus mirroring assert_fuzz.go: small ints, p +- epsilon,
    deterministic pseudo-randoms."""
    import random

    st = random.Random(0xF122)
    vals = [0, 1, 2, 3, 5, 255, 256, (1 << 16) - 1, p - 1, p - 2, p + 1, p]
    vals += [st.randrange(p) for _ in range(6)]
    return vals


@pytest.mark.parametrize("name", _NAMES)
def test_corpus_fuzz_engine_vs_solvers(name):
    """The fuzz oracle: for arbitrary witness values the three interpreters
    must AGREE on satisfiability (any divergence = soundness/completeness
    bug in a builder or solver)."""
    import random

    e = CORPUS[name]
    cs1 = _r1cs(e)
    cs2 = None if e.r1cs_only else _scs(e)
    keys = sorted({k for a in e.valid + e.invalid for k in a})
    if not keys:
        return
    st = random.Random(hash(name) & 0xFFFF)
    vals = _fuzz_values(P)
    for _ in range(12):
        a = {k: st.choice(vals) for k in keys}
        want = is_solved(e.define, P, a)
        got1 = _solves_r1cs(cs1, a)
        assert got1 == want, (name, a, "r1cs", got1, want)
        if cs2 is not None:
            got2 = _solves_scs(cs2, a)
            assert got2 == want, (name, a, "scs", got2, want)


@pytest.mark.slow
@pytest.mark.parametrize("name", _NAMES)
def test_corpus_groth16_prove_matrix(name):
    """Full Setup/Prove/Verify per corpus circuit (the prover_checks tier of
    assert_checkcircuit.go:100-152)."""
    import random

    from tpusnark.backend import groth16

    e = CORPUS[name]
    if not e.valid:
        pytest.skip("no valid assignment")
    cs = _r1cs(e)
    st = random.Random(1)
    rng = lambda: st.randrange(1, P)
    pk, vk = groth16.setup(cs, rng=rng, use_device=False)
    a = e.valid[0]
    if e.name == "commit":
        pytest.skip("commit challenge depends on prover randomness; covered by test_commit.py")
    proof = groth16.prove(cs, pk, a, rng=rng)
    # public_names[0] is the constant-one wire
    pubs = [int(a[nm]) % P for nm in cs.public_names if nm in a]
    assert groth16.verify(proof, vk, pubs)
    for bad in e.invalid:
        try:
            pr = groth16.prove(cs, pk, bad, rng=rng)
        except Exception:
            continue
        bad_pubs = [int(bad[nm]) % P for nm in cs.public_names if nm in bad]
        ok = False
        try:
            ok = groth16.verify(pr, vk, bad_pubs)
        except Exception:
            pass
        assert not ok, (name, bad)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["cubic", "select", "tobinary", "muladdmix"])
def test_corpus_plonk_prove_matrix(name):
    """PLONK Setup/Prove/Verify over a corpus slice (full sweep would blow
    the slow-tier budget; the protocol path is identical across circuits)."""
    import random

    from tpusnark.backend import plonk

    e = CORPUS[name]
    cs = _scs(e)
    st = random.Random(2)
    rng = lambda: st.randrange(1, P)
    pk, vk = plonk.setup(cs)
    a = e.valid[0]
    proof = plonk.prove(cs, pk, a, rng=rng)
    pubs = [int(a[nm]) % P for nm in cs.public_names]
    assert plonk.verify(proof, vk, pubs)
