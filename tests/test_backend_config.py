"""ProverConfig option system (gnark backend.ProverConfig analog,
/root/reference/backend/backend.go:57-199)."""

from tpusnark.backend import groth16, plonk
from tpusnark.backend.config import ProverConfig, resolve
from tpusnark.fields.spec import BN254_FR
from tpusnark.frontend.builder import Builder
from tpusnark.frontend.plonk_builder import PlonkBuilder

P = BN254_FR.modulus


def _cubic(b):
    x = b.secret("x")
    y = b.public("y")
    b.assert_is_equal(b.add(b.mul(x, x, x), x, 5), y)
    return b.compile()


def _counting_rng():
    state = {"n": 0}

    def rng():
        state["n"] += 1
        return state["n"]

    rng.state = state
    return rng


def test_with_chaining_is_pure():
    base = ProverConfig()
    c1 = base.with_accelerator("host").with_hints(foo=lambda: None)
    assert base.accelerator == "tpu" and base.hints == {}
    assert c1.accelerator == "host" and "foo" in c1.hints


def test_resolve_kwarg_wins():
    rng_a, rng_b = _counting_rng(), _counting_rng()
    cfg = resolve(ProverConfig().with_rng(rng_a), rng=rng_b)
    assert cfg.rng is rng_b


def test_groth16_config_rng_and_host_accel():
    cs = _cubic(Builder(P))
    assign = {"x": 3, "y": (27 + 3 + 5) % P}
    pk, vk = groth16.setup(cs)
    rng = _counting_rng()
    cfg = ProverConfig().with_rng(rng).with_accelerator("host")
    proof = groth16.prove(cs, pk, assign, config=cfg)
    assert groth16.verify(proof, vk, [assign["y"]])
    assert rng.state["n"] >= 2  # r and s drawn from the configured rng
    # deterministic rng => deterministic proof (the reference's seam for
    # bit-exact proof tests)
    proof2 = groth16.prove(cs, pk, assign, config=ProverConfig().with_rng(_counting_rng()))
    assert proof.ar == proof2.ar and proof.krs == proof2.krs


def test_plonk_config_rng():
    cs = _cubic(PlonkBuilder(P))
    assign = {"x": 3, "y": (27 + 3 + 5) % P}
    pk, vk = plonk.setup(cs)
    proof = plonk.prove(cs, pk, assign, config=ProverConfig().with_rng(_counting_rng()))
    assert plonk.verify(proof, vk, [assign["y"]])
