"""Field kernel tests vs Python int oracle.

The reference's analog: gnark-crypto fr/fp element unit tests plus gnark's
tinyfield exhaustive testing (/root/reference/internal/tinyfield/,
SURVEY.md §4). Oracle = Python bignum arithmetic.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusnark.fields.jfield import Field
from tpusnark.fields.spec import BLS12_381_FP, BN254_FP, BN254_FR, TINY, FieldSpec

SPECS = [BN254_FR, BN254_FP, BLS12_381_FP, TINY]
rng = random.Random(1234)


def rand_elems(spec, k):
    return [rng.randrange(spec.modulus) for _ in range(k)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_encode_decode_roundtrip(spec):
    f = Field(spec)
    xs = rand_elems(spec, 8) + [0, 1, spec.modulus - 1]
    arr = f.array(xs)
    assert f.to_ints(arr) == [x % spec.modulus for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    f = Field(spec)
    p = spec.modulus
    xs = rand_elems(spec, 64) + [0, 1, p - 1, p - 1]
    ys = rand_elems(spec, 64) + [0, p - 1, 1, p - 1]
    a, b = f.array(xs), f.array(ys)
    assert f.to_ints(f.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert f.to_ints(f.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert f.to_ints(f.neg(a)) == [(-x) % p for x in xs]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(spec):
    f = Field(spec)
    p = spec.modulus
    xs = rand_elems(spec, 64) + [0, 1, p - 1, p - 1, 2]
    ys = rand_elems(spec, 64) + [p - 1, p - 1, 1, p - 1, (p + 1) // 2]
    a, b = f.array(xs), f.array(ys)
    assert f.to_ints(f.mul(a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert f.to_ints(f.square(a)) == [(x * x) % p for x in xs]


def test_mul_exhaustive_tiny():
    # exhaustive over the tiny field, like gnark's tinyfield tests
    spec = TINY
    f = Field(spec)
    p = spec.modulus
    pairs = [(x, y) for x in range(p) for y in range(p)]
    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]
    a, b = f.array(xs), f.array(ys)
    assert f.to_ints(f.mul(a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert f.to_ints(f.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert f.to_ints(f.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", [BN254_FR, TINY], ids=lambda s: s.name)
def test_pow_inv(spec):
    f = Field(spec)
    p = spec.modulus
    xs = [x for x in rand_elems(spec, 16) if x != 0] + [1, p - 1]
    a = f.array(xs)
    assert f.to_ints(f.pow_static(a, 5)) == [pow(x, 5, p) for x in xs]
    assert f.to_ints(f.inv(a)) == [pow(x, -1, p) for x in xs]
    # inv(0) == 0 convention
    z = f.array([0])
    assert f.to_ints(f.inv(z)) == [0]


@pytest.mark.parametrize("spec", [BN254_FR, BN254_FP], ids=lambda s: s.name)
def test_sum_and_segment_sum(spec):
    f = Field(spec)
    p = spec.modulus
    n = 1000
    xs = rand_elems(spec, n)
    a = f.array(xs)
    assert f.to_ints(f.sum(a, axis=1)) == [sum(xs) % p]

    ids = np.array([rng.randrange(7) for _ in range(n)], dtype=np.int32)
    got = f.to_ints(f.segment_sum(a, jnp.asarray(ids), 7, max_segment=n))
    want = [sum(x for x, i in zip(xs, ids) if i == s) % p for s in range(7)]
    assert got == want


def test_to_from_mont():
    f = Field(BN254_FR)
    p = BN254_FR.modulus
    xs = rand_elems(BN254_FR, 8)
    raw = f.array(xs, mont=False)
    m = f.to_mont(raw)
    assert f.to_ints(m, mont=True) == xs
    back = f.from_mont(m)
    assert f.to_ints(back, mont=False) == xs


def test_jit_and_vmap_compose():
    f = Field(BN254_FR)
    p = BN254_FR.modulus
    xs = rand_elems(BN254_FR, 32)
    ys = rand_elems(BN254_FR, 32)
    a, b = f.array(xs), f.array(ys)
    fused = jax.jit(lambda a, b: f.mul(f.add(a, b), f.sub(a, b)))
    got = f.to_ints(fused(a, b))
    want = [((x + y) * (x - y)) % p for x, y in zip(xs, ys)]
    assert got == want


def test_mxu_const_mul_path_exact():
    """The MXU constant-multiply variant of Montgomery phases 2/3
    (jfield._const_mul_cols_mxu: exact bf16 band-matrix matmuls) must be
    bit-identical to the integer path on every spec. On TPU it runs inside
    every fused kernel (IN_PALLAS); here we force it under XLA:CPU."""
    import numpy as np

    from tpusnark.fields import jfield
    from tpusnark.fields.spec import BN254_FP, BN254_FR, TINY

    for spec in (BN254_FR, BN254_FP, TINY):
        f = jfield.get_field(spec)
        p = spec.modulus
        rng = np.random.default_rng(11)
        xs = [int(x) % p for x in rng.integers(0, 2**63, size=128)] + [0, 1, p - 1]
        ys = [int(x) % p for x in rng.integers(0, 2**63, size=128)] + [p - 1, 0, 1]
        a, b = f.array(xs), f.array(ys)
        tok = jfield.FORCE_MXU_CONST_MUL.set(True)
        try:
            got = f.to_ints(f.mul(a, b))
            got_fm = f.to_ints(f.from_mont(a), mont=False)
        finally:
            jfield.FORCE_MXU_CONST_MUL.reset(tok)
        assert got == [x * y % p for x, y in zip(xs, ys)]
        assert [g % p for g in got_fm] == [x % p for x in xs]
